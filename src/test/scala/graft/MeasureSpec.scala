package graft

import graft.tensor._

class MeasureSpec extends SparkSpec {

  /** Deterministic boolean blob image. */
  private def blobImage(h: Int, w: Int): Nd = {
    val nd = Nd.zeros(Array(h, w))
    for (i <- 0 until h; j <- 0 until w) {
      val v = math.sin(i * 0.9) + math.cos(j * 0.7) + ((i * 31 + j * 17) % 7) * 0.1
      nd.data(i * w + j) = if (v > 1.1) 1.0 else 0.0
    }
    nd
  }

  /** Naive 4/8-connectivity CC with scipy scan-order numbering. */
  private def naiveLabel(in: Nd, connectivity: Int): (Array[Int], Int) = {
    val Array(h, w) = in.shape
    val lab = new Array[Int](h * w)
    var next = 0
    val offs =
      if (connectivity == 1) Seq((-1, 0), (1, 0), (0, -1), (0, 1))
      else (for (a <- -1 to 1; b <- -1 to 1 if !(a == 0 && b == 0)) yield (a, b)).toSeq
    for (i <- 0 until h; j <- 0 until w) {
      if (in.data(i * w + j) != 0.0 && lab(i * w + j) == 0) {
        next += 1
        var stack = List((i, j))
        lab(i * w + j) = next
        while (stack.nonEmpty) {
          val (ci, cj) = stack.head; stack = stack.tail
          for ((di, dj) <- offs) {
            val (ni, nj) = (ci + di, cj + dj)
            if (ni >= 0 && ni < h && nj >= 0 && nj < w &&
              in.data(ni * w + nj) != 0.0 && lab(ni * w + nj) == 0) {
              lab(ni * w + nj) = next
              stack = (ni, nj) :: stack
            }
          }
        }
      }
    }
    (lab, next)
  }

  private val img = blobImage(24, 30)

  test("label: matches naive CC exactly (count + scan-order numbering), multi-block") {
    for (conn <- Seq(1, 2)) {
      val (naive, nNaive) = naiveLabel(img, conn)
      val (ds, n) = Measure.label(Grid.blockify(spark, "t", img, Seq(7, 9)), 2, conn)
      val got = Grid.unblockify(ds)
      assert(n == nNaive, s"conn=$conn: count $n != naive $nNaive")
      assert(got.data.map(_.toInt).sameElements(naive),
        s"conn=$conn: labeling differs from scan-order naive CC")
    }
  }

  test("label: chunking does not change the result") {
    val (a, na) = Measure.label(Grid.blockify(spark, "t", img, img.shape.toSeq), 2)
    val (b, nb) = Measure.label(Grid.blockify(spark, "t", img, Seq(5, 8)), 2)
    assert(na == nb)
    assert(Grid.unblockify(a).data.sameElements(Grid.unblockify(b).data))
  }

  test("measurements match naive per-label computations") {
    val values = Nd.zeros(img.shape)
    for (i <- values.data.indices) values.data(i) = (i % 11) * 0.5 + 1.0
    val (labDs, n) = Measure.label(Grid.blockify(spark, "t", img, Seq(7, 9)), 2, 1)
    val valDs = Grid.blockify(spark, "t", values, Seq(7, 9))
    val (naive, _) = naiveLabel(img, 1)

    // naive per-label stats
    val byLabel = naive.zipWithIndex.filter(_._1 != 0).groupBy(_._1)
      .map { case (l, xs) => l.toLong -> xs.map { case (_, i) => values.data(i) } }

    val area = Measure.area(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(area == byLabel.map { case (l, vs) => l -> vs.length.toLong })

    val sums = Measure.sumLabels(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((l, vs) <- byLabel)
      assert(math.abs(sums(l) - vs.sum) < 1e-9, s"sum label $l")

    val means = Measure.mean(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((l, vs) <- byLabel)
      assert(math.abs(means(l) - vs.sum / vs.length) < 1e-9)

    val mins = Measure.minimum(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((l, vs) <- byLabel) assert(mins(l) == vs.min)

    val medians = Measure.median(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((l, vs) <- byLabel) {
      val s = vs.sorted
      val exp = if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      assert(math.abs(medians(l) - exp) < 1e-9, s"median label $l")
    }

    val com = Measure.centerOfMass(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((l, _) <- byLabel) {
      val cells = naive.zipWithIndex.filter(_._1 == l).map(_._2)
      val wsum = cells.map(values.data(_)).sum
      val ci = cells.map(i => (i / 30) * values.data(i)).sum / wsum
      val cj = cells.map(i => (i % 30) * values.data(i)).sum / wsum
      assert(math.abs(com(l)._1 - ci) < 1e-9 && math.abs(com(l)._2 - cj) < 1e-9)
    }

    val ext = Measure.extrema(valDs, labDs, 2, img.shape.toSeq).collect()
    assert(ext.length == n.toInt)

    val posMin = Measure.minimumPosition(valDs, labDs, 2, img.shape.toSeq).collect()
    for (r <- posMin) {
      val l = r.getLong(0)
      val (ci, cj) = (r.getLong(1), r.getLong(2))
      val cells = naive.zipWithIndex.filter(_._1 == l).map(_._2)
      val mn = cells.map(values.data(_)).min
      val first = cells.filter(i => values.data(i) == mn).min
      assert(ci == first / 30 && cj == first % 30, s"min_pos label $l")
    }
  }

  test("labeled_comprehension: arbitrary reduction (second moment)") {
    val (labDs, _) = Measure.label(Grid.blockify(spark, "t", img, Seq(7, 9)), 2, 1)
    val valDs = Grid.blockify(spark, "t", img, Seq(7, 9))
    val rows = Measure.labeledComprehension(valDs, labDs, 2) { it =>
      it.map(v => v * v).sum
    }.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
  }

  test("find_objects: boxes are tight against the naive labeling, chunk-invariant") {
    val (naive, n) = naiveLabel(img, 1)
    val Array(h, w) = img.shape
    val expected = (1 to n).map { l =>
      val cells = for (i <- 0 until h; j <- 0 until w if naive(i * w + j) == l) yield (i, j)
      l.toLong -> (cells.map(_._1).min.toLong, cells.map(_._1).max.toLong,
        cells.map(_._2).min.toLong, cells.map(_._2).max.toLong)
    }.toMap
    for (chunks <- Seq(Seq(24, 30), Seq(7, 9))) {
      val (labDs, _) = Measure.label(Grid.blockify(spark, "t", img, chunks), 2, 1)
      val got = Measure.findObjects(labDs, 2).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(got == expected, s"find_objects diverges at chunks=$chunks")
    }
  }

  test("histogram: bins partition the per-label pixel counts") {
    val (labDs, _) = Measure.label(Grid.blockify(spark, "t", img, Seq(7, 9)), 2, 1)
    val valDs = Grid.blockify(spark, "t", img, Seq(7, 9))
    val hist = Measure.histogram(valDs, labDs, 2, 0.0, 2.0, 4).collect()
    val area = Measure.area(valDs, labDs, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- hist) {
      val l = r.getLong(0)
      val m = r.getMap[Int, Long](1)
      assert(m.values.sum == area(l), s"histogram counts != area for label $l")
    }
  }
}
