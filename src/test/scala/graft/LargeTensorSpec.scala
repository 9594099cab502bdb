package graft

import graft.tensor._

/** Size smoke: the halo pipeline at realistic block counts (256 blocks,
  * 1M elements) — shapes, edge blocks, and the O(n) extremum path at a
  * window size where the naive gather would be 81× the work. */
class LargeTensorSpec extends SparkSpec {

  test("1024x1024 image over 256 blocks: gaussian + 9x9 min filter, multi == single block") {
    val n = 1024
    val img = Nd.zeros(Array(n, n))
    var i = 0
    while (i < img.data.length) {
      img.data(i) = ((i * 2654435761L) % 1000) * 0.01 + math.sin(i * 0.001)
      i += 1
    }
    val multi = Grid.blockify(spark, "big", img, Seq(64, 64))
    assert(multi.count() == 256)

    val t0 = System.nanoTime()
    val g = Grid.unblockify(Filters.gaussianFilter(multi, Seq(2.0, 2.0)))
    val m = Grid.unblockify(Filters.minimumFilter(multi, Seq(9, 9)))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"gaussian σ2 + min 9x9 over 1M px, 256 blocks: $secs%.1f s")
    assert(g.shape.toSeq == Seq(n, n) && m.shape.toSeq == Seq(n, n))

    // single-block reference on a band of rows (full single-block compare
    // would also pass but costs another two full runs; a band catches
    // block-boundary errors on every column seam)
    val single = Grid.blockify(spark, "big1", img, Seq(n, n))
    val gRef = Grid.unblockify(Filters.gaussianFilter(single, Seq(2.0, 2.0)))
    val mRef = Grid.unblockify(Filters.minimumFilter(single, Seq(9, 9)))
    for (row <- Seq(0, 63, 64, 512, 1023); j <- 0 until n) {
      assert(math.abs(g.data(row * n + j) - gRef.data(row * n + j)) < 1e-10,
        s"gaussian seam mismatch at ($row,$j)")
      assert(m.data(row * n + j) == mRef.data(row * n + j),
        s"min seam mismatch at ($row,$j)")
    }
  }
}
