package graft.tensor

import org.apache.spark.sql.{Dataset, SparkSession}

/** Geometric transforms (dask_image.ndinterp, 4 ops — SURVEY.md §2A.4).
  *
  * `affine_transform` uses the reference's output-driven gather plan
  * (ndinterp/__init__.py::affine_transform ≈ L40–170): every OUTPUT block
  * computes the input bounding box it needs by transforming its corners,
  * the needed input blocks are join-shipped to it (one shuffle keyed by
  * output block), and the resampling kernel runs per output block. Only
  * the touched input region moves — the distributed analog of the
  * reference's per-chunk `input[bbox]` slicing.
  *
  * Orders 0 (nearest) and 1 (linear) are exact; boundary mode is
  * `constant` (cval), the reference's own restriction. `spline_filter`
  * (orders 2–5, scipy's full pole set) is the finite-halo IIR
  * approximation the reference also makes (documented depth heuristic);
  * `affine_transform` accepts orders 0–5 (order ≥ 2 samples the
  * prefiltered coefficients with the matching cardinal B-spline basis).
  */
/** One output block's requirement of one input block (public: Spark's
  * encoder codegen cannot touch private classes). */
case class AffineNeed(
    outIdx: Seq[Int], outOrigin: Seq[Int], outShape: Seq[Int],
    inIdx: Seq[Int])

object Interp {
  private type Need = AffineNeed

  /** affine_transform(input, matrix, offset, output_shape, order, cval):
    * output(o) = input(M·(o) + offset), order ∈ {0, …, 5}. Matrix is
    * row-major d×d. Output grid reuses the input chunking. */
  def affineTransform(
      ds: Dataset[Block],
      ndim: Int,
      matrix: Array[Array[Double]],
      offset: Array[Double],
      outputShape: Option[Seq[Int]] = None,
      order: Int = 1,
      cval: Double = 0.0): Dataset[Block] = {
    require(order >= 0 && order <= 5,
      "affine_transform: spline orders 0..5 supported")
    val spark = ds.sparkSession
    import spark.implicits._

    // order ≥ 2 samples B-spline COEFFICIENTS: prefilter first (scipy's
    // prefilter=True), then blend with the matching basis below
    val src = if (order >= 2) splineFilter(ds, ndim, order) else ds

    // geometry comes from any input block (metadata-only single-row action)
    val proto = src.head()
    val inShape = proto.arrayShape
    val chunk = proto.chunk
    val outShape = outputShape.getOrElse(inShape)
    val margin = if (order >= 2) order / 2 + 1 else 1

    // DISTRIBUTED needs-table build: the grid can be ~5·10⁷ blocks at
    // 100 TB, so the enumeration runs as spark.range over the cell count
    // (driver stays O(1)), not a driver-side Seq + createDataset.
    val needsDs = needsDataset(spark, ndim, matrix, offset,
      chunk, inShape, outShape, margin)

    val bcM = spark.sparkContext.broadcast((matrix, offset))
    val imageId = proto.imageId

    needsDs.joinWith(src, needsDs("inIdx") === src("idx"), "left_outer")
      .groupByKey(_._1.outIdx)
      .mapGroups { (oIdx: Seq[Int], it: Iterator[(Need, Block)]) =>
        val rows = it.toSeq
        val n = rows.head._1
        val (m, off) = bcM.value
        // Allocation-free inner loop (r10 — the bench showed ~4 µs/px
        // dominated by per-corner Seq keys, Map lookups and Nd wrappers):
        // blocks key on a FLATTENED grid index, per-block strides are
        // precomputed, and every per-pixel buffer (coords, weights,
        // corner offsets) is hoisted to the group scope. Arithmetic
        // order is IDENTICAL to the original form (same corner
        // enumeration, same accumulation order) — results stay
        // bit-exact (InterpFourierSpec equality pins).
        val chunkA = chunk.toArray
        val inShapeA = inShape.toArray
        val inGrid = new Array[Int](ndim)
        var kk = 0
        while (kk < ndim) {
          inGrid(kk) = (inShapeA(kk) + chunkA(kk) - 1) / chunkA(kk); kk += 1
        }
        // flattened block index → (origin, rowStrides, data)
        val byLin = new java.util.HashMap[java.lang.Long, (Array[Int], Array[Int], Array[Double])]()
        rows.foreach { r =>
          val b = r._2
          if (b != null) {
            var lin = 0L
            var k = 0
            while (k < ndim) { lin = lin * inGrid(k) + b.idx(k); k += 1 }
            val shapeA = b.shape.toArray
            val strides = new Array[Int](ndim)
            var acc = 1
            var j = ndim - 1
            while (j >= 0) { strides(j) = acc; acc *= shapeA(j); j -= 1 }
            byLin.put(lin, (b.origin.toArray, strides, b.data))
          }
        }
        def sample(g: Array[Int]): Double = {
          var k = 0
          while (k < ndim) {
            if (g(k) < 0 || g(k) >= inShapeA(k)) return cval
            k += 1
          }
          var lin = 0L
          k = 0
          while (k < ndim) { lin = lin * inGrid(k) + g(k) / chunkA(k); k += 1 }
          val e = byLin.get(lin)
          if (e == null) return cval // block not shipped → outside bbox
          val (origin, strides, data) = e
          var o = 0
          k = 0
          while (k < ndim) { o += (g(k) - origin(k)) * strides(k); k += 1 }
          data(o)
        }
        // per-pixel work buffers, shared across the whole output block
        val srcPos = new Array[Double](ndim)
        val g = new Array[Int](ndim)
        val base = new Array[Int](ndim)
        val support =
          if (order == 0) 1 else if (order == 3) 4
          else if (order >= 2) order + 1 else 2
        // corner enumeration hoisted: same Grid.cartesian order as the
        // per-pixel form it replaces (last axis fastest)
        val corners: Array[Array[Int]] =
          if (order == 0) Array.empty
          else Grid.cartesian(Seq.fill(ndim)(support)).map(_.toArray).toArray
        val cornerShift = if (order == 3) -1 else 0
        val wAxis = Array.ofDim[Double](ndim, support)
        val out = Nd.zeros(n.outShape.toArray)
        out.foreachCoord { c =>
          var r = 0
          while (r < ndim) {
            var acc = off(r)
            var cc = 0
            while (cc < ndim) { acc += m(r)(cc) * (n.outOrigin(cc) + c(cc)); cc += 1 }
            srcPos(r) = acc
            r += 1
          }
          out(c) =
            if (order == 0) {
              // scipy order-0: nearest via floor(x + 0.5)
              var k = 0
              while (k < ndim) { g(k) = math.floor(srcPos(k) + 0.5).toInt; k += 1 }
              sample(g)
            } else {
              if (order == 3) {
                // cubic B-spline blend over the 4^d neighborhood of the
                // prefiltered coefficients
                var k = 0
                while (k < ndim) {
                  base(k) = math.floor(srcPos(k)).toInt
                  val t = srcPos(k) - base(k)
                  val t2 = t * t; val t3 = t2 * t
                  wAxis(k)(0) = (1 - 3 * t + 3 * t2 - t3) / 6.0 // offset −1: (1−t)³/6
                  wAxis(k)(1) = (3 * t3 - 6 * t2 + 4) / 6.0 // offset 0
                  wAxis(k)(2) = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0 // offset 1
                  wAxis(k)(3) = t3 / 6.0 // offset 2
                  k += 1
                }
              } else if (order >= 2) {
                // general B-spline blend (orders 2, 4, 5): support =
                // order+1 points starting at scipy's start index —
                // floor(x) − order/2 odd, floor(x + 0.5) − order/2 even
                val half = order / 2
                var k = 0
                while (k < ndim) {
                  base(k) = (if (order % 2 == 1) math.floor(srcPos(k))
                    else math.floor(srcPos(k) + 0.5)).toInt - half
                  var t = 0
                  while (t <= order) {
                    wAxis(k)(t) = bspline(order, srcPos(k) - (base(k) + t)); t += 1
                  }
                  k += 1
                }
              } else {
                // multilinear blend over the 2^d floor-corner cube
                var k = 0
                while (k < ndim) {
                  base(k) = math.floor(srcPos(k)).toInt
                  val frac = srcPos(k) - base(k)
                  wAxis(k)(0) = 1.0 - frac
                  wAxis(k)(1) = frac
                  k += 1
                }
              }
              var acc = 0.0
              var ci = 0
              while (ci < corners.length) {
                val offs = corners(ci)
                var w = 1.0
                var k = 0
                while (k < ndim) {
                  w *= wAxis(k)(offs(k))
                  g(k) = base(k) + offs(k) + cornerShift
                  k += 1
                }
                if (w != 0.0) acc += w * sample(g)
                ci += 1
              }
              acc
            }
        }
        Block(imageId, oIdx, n.outOrigin, n.outShape, chunk, outShape, out.data)
      }
  }

  /** affine_transform over TYPED payloads, orders 0–1: the gather join
    * ships NATIVE bytes (1 B/px on uint8 — 8× less shuffle than the
    * float64 Block path), samples decode at the kernel edge, and the
    * result encodes to `outDtype` (f32/f64 for interpolated output, the
    * input dtype for order-0 nearest). Spline orders need the float
    * prefilter — promote with `TBlock.toBlocks` first. Same distributed
    * needs-table build and allocation-free kernel as the float path. */
  def affineTransformTyped(
      ds: Dataset[TBlock],
      ndim: Int,
      matrix: Array[Array[Double]],
      offset: Array[Double],
      outputShape: Option[Seq[Int]] = None,
      order: Int = 1,
      cval: Double = 0.0,
      outDtype: DType = DType.F32): Dataset[TBlock] = {
    require(order == 0 || order == 1,
      "typed affine: orders 0/1 only (promote to float Blocks for spline orders)")
    val spark = ds.sparkSession
    import spark.implicits._
    val proto = ds.head()
    val inShape = proto.arrayShape
    val chunk = proto.chunk
    val outShape = outputShape.getOrElse(inShape)
    val needsDs = needsDataset(spark, ndim, matrix, offset,
      chunk, inShape, outShape, margin = 1)
    val bcM = spark.sparkContext.broadcast((matrix, offset))
    val imageId = proto.imageId
    val inDtype = proto.dtype
    val outName = outDtype.name

    needsDs.joinWith(ds, needsDs("inIdx") === ds("idx"), "left_outer")
      .groupByKey(_._1.outIdx)
      .mapGroups { (oIdx: Seq[Int], it: Iterator[(Need, TBlock)]) =>
        val rows = it.toSeq
        val n = rows.head._1
        val (m, off) = bcM.value
        val dt = DType.of(inDtype)
        val odt = DType.of(outName)
        val chunkA = chunk.toArray
        val inShapeA = inShape.toArray
        val inGrid = new Array[Int](ndim)
        var kk = 0
        while (kk < ndim) {
          inGrid(kk) = (inShapeA(kk) + chunkA(kk) - 1) / chunkA(kk); kk += 1
        }
        val byLin = new java.util.HashMap[java.lang.Long, (Array[Int], Array[Int], Array[Byte])]()
        rows.foreach { r =>
          val b = r._2
          if (b != null) {
            require(b.dtype == inDtype,
              s"typed affine: mixed dtypes (${b.dtype} vs $inDtype) — promote first")
            var lin = 0L
            var k = 0
            while (k < ndim) { lin = lin * inGrid(k) + b.idx(k); k += 1 }
            val shapeA = b.shape.toArray
            val strides = new Array[Int](ndim)
            var acc = 1
            var j = ndim - 1
            while (j >= 0) { strides(j) = acc; acc *= shapeA(j); j -= 1 }
            byLin.put(lin, (b.origin.toArray, strides, b.data))
          }
        }
        def sample(g: Array[Int]): Double = {
          var k = 0
          while (k < ndim) {
            if (g(k) < 0 || g(k) >= inShapeA(k)) return cval
            k += 1
          }
          var lin = 0L
          k = 0
          while (k < ndim) { lin = lin * inGrid(k) + g(k) / chunkA(k); k += 1 }
          val e = byLin.get(lin)
          if (e == null) return cval
          val (origin, strides, data) = e
          var o = 0
          k = 0
          while (k < ndim) { o += (g(k) - origin(k)) * strides(k); k += 1 }
          dt.read(data, o)
        }
        val srcPos = new Array[Double](ndim)
        val g = new Array[Int](ndim)
        val base = new Array[Int](ndim)
        val corners: Array[Array[Int]] =
          if (order == 0) Array.empty
          else Grid.cartesian(Seq.fill(ndim)(2)).map(_.toArray).toArray
        val wAxis = Array.ofDim[Double](ndim, 2)
        val outSh = n.outShape.toArray
        val outData = new Array[Byte](outSh.product * odt.bytes)
        // zero-allocation coordinate walker (an Nd.zeros walker would
        // waste 8 B/px of dead doubles): plain odometer, last axis fastest
        // — the same order Nd.foreachCoord produces
        val c = new Array[Int](ndim)
        var elem = 0
        val totalElems = outSh.product
        while (elem < totalElems) {
          var r = 0
          while (r < ndim) {
            var acc = off(r)
            var cc = 0
            while (cc < ndim) { acc += m(r)(cc) * (n.outOrigin(cc) + c(cc)); cc += 1 }
            srcPos(r) = acc
            r += 1
          }
          val v =
            if (order == 0) {
              var k = 0
              while (k < ndim) { g(k) = math.floor(srcPos(k) + 0.5).toInt; k += 1 }
              sample(g)
            } else {
              var k = 0
              while (k < ndim) {
                base(k) = math.floor(srcPos(k)).toInt
                val frac = srcPos(k) - base(k)
                wAxis(k)(0) = 1.0 - frac
                wAxis(k)(1) = frac
                k += 1
              }
              var acc = 0.0
              var ci = 0
              while (ci < corners.length) {
                val offs = corners(ci)
                var w = 1.0
                var k2 = 0
                while (k2 < ndim) {
                  w *= wAxis(k2)(offs(k2))
                  g(k2) = base(k2) + offs(k2)
                  k2 += 1
                }
                if (w != 0.0) acc += w * sample(g)
                ci += 1
              }
              acc
            }
          odt.write(outData, elem, v)
          elem += 1
          // odometer: advance c, last axis fastest
          var j = ndim - 1
          var carry = true
          while (carry && j >= 0) {
            c(j) += 1
            if (c(j) < outSh(j)) carry = false else { c(j) = 0; j -= 1 }
          }
        }
        TBlock(imageId, oIdx, n.outOrigin, n.outShape, chunk, outShape,
          outName, outData)
      }
  }

  /** The input blocks one output block needs (pure per-cell math shared by
    * the distributed build and the spec's driver-side equality pin). */
  private[graft] def needsOf(
      oIdx: Seq[Int], ndim: Int,
      matrix: Array[Array[Double]], offset: Array[Double],
      chunk: Seq[Int], inShape: Seq[Int], outShape: Seq[Int],
      margin: Int): Seq[AffineNeed] = {
    val oOrigin = oIdx.indices.map(k => oIdx(k) * chunk(k))
    val oShape = oIdx.indices.map(k => math.min(chunk(k), outShape(k) - oOrigin(k)))
    // transform all 2^d corners → input bbox
    val corners = Grid.cartesian(Seq.fill(ndim)(2)).map { bits =>
      val g = oIdx.indices.map(k => (oOrigin(k) + bits(k) * (oShape(k) - 1)).toDouble)
      (0 until ndim).map(r =>
        (0 until ndim).map(c => matrix(r)(c) * g(c)).sum + offset(r))
    }
    val lo = (0 until ndim).map(k => math.floor(corners.map(_(k)).min).toInt - margin)
    val hi = (0 until ndim).map(k => math.ceil(corners.map(_(k)).max).toInt + margin)
    // input blocks overlapping [lo, hi], clipped to the input grid
    val bLo = lo.indices.map(k => math.max(0, lo(k) / chunk(k)))
    val bHi = hi.indices.map(k =>
      math.min((inShape(k) - 1) / chunk(k), math.max(0, hi(k) / chunk(k))))
    val ranges = bLo.indices.map(k => (bHi(k) - bLo(k) + 1).max(0))
    val hits = Grid.cartesian(ranges).map { off =>
      AffineNeed(oIdx, oOrigin, oShape, off.indices.map(k => bLo(k) + off(k)))
    }
    // a fully-outside output block still must exist (all-cval): sentinel
    // need that matches no input block, kept by the left-outer join
    if (hits.nonEmpty) hits
    else Seq(AffineNeed(oIdx, oOrigin, oShape, Seq.fill(ndim)(-1)))
  }

  /** Distributed needs table: spark.range over the output-grid cell count,
    * mixed-radix decode of the cell id → oIdx, then needsOf per row. The
    * driver holds only the d-element geometry vectors — O(1) heap at any
    * grid size (the r9 verdict's remaining scale-killer, now closed). */
  private[graft] def needsDataset(
      spark: SparkSession, ndim: Int,
      matrix: Array[Array[Double]], offset: Array[Double],
      chunk: Seq[Int], inShape: Seq[Int], outShape: Seq[Int],
      margin: Int): Dataset[AffineNeed] = {
    import spark.implicits._
    val gridDims = outShape.indices.map(k => (outShape(k) + chunk(k) - 1) / chunk(k))
    val total = gridDims.map(_.toLong).product
    val bc = spark.sparkContext.broadcast(
      (matrix, offset, chunk, inShape, outShape, gridDims))
    spark.range(total).flatMap { cellId =>
      val (m, off, ch, inS, outS, gd) = bc.value
      val d = gd.length
      // row-major decode, last dim fastest — Grid.cartesian's order
      val oIdx = new Array[Int](d)
      var rem: Long = cellId
      var k = d - 1
      while (k >= 0) { oIdx(k) = (rem % gd(k)).toInt; rem /= gd(k); k -= 1 }
      needsOf(oIdx.toSeq, d, m, off, ch, inS, outS, margin)
    }
  }

  /** Driver-side enumeration of the same needs table — spec-only twin for
    * the distributed-build equality pin (InterpFourierSpec); never on the
    * query path. */
  private[graft] def needsDriverSide(
      ndim: Int, matrix: Array[Array[Double]], offset: Array[Double],
      chunk: Seq[Int], inShape: Seq[Int], outShape: Seq[Int],
      margin: Int): Seq[AffineNeed] = {
    val gridDims = outShape.indices.map(k => (outShape(k) + chunk(k) - 1) / chunk(k))
    Grid.cartesian(gridDims).flatMap(oIdx =>
      needsOf(oIdx, ndim, matrix, offset, chunk, inShape, outShape, margin))
  }

  /** rotate(input, angle, axes, reshape) — 2-d rotation in a coordinate
    * plane, delegating to affine_transform (ndinterp/__init__.py::rotate
    * ≈ L180–260; scipy semantics: output coords map to input via the
    * forward rotation matrix of −angle around the array center). */
  def rotate(ds: Dataset[Block], ndim: Int, angleDeg: Double, axes: (Int, Int) = (1, 0),
      reshape: Boolean = true, order: Int = 1, cval: Double = 0.0): Dataset[Block] = {
    val (m, off, outShape) =
      rotateGeometry(ds.head().arrayShape, ndim, angleDeg, axes, reshape)
    affineTransform(ds, ndim, m, off, Some(outShape), order, cval)
  }

  /** rotate over TYPED payloads, orders 0–1 — delegates to the typed
    * affine gather (native bytes on the wire; order-0 can keep the input
    * dtype end to end). Spline orders: promote via TBlock.toBlocks. */
  def rotateTyped(ds: Dataset[TBlock], ndim: Int, angleDeg: Double,
      axes: (Int, Int) = (1, 0), reshape: Boolean = true, order: Int = 1,
      cval: Double = 0.0, outDtype: DType = DType.F32): Dataset[TBlock] = {
    val (m, off, outShape) =
      rotateGeometry(ds.head().arrayShape, ndim, angleDeg, axes, reshape)
    affineTransformTyped(ds, ndim, m, off, Some(outShape), order, cval, outDtype)
  }

  /** Shared rotation geometry: inverse-map matrix, offset, and (reshaped)
    * output shape — metadata-only, identical for both payload paths. */
  private def rotateGeometry(inShape: Seq[Int], ndim: Int, angleDeg: Double,
      axes: (Int, Int), reshape: Boolean)
      : (Array[Array[Double]], Array[Double], Seq[Int]) = {
    val (a0, a1) = axes
    val rad = math.toRadians(angleDeg)
    val (c, s) = (math.cos(rad), math.sin(rad))
    // output shape (scipy reshape=True: rotated bbox of the plane)
    val (h, w) = (inShape(a0), inShape(a1))
    val (oh, ow) =
      if (!reshape) (h, w)
      else {
        val cs = math.abs(c); val sn = math.abs(s)
        (math.round(h * cs + w * sn).toInt, math.round(h * sn + w * cs).toInt)
      }
    val outShape = inShape.indices.map(k =>
      if (k == a0) oh else if (k == a1) ow else inShape(k))
    // inverse map: in = R · (out − outCenter) + inCenter, R = [[c,s],[−s,c]]
    val inC0 = (h - 1) / 2.0; val inC1 = (w - 1) / 2.0
    val outC0 = (oh - 1) / 2.0; val outC1 = (ow - 1) / 2.0
    val m = Array.tabulate(ndim, ndim)((r, cc) =>
      if (r == a0 && cc == a0) c
      else if (r == a0 && cc == a1) s
      else if (r == a1 && cc == a0) -s
      else if (r == a1 && cc == a1) c
      else if (r == cc) 1.0 else 0.0)
    val off = Array.tabulate(ndim) { r =>
      if (r == a0) inC0 - c * outC0 - s * outC1
      else if (r == a1) inC1 + s * outC0 - c * outC1
      else 0.0
    }
    (m, off, outShape)
  }

  // ------------------------------------------------------------ splines

  /** Pole(s) of the B-spline prefilter per order (scipy get_spline_poles:
    * closed-form roots of the B-spline z-transform denominators). */
  private def poles(order: Int): Array[Double] = order match {
    case 0 | 1 => Array.empty
    case 2 => Array(math.sqrt(8.0) - 3.0)
    case 3 => Array(math.sqrt(3.0) - 2.0)
    case 4 => Array(
      math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
      math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0)
    case 5 => Array(
      math.sqrt(135.0 / 2.0 - math.sqrt(17745.0 / 4.0)) + math.sqrt(105.0 / 4.0) - 13.0 / 2.0,
      math.sqrt(135.0 / 2.0 + math.sqrt(17745.0 / 4.0)) - math.sqrt(105.0 / 4.0) - 13.0 / 2.0)
    case other => throw new IllegalArgumentException(s"spline order $other unsupported")
  }

  /** Centered cardinal B-spline B_n(u), exact via Cox–de Boor recursion
    * (B_0 = 1 on [−½, ½)); used for the order-2/4/5 interpolation basis. */
  private[graft] def bspline(n: Int, u: Double): Double =
    if (n == 0) { if (u >= -0.5 && u < 0.5) 1.0 else 0.0 }
    else (u + (n + 1) * 0.5) / n * bspline(n - 1, u + 0.5) +
      ((n + 1) * 0.5 - u) / n * bspline(n - 1, u - 0.5)

  /** Finite-halo depth so the truncated IIR tail < 1e−10 — the same
    * approximation the reference documents for its spline_filter
    * (ndinterp/__init__.py::spline_filter ≈ L270–330). */
  private def splineDepth(order: Int): Int = {
    val ps = poles(order)
    if (ps.isEmpty) 0
    else ps.map(p => math.ceil(math.log(1e-10) / math.log(math.abs(p))).toInt).max
  }

  /** In-place causal+anticausal IIR along one line (scipy's
    * spline_filter1d recursion, truncated-tail initialization). */
  private def iirLine(line: Array[Double], order: Int): Unit = {
    val ps = poles(order)
    if (ps.isEmpty) return
    for (p <- ps) {
      val gain = (1.0 - p) * (1.0 - 1.0 / p)
      var i = 0
      while (i < line.length) { line(i) *= gain; i += 1 }
      // causal (init with the value itself — the truncation the halo hides)
      i = 1
      while (i < line.length) { line(i) += p * line(i - 1); i += 1 }
      // anticausal, scipy mirror init: c[n−1] ← p/(p²−1)·(p·c[n−2] + c[n−1])
      line(line.length - 1) =
        p / (p * p - 1.0) * (p * line(line.length - 2) + line(line.length - 1))
      i = line.length - 2
      while (i >= 0) { line(i) = p * (line(i + 1) - line(i)); i -= 1 }
    }
  }

  /** spline_filter1d(image, order, axis) — IIR prefilter along one axis
    * with finite halo (mirror boundary, scipy's default). */
  def splineFilter1d(ds: Dataset[Block], ndim: Int, order: Int = 3,
      axis: Int = -1): Dataset[Block] = {
    val ax = if (axis < 0) ndim + axis else axis
    val d = splineDepth(order)
    if (d == 0) return ds
    val depth = (0 until ndim).map(k => if (k == ax) d else 0)
    Halo.mapOverlap(ds, depth, Boundary.Mirror) { p =>
      val in = p.nd
      val out = Nd.zeros(p.block.shape.toArray)
      // iterate lines along `ax`
      val lineLen = in.shape(ax)
      val others = (0 until ndim).filter(_ != ax)
      val otherShape = others.map(in.shape(_)).toArray
      val iterNd = Nd.zeros(if (otherShape.isEmpty) Array(1) else otherShape)
      iterNd.foreachCoord { oc =>
        val line = new Array[Double](lineLen)
        val base = new Array[Int](ndim)
        others.zipWithIndex.foreach { case (k, i) => base(k) = oc(i) }
        var i = 0
        while (i < lineLen) {
          base(ax) = i
          line(i) = in(base)
          i += 1
        }
        iirLine(line, order)
        // write back the unpadded center
        val ocOut = new Array[Int](ndim)
        others.zipWithIndex.foreach { case (k, i) => ocOut(k) = oc(i) }
        i = 0
        while (i < out.shape(ax)) {
          ocOut(ax) = i
          out(ocOut) = line(i + d)
          i += 1
        }
      }
      out.data
    }
  }

  /** spline_filter — sequential per-axis 1-d prefilters. */
  def splineFilter(ds: Dataset[Block], ndim: Int, order: Int = 3): Dataset[Block] =
    (0 until ndim).foldLeft(ds)((acc, ax) => splineFilter1d(acc, ndim, order, ax))
}
