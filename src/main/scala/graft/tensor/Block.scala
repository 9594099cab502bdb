package graft.tensor

import org.apache.spark.sql.{Dataset, SparkSession}

/** One chunk of an n-dimensional array — the engine's tensor unit of
  * parallelism, mirroring the reference's dask chunk
  * (dask_image consumes `dask.array.Array` grids of NumPy blocks, e.g.
  * dask_image/ndfilters/_gaussian.py::gaussian_filter ≈ L20–80).
  *
  * Payload is a dense C-order Array[Double] (one row per block keeps the
  * whole array distributed; a 100 TB image is just many rows). `chunk` is
  * the nominal chunk shape — edge blocks may be smaller (`shape`), exactly
  * like dask's ragged trailing chunks. Labels/booleans ride the same
  * payload (0.0/1.0, exact integers up to 2^53).
  *
  * @param imageId    image identifier (several images can share a Dataset)
  * @param idx        block grid index, one entry per dimension
  * @param origin     global coordinate of this block's first element
  * @param shape      this block's actual shape
  * @param chunk      nominal chunk shape (grid geometry)
  * @param arrayShape full array shape
  * @param data       C-order dense payload, length = shape.product
  */
case class Block(
    imageId: String,
    idx: Seq[Int],
    origin: Seq[Int],
    shape: Seq[Int],
    chunk: Seq[Int],
    arrayShape: Seq[Int],
    data: Array[Double]) {
  def ndim: Int = shape.length
  /** Number of blocks along each grid axis. */
  def gridDims: Seq[Int] =
    arrayShape.zip(chunk).map { case (n, c) => (n + c - 1) / c }
}

/** Dense C-order n-d array with strided access — the in-kernel working
  * representation (the role NumPy plays inside each scipy.ndimage call). */
final class Nd(val shape: Array[Int], val data: Array[Double]) extends Serializable {
  val ndim: Int = shape.length
  val strides: Array[Int] = {
    val s = new Array[Int](ndim)
    var acc = 1
    var k = ndim - 1
    while (k >= 0) { s(k) = acc; acc *= shape(k); k -= 1 }
    s
  }
  def size: Int = data.length
  @inline def offset(coords: Array[Int]): Int = {
    var o = 0; var k = 0
    while (k < ndim) { o += coords(k) * strides(k); k += 1 }
    o
  }
  @inline def apply(coords: Array[Int]): Double = data(offset(coords))
  @inline def update(coords: Array[Int], v: Double): Unit = data(offset(coords)) = v

  /** Odometer iteration over all coordinates; `f` must not retain the
    * passed array (it is reused). */
  def foreachCoord(f: Array[Int] => Unit): Unit = {
    if (size == 0) return
    val c = new Array[Int](ndim)
    var done = false
    while (!done) {
      f(c)
      var k = ndim - 1
      var carry = true
      while (carry && k >= 0) {
        c(k) += 1
        if (c(k) < shape(k)) carry = false else { c(k) = 0; k -= 1 }
      }
      done = carry
    }
  }

  /** Copy the hyper-rectangle starting at `lo` with shape `subShape` of
    * `src` into this array at position `dstLo`. */
  def copyRegion(src: Nd, lo: Array[Int], subShape: Array[Int], dstLo: Array[Int]): Unit = {
    val sub = new Nd(subShape, new Array[Double](subShape.product))
    sub.foreachCoord { c =>
      val sc = new Array[Int](ndim)
      val dc = new Array[Int](ndim)
      var k = 0
      while (k < ndim) { sc(k) = lo(k) + c(k); dc(k) = dstLo(k) + c(k); k += 1 }
      this (dc) = src(sc)
    }
  }
}

object Nd {
  def zeros(shape: Array[Int]): Nd = new Nd(shape, new Array[Double](shape.product))
  def of(shape: Array[Int], data: Array[Double]): Nd = {
    require(data.length == shape.product, s"shape ${shape.toSeq} != data ${data.length}")
    new Nd(shape, data)
  }
}

/** scipy.ndimage boundary modes (dask_image/ndfilters/_utils.py::
  * _get_depth_boundary maps these to dask pad modes; semantics follow
  * np.pad / scipy.ndimage exactly). */
sealed trait Boundary
object Boundary {
  /** (d c b a | a b c d | d c b a) — scipy 'reflect' */
  case object Reflect extends Boundary
  /** constant fill with cval — scipy 'constant' */
  final case class Constant(cval: Double) extends Boundary
  /** (a a a a | a b c d | d d d d) — scipy 'nearest' */
  case object Nearest extends Boundary
  /** (c d c b | a b c d | c b a b) — scipy 'mirror' (reflect w/o edge dup) */
  case object Mirror extends Boundary
  /** (a b c d | a b c d | a b c d) — scipy 'wrap' */
  case object Wrap extends Boundary

  def of(name: String, cval: Double = 0.0): Boundary = name match {
    case "reflect" => Reflect
    case "constant" => Constant(cval)
    case "nearest" => Nearest
    case "mirror" => Mirror
    case "wrap" => Wrap
    case other => throw new IllegalArgumentException(s"unknown boundary mode: $other")
  }

  /** Map an out-of-range global index into [0, n) per the mode; returns -1
    * for Constant (caller fills cval). Matches np.pad single+multiple
    * reflections. */
  def resolve(mode: Boundary, i: Int, n: Int): Int = mode match {
    case Constant(_) => if (i >= 0 && i < n) i else -1
    case Nearest => if (i < 0) 0 else if (i >= n) n - 1 else i
    case Wrap => math.floorMod(i, n)
    case Reflect => // period 2n: ...3 2 1 0 0 1 2 3 3 2 1 0...
      var j = math.floorMod(i, 2 * n)
      if (j >= n) j = 2 * n - 1 - j
      j
    case Mirror => // period 2n-2: ...2 1 0 1 2 3 2 1 0...
      if (n == 1) 0
      else {
        var j = math.floorMod(i, 2 * n - 2)
        if (j >= n) j = 2 * n - 2 - j
        j
      }
  }
}

/** Build / dismantle block grids. */
object Grid {

  /** Split a full dense array into a Dataset[Block] with the given chunk
    * shape (the `da.from_array(..., chunks=...)` analog). */
  def blockify(
      spark: SparkSession,
      imageId: String,
      full: Nd,
      chunkShape: Seq[Int]): Dataset[Block] = {
    import spark.implicits._
    val shape = full.shape
    val d = shape.length
    require(chunkShape.length == d)
    val gridDims = shape.indices.map(k => (shape(k) + chunkShape(k) - 1) / chunkShape(k))
    val blocks = cartesian(gridDims).map { idx =>
      val origin = idx.indices.map(k => idx(k) * chunkShape(k))
      val bShape = idx.indices.map(k => math.min(chunkShape(k), shape(k) - origin(k)))
      val out = Nd.zeros(bShape.toArray)
      out.foreachCoord { c =>
        val g = new Array[Int](d)
        var k = 0
        while (k < d) { g(k) = origin(k) + c(k); k += 1 }
        out(c) = full(g)
      }
      Block(imageId, idx, origin, bShape, chunkShape, shape.toSeq, out.data)
    }
    spark.createDataset(blocks)
  }

  /** Collect a block Dataset back into one dense array (test/driver-side
    * only — the distributed path never calls this). */
  def unblockify(ds: Dataset[Block]): Nd = {
    val blocks = ds.collect()
    require(blocks.nonEmpty, "empty block set")
    val shape = blocks.head.arrayShape.toArray
    val out = Nd.zeros(shape)
    val d = shape.length
    for (b <- blocks) {
      val bn = Nd.of(b.shape.toArray, b.data)
      bn.foreachCoord { c =>
        val g = new Array[Int](d)
        var k = 0
        while (k < d) { g(k) = b.origin(k) + c(k); k += 1 }
        out(g) = bn(c)
      }
    }
    out
  }

  /** All index tuples of a grid, row-major. */
  def cartesian(dims: Seq[Int]): Seq[Seq[Int]] =
    dims.foldLeft(Seq(Seq.empty[Int])) { (acc, n) =>
      acc.flatMap(prefix => (0 until n).map(prefix :+ _))
    }
}
