package graft.tensor

import org.apache.spark.sql.Dataset

/** Binary morphology (dask_image.ndmorph, 4 ops — SURVEY.md §2A.6).
  * Boolean images ride the Double payload as 0.0 / 1.0.
  *
  * Each op is `map_overlap` of the scipy binary op with
  * depth = structure radius × iterations
  * (dask_image/ndmorph/_utils.py::_get_depth ≈ L10–40); iterations are
  * applied inside one padded kernel, so an N-iteration op still costs a
  * single halo shuffle.
  */
object Morph {

  /** scipy.ndimage.generate_binary_structure(rank, connectivity):
    * true where Σ|offset| ≤ connectivity. */
  def binaryStructure(rank: Int, connectivity: Int = 1): Nd = {
    val s = Nd.zeros(Array.fill(rank)(3))
    s.foreachCoord { c =>
      val dist = c.map(x => math.abs(x - 1)).sum
      if (dist <= connectivity) s(c) = 1.0
    }
    s
  }

  /** Per-axis structure radii: an axis the structure does not span gets
    * radius 0 — so a 2-d cross embedded in a 3-d frame stack ships NO
    * frame-axis halo at all (the scalar-max form copied whole neighbor
    * frames for nothing). */
  private[tensor] def radii(st: Nd, center: Seq[Int]): Seq[Int] =
    st.shape.indices.map(k => math.max(center(k), st.shape(k) - 1 - center(k)))

  private def run(ds: Dataset[Block], structure: Option[Nd], iterations: Int,
      borderValue: Double, rank: Int, erode: Boolean): Dataset[Block] = {
    val st = structure.getOrElse(binaryStructure(rank, 1))
    val center = st.shape.map(_ / 2)
    val r = radii(st, center)
    val depth = r.map(_ * iterations)
    val offs = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      st.foreachCoord(c => if (st(c) != 0.0) buf += c.indices.map(k => c(k) - center(k)).toArray)
      buf.toArray
    }
    // scipy: erosion's border_value defaults treat outside as `borderValue`
    Halo.mapOverlap(ds, depth, Boundary.Constant(borderValue)) { p =>
      val d = p.block.ndim
      var cur = p.nd
      var it = 0
      while (it < iterations) {
        // valid output region shrinks by the per-axis radius per iteration
        val outShape = cur.shape.indices.map(k => cur.shape(k) - 2 * r(k)).toArray
        val out = Nd.zeros(outShape)
        out.foreachCoord { oc =>
          var ok = erode // erode: assume all-1 until a 0; dilate: assume no-1
          var t = 0
          while (t < offs.length && (ok == erode)) {
            var off = 0
            var k = 0
            while (k < d) { off += (oc(k) + r(k) + offs(t)(k)) * cur.strides(k); k += 1 }
            val v = cur.data(off) != 0.0
            if (erode) { if (!v) ok = false } else { if (v) ok = true }
            t += 1
          }
          out(oc) = if (ok) 1.0 else 0.0
        }
        cur = out
        it += 1
      }
      require(cur.shape.toSeq == p.block.shape)
      cur.data
    }
  }

  /** binary_erosion (ndmorph/__init__.py::binary_erosion; scipy default
    * border_value=0 — the border erodes). */
  def binaryErosion(ds: Dataset[Block], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1, borderValue: Double = 0.0): Dataset[Block] =
    run(ds, structure, iterations, borderValue, rank, erode = true)

  /** binary_dilation (border treated as 0, scipy default). */
  def binaryDilation(ds: Dataset[Block], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1, borderValue: Double = 0.0): Dataset[Block] =
    run(ds, structure, iterations, borderValue, rank, erode = false)

  /** binary_opening = erosion then dilation. */
  def binaryOpening(ds: Dataset[Block], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1): Dataset[Block] =
    binaryDilation(binaryErosion(ds, rank, structure, iterations), rank, structure, iterations)

  /** binary_closing = dilation then erosion. */
  def binaryClosing(ds: Dataset[Block], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1): Dataset[Block] =
    binaryErosion(binaryDilation(ds, rank, structure, iterations), rank, structure, iterations)
}

/** Byte-domain binary morphology: the same scipy semantics over 1-byte
  * (bool/uint8) typed payloads. Morphology is a boolean-domain family —
  * the float64 path pays 8 bytes/pixel of halo shuffle for 1 bit of
  * information; here the mask halo-exchanges, erodes, and dilates
  * entirely in the byte domain (TensorSpec pins the widths and the
  * float-path equivalence). Iterations still run inside ONE padded
  * kernel, so an N-iteration op costs a single halo shuffle. */
object TMorph {

  private def run(ds: Dataset[TBlock], structure: Option[Nd], iterations: Int,
      borderValue: Double, rank: Int, erode: Boolean): Dataset[TBlock] = {
    val st = structure.getOrElse(Morph.binaryStructure(rank, 1))
    val center = st.shape.map(_ / 2)
    val r = Morph.radii(st, center)
    val depth = r.map(_ * iterations)
    val offs = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      st.foreachCoord(c => if (st(c) != 0.0) buf += c.indices.map(k => c(k) - center(k)).toArray)
      buf.toArray
    }
    THalo.mapOverlap(ds, depth, Boundary.Constant(borderValue)) { p =>
      require(p.block.dt.bytes == 1,
        s"TMorph: 1-byte (bool/uint8) payloads only, got ${p.block.dtype}")
      val d = p.block.ndim
      var cur = p.bnd
      var it = 0
      while (it < iterations) {
        // valid output region shrinks by the per-axis radius per iteration
        val outShape = cur.shape.indices.map(k => cur.shape(k) - 2 * r(k)).toArray
        val out = BNd.zeros(outShape, 1)
        val oc = new Array[Int](d)
        var done = outShape.exists(_ == 0)
        while (!done) {
          var ok = erode // erode: assume all-1 until a 0; dilate: assume no-1
          var t = 0
          while (t < offs.length && (ok == erode)) {
            var off = 0
            var k = 0
            while (k < d) { off += (oc(k) + r(k) + offs(t)(k)) * cur.strides(k); k += 1 }
            val v = cur.data(off) != 0
            if (erode) { if (!v) ok = false } else { if (v) ok = true }
            t += 1
          }
          out.data(out.offset(oc)) = if (ok) 1 else 0
          var j = d - 1
          var carry = true
          while (carry && j >= 0) {
            oc(j) += 1
            if (oc(j) < outShape(j)) carry = false else { oc(j) = 0; j -= 1 }
          }
          done = carry
        }
        cur = out
        it += 1
      }
      require(cur.shape.toSeq == p.block.shape)
      cur.data
    }
  }

  def binaryErosion(ds: Dataset[TBlock], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1, borderValue: Double = 0.0): Dataset[TBlock] =
    run(ds, structure, iterations, borderValue, rank, erode = true)

  def binaryDilation(ds: Dataset[TBlock], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1, borderValue: Double = 0.0): Dataset[TBlock] =
    run(ds, structure, iterations, borderValue, rank, erode = false)

  def binaryOpening(ds: Dataset[TBlock], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1): Dataset[TBlock] =
    binaryDilation(binaryErosion(ds, rank, structure, iterations), rank, structure, iterations)

  def binaryClosing(ds: Dataset[TBlock], rank: Int, structure: Option[Nd] = None,
      iterations: Int = 1): Dataset[TBlock] =
    binaryErosion(binaryDilation(ds, rank, structure, iterations), rank, structure, iterations)
}
