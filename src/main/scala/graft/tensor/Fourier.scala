package graft.tensor

import org.apache.spark.sql.Dataset

/** Frequency-domain elementwise operators (dask_image.ndfourier, 3 ops —
  * SURVEY.md §2A.3). Input is an already-FFT'd array; each op multiplies
  * by an analytically-known transfer function of the per-element GLOBAL
  * frequency coordinates (ndfourier/_utils.py::_get_freq_grid ≈ L10–70) —
  * a pure per-block map (no halo): each block derives its frequencies
  * from origin/arrayShape.
  *
  * Complex arrays are interleaved [re, im] pairs in the Block payload
  * (Spark has no complex type); real inputs use the Real variants which
  * produce interleaved complex output where the transfer function does.
  * Like the reference, the FFT itself is out of scope — these operate on
  * spectra.
  */
object Fourier {

  /** np.fft.fftfreq(n)[i] = i/n for i ≤ n/2−1 else (i−n)/n. */
  @inline private def fftfreq(i: Int, n: Int): Double =
    if (i < (n + 1) / 2) i.toDouble / n else (i - n).toDouble / n

  /** Map over complex (interleaved) blocks with the global frequency
    * vector of each element: f(re, im, freqs) → (re', im'). */
  private def mapComplex(ds: Dataset[Block])(
      f: (Double, Double, Array[Double]) => (Double, Double)): Dataset[Block] =
    Filters.mapBlocks(ds) { b =>
      val d = b.ndim
      val shape = b.shape.toArray
      // element shape: last axis holds interleaved pairs → logical shape
      val logical = shape.clone(); logical(d - 1) /= 2
      val nd = Nd.of(logical, new Array[Double](logical.product))
      val out = new Array[Double](b.data.length)
      val freqs = new Array[Double](d)
      nd.foreachCoord { c =>
        var k = 0
        while (k < d) {
          val scale = if (k == d - 1) 2 else 1
          freqs(k) = fftfreq(b.origin(k) / scale + c(k), b.arrayShape(k) / scale)
          k += 1
        }
        val off = 2 * nd.offset(c)
        val (re, im) = f(b.data(off), b.data(off + 1), freqs)
        out(off) = re
        out(off + 1) = im
      }
      out
    }

  /** Lift a real block Dataset to interleaved complex (im = 0). */
  def toComplex(ds: Dataset[Block]): Dataset[Block] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { b =>
      val out = new Array[Double](b.data.length * 2)
      var i = 0
      while (i < b.data.length) { out(2 * i) = b.data(i); i += 1 }
      val d = b.ndim
      def dbl(s: Seq[Int]): Seq[Int] = s.zipWithIndex.map { case (v, k) =>
        if (k == d - 1) v * 2 else v
      }
      Block(b.imageId, b.idx, dbl(b.origin), dbl(b.shape), dbl(b.chunk),
        dbl(b.arrayShape), out)
    }
  }

  /** fourier_gaussian(image, sigma) — multiply the spectrum by
    * exp(−2π²·Σ σ_k² f_k²) (scipy's transfer function). */
  def fourierGaussian(ds: Dataset[Block], sigma: Seq[Double]): Dataset[Block] =
    mapComplex(ds) { (re, im, f) =>
      var e = 0.0
      var k = 0
      while (k < f.length) { e += sigma(k) * sigma(k) * f(k) * f(k); k += 1 }
      val g = math.exp(-2.0 * math.Pi * math.Pi * e)
      (re * g, im * g)
    }

  /** fourier_shift(image, shift) — multiply by exp(−2πi·Σ f_k s_k). */
  def fourierShift(ds: Dataset[Block], shift: Seq[Double]): Dataset[Block] =
    mapComplex(ds) { (re, im, f) =>
      var ph = 0.0
      var k = 0
      while (k < f.length) { ph += f(k) * shift(k); k += 1 }
      val theta = -2.0 * math.Pi * ph
      val c = math.cos(theta); val s = math.sin(theta)
      (re * c - im * s, re * s + im * c)
    }

  /** fourier_uniform(image, size) — multiply by Π sinc(size_k · f_k)
    * (the spectrum of a centered box of `size`). */
  def fourierUniform(ds: Dataset[Block], size: Seq[Double]): Dataset[Block] =
    mapComplex(ds) { (re, im, f) =>
      var g = 1.0
      var k = 0
      while (k < f.length) {
        val x = math.Pi * size(k) * f(k)
        g *= (if (math.abs(x) < 1e-300) 1.0 else math.sin(x) / x)
        k += 1
      }
      (re * g, im * g)
    }
}
