package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line for the driver.
  *
  * Methodology mirrors BASELINE.md exactly: per query, one untimed warm-up
  * then the median of 3 timed runs (the DuckDB baseline is also the median
  * of 3 consecutive warm runs). The headline list is the 16 BASELINE.md
  * keys; the full query surface is exercised by Verify, not here, so the
  * bench total stays comparable run-over-run as operators are added.
  */
object Bench {

  /** The 16 BASELINE.md query keys, in its table order. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "semi_anti_join", "window_rank",
    "window_running", "distinct_users", "rollup_sales", "set_ops",
    "string_funcs", "date_trunc_agg", "json_extract", "tumbling_window",
    "session_gap", "exact_dedup_docs", "doc_token_stats", "cosine_topk")

  /** The LLM-pipeline headliners (BASELINE.md sf1 appendix, round 10):
    * dedup and packing ARE the 100 TB workload, so they get their own
    * benched group — separate from `headline` to keep the relational
    * total comparable round-over-round. Same protocol; the DuckDB twin
    * runs the same keys' oracle SQL (tools/bench_duckdb.py --llm). */
  val llmHeadline: Seq[String] = Seq(
    "minhash_near_dup", "embedding_near_dup", "embedding_near_dup_verdict",
    "tfidf_top_terms",
    "pack_sequences", "shuffle_shards", "line_dedup_docs", "semantic_dedup")

  /** The curation headliners (round 12): the data-curation operators a
    * crawl→training pipeline runs between ingest and dedup — benched as
    * their own group (tools/bench_duckdb.py --curation twin). */
  val curationHeadline: Seq[String] = Seq(
    "exact_substring_dedup", "url_dedup_normalized",
    "quality_gopher", "quality_c4", "unigram_logprob", "heavy_hitters",
    // r13: the previously unbenched curation-adjacent keys — tiering,
    // fuzzy decontamination, the chained pipeline, and the streaming
    // quality gate (timed as one micro-batch drain; its DuckDB twin is
    // the batch-equivalent oracle)
    "quality_tiers", "contamination_fuzzy", "pipeline_curation_v2",
    "stream_quality_gate")

  /** The ANN headliners (round 11): the three approximate top-k paths,
    * benched with RECALL against the exact brute-force top-10 — an ANN
    * operator that got fast by returning the wrong neighbors must fail
    * the artifact, not pass on wall-clock alone. Floors are the sf1
    * measured values minus slack (BASELINE.md ann table); a key below
    * its floor lands in `failed`. */
  val annHeadline: Seq[(String, Double)] = Seq(
    "ivf_cosine_topk" -> 0.8,
    // adaptive probe radius (r15): brute force under ~1k vectors, radius
    // 3 at sf0.1 (measured 0.9), radius 1 from sf1 up (measured 0.9) —
    // the old 0.2 floor dated from the fixed-radius-1 sf0.1 regime
    "ann_hyperplane_topk" -> 0.8,
    "embedding_quantize_topk" -> 0.8,
    // IVF-PQ (r19): 4-bit codes on random embeddings are PQ's
    // adversarial case; the ADC+R=200 re-rank measured 1.0/0.9/0.8/1.0
    // at sf0.001/0.01/0.1/1 — floor under the sf0.1 low point
    "ivf_pq_topk" -> 0.7,
    // stored-index variant: row-identical result by construction, so
    // the same floor; its wall is the serving-path number (no training)
    "ivf_pq_probe" -> 0.7)

  /** Deterministic synthetic grid for the tensor benches: pixel (gi, gj)
    * = ((gi·1315423911 + gj·2654435761) >>> 7) mod 256, blockified at
    * `chunk` — built from a `spark.range` leaf over the CELL count, so
    * the block table is distributed at any grid size (the same property
    * the r10 needs-table fix pinned for affine). */
  private def synthBlocks(spark: SparkSession, H: Int, W: Int,
      chunk: Seq[Int], id: String): org.apache.spark.sql.Dataset[graft.tensor.Block] = {
    import spark.implicits._
    val gh = (H + chunk(0) - 1) / chunk(0)
    val gw = (W + chunk(1) - 1) / chunk(1)
    val (ch, cw) = (chunk(0), chunk(1))
    spark.range(gh.toLong * gw).map { cell =>
      val bi = (cell / gw).toInt; val bj = (cell % gw).toInt
      val oi = bi * ch; val oj = bj * cw
      val h = math.min(ch, H - oi); val w = math.min(cw, W - oj)
      val data = new Array[Double](h * w)
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          val gi = oi + i; val gj = oj + j
          data(i * w + j) =
            (((gi * 1315423911L + gj * 2654435761L) >>> 7) % 256L).toDouble
          j += 1
        }
        i += 1
      }
      graft.tensor.Block(id, Seq(bi, bj), Seq(oi, oj), Seq(h, w), chunk, Seq(H, W), data)
    }
  }

  private def forceB(ds: org.apache.spark.sql.Dataset[graft.tensor.Block]): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(_.data.length.toLong).reduce(_ + _); ()
  }

  private def forceTB(ds: org.apache.spark.sql.Dataset[graft.tensor.TBlock]): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(_.data.length.toLong).reduce(_ + _); ()
  }

  /** Drain the async listener event bus before reading a task-metrics
    * counter (r17, per ADVICE: on a loaded bus, task-end events landing
    * after a fixed sleep were missed or bled into the next measurement).
    * `LiveListenerBus.waitUntilEmpty` is `private[spark]`, hence the
    * reflective call; falls back to the old settle-sleep if the internal
    * API ever moves. */
  private def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(500) }

  /** SPARK_GRAFT_COLD_GROUPS=1 (one-pass mode): sync + drop the OS page
    * cache before each group, so every group measures from the same
    * cold-disk state a standalone run sees. The default pass leaves each
    * group reading the previous group's cache/writeback aftermath — the
    * recurring "in-pass context tax" that made minhash read 208 s
    * in-pass vs 71 s standalone (r17) and window_rank 93 s vs 37 s
    * (r16), and that costs a forensics re-run every round. Root-only
    * (/proc/sys/vm/drop_caches); silently a no-op when not writable, so
    * artifacts are comparable by the env flag, not the platform. */
  private def coldGroupsOn: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_COLD_GROUPS", "0") == "1"

  private def dropCaches(): Boolean =
    try {
      new ProcessBuilder("sync").start().waitFor()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3")
      true
    } catch { case _: Throwable => false }

  private def coldGroup(tag: String): Unit =
    if (coldGroupsOn && dropCaches())
      System.err.println(s"[bench] cold-groups: caches dropped before $tag")

  /** Cold sequential-read throughput of the host disk, MB/s — measured
    * IN the artifact (r19 verdict #2): cold sf100 walls inherit the
    * host's cold-read throughput wholesale, and that throughput swings
    * ~5–12× between windows (159 vs 846 MB/s minutes apart on the same
    * file, a window collapsing 501→70.6 MB/s mid-pass). A cold wall
    * quoted without its probe is uninterpretable, so cold-groups passes
    * now self-adjudicate: caches dropped → read up to 4 GB of the
    * scale's largest table sequentially → drop again (the measured
    * group still starts cold). Returns (mb_per_s, bytes_read);
    * (-1, 0) when the probe can't run (no drop_caches privilege —
    * a warm-cache "probe" would read GB/s fiction). */
  private def diskProbe(sfDir: String): (Double, Long) = {
    val f = new java.io.File(sfDir, "lineitem.parquet")
    val target = Seq(f, new java.io.File(sfDir, "documents.parquet"),
      new java.io.File(sfDir, "orders.parquet")).filter(_.exists())
      .sortBy(-_.length()).headOption.orNull
    if (target == null || !dropCaches()) return (-1.0, 0L)
    val cap = 4L * 1024 * 1024 * 1024
    val buf = new Array[Byte](1 << 20)
    var read = 0L
    val t0 = System.nanoTime()
    val in = new java.io.FileInputStream(target)
    try {
      var n = in.read(buf)
      while (n >= 0 && read < cap) { read += n; n = in.read(buf) }
    } finally in.close()
    val s = (System.nanoTime() - t0) / 1e9
    dropCaches()
    (read / 1e6 / math.max(s, 1e-9), read)
  }

  /** Direct-I/O sequential-read throughput, MB/s — the WARM-pass twin
    * of [[diskProbe]] (r20): warm artifacts (default 16-key mode and
    * non-cold one-pass) inherit the host's disk window too, through
    * writes, spills, shuffle files, and streaming-source listings — the
    * r20 sf10 warm pass flagged stream_throughput purely because the
    * device had collapsed to 79 MB/s cold-read — but dropping caches to
    * measure would evict the very warmth those passes rely on. O_DIRECT
    * bypasses the page cache in BOTH directions: it reads the raw
    * device without evicting cached table pages. Capped at 1 GB (a
    * collapsed window must cost seconds, not a minute) and at whole
    * aligned 1 MiB chunks (O_DIRECT rejects unaligned lengths).
    * Returns (mb_per_s, bytes_read); (-1, 0) when the platform refuses
    * O_DIRECT or no table file is probe-sized. */
  private[graft] def diskProbeDirect(sfDir: String): (Double, Long) = {
    val target = Seq("lineitem.parquet", "documents.parquet", "orders.parquet")
      .map(new java.io.File(sfDir, _)).filter(_.exists())
      .sortBy(-_.length()).headOption.orNull
    if (target == null) return (-1.0, 0L)
    val chunk = 1 << 20
    val len = math.min(target.length - target.length % chunk,
      1024L * 1024 * 1024)
    if (len <= 0) return (-1.0, 0L)
    try {
      val ch = java.nio.channels.FileChannel.open(target.toPath,
        java.nio.file.StandardOpenOption.READ,
        com.sun.nio.file.ExtendedOpenOption.DIRECT)
      try {
        val buf = java.nio.ByteBuffer.allocateDirect(chunk + 4096)
          .alignedSlice(4096)
        var read = 0L
        var eof = false
        val t0 = System.nanoTime()
        while (read < len && !eof) {
          buf.clear()
          buf.limit(chunk)
          val n = ch.read(buf)
          if (n <= 0) eof = true else read += n
        }
        val s = (System.nanoTime() - t0) / 1e9
        (read / 1e6 / math.max(s, 1e-9), read)
      } finally ch.close()
    // NonFatal only (r21, per ADVICE): a fatal error (OOM, interrupt)
    // must propagate, not masquerade as a clean probe decline
    } catch { case scala.util.control.NonFatal(_) => (-1.0, 0L) }
  }

  /** The mode-appropriate probe WITH its kind (r21, per ADVICE: the kind
    * was previously re-derived from the cold-groups env flag at JSON
    * time, so a COLD_GROUPS=1 flag without ONEPASS mislabeled the
    * default path's O_DIRECT measurement as drop_caches): cold-groups
    * passes measure the cold-read window (drop → read → drop); warm
    * passes measure the same device through O_DIRECT without touching
    * the cache. */
  private def diskProbeAuto(sfDir: String): (Double, Long, String) =
    if (coldGroupsOn) { val (m, b) = diskProbe(sfDir); (m, b, "drop_caches") }
    else { val (m, b) = diskProbeDirect(sfDir); (m, b, "o_direct") }

  /** Shared probe-pair JSON: `disk_probe_mb_per_s` + `disk_contended`.
    * The 256 MB / 400 MB/s band is evaluated PER END (r21, per ADVICE:
    * min(pre, post) bytes let one declined end suppress the flag even
    * when the surviving end measured a collapsed window); a declined end
    * emits `null` instead of the old undocumented -1 sentinel. Empty
    * when neither probe ran, so artifacts stay comparable by field
    * presence. */
  private def diskJsonFor(pre: (Double, Long), post: (Double, Long),
      kind: String): String = {
    if (pre._1 < 0 && post._1 < 0) return ""
    def bandValid(e: (Double, Long)): Boolean =
      e._1 >= 0 && e._2 >= 256L * 1024 * 1024
    val contended = Seq(pre, post).exists(e => bandValid(e) && e._1 < 400.0)
    def js(e: (Double, Long)): String = if (e._1 < 0) "null" else r4(e._1)
    val probeMb = math.max(if (pre._1 < 0) 0L else pre._2,
      if (post._1 < 0) 0L else post._2) / 1048576
    s""","disk_probe_mb_per_s":{"pre":${js(pre)},""" +
      s""""post":${js(post)},"probe_mb":$probeMb,""" +
      s""""kind":"$kind"},"disk_contended":$contended"""
  }

  // sink for the CPU probe's fold results — a field store the JIT cannot
  // prove dead, so the spin loop never folds away
  @volatile private var cpuProbeSink: Double = 0.0

  /** Deterministic CPU spin probe (r21, verdict #2): the disk probes
    * cannot see CPU contention, and CPU-bound keys (PQ/Lloyd training)
    * swung far more than the dispatch floor in r20's polluted window.
    * Fixed work — `iters` passes of a 4096-wide multiply-add fold over a
    * constant array (the argmax_dot kernel's shape) — timed once on the
    * calling thread (`single_ms`) and once on `threads` concurrent
    * threads each running the identical work (`multi_ms` = slowest
    * thread, i.e. the all-cores wall). Healthy idle readings on this
    * host (measured r21): single ≈ 23 ms, multi ≈ 48 ms at 32 threads;
    * `cpu_contended` flags when either exceeds its reference band
    * (env-overridable), the CPU twin of the 400 MB/s disk band. */
  private def cpuSpin(iters: Int): Double = {
    val a = Array.tabulate(4096)(i => (((i * 1315423911L) >>> 7) % 256L).toDouble / 256.0)
    var acc = 0.0
    val t0 = System.nanoTime()
    var it = 0
    while (it < iters) {
      var s = 0.0
      var i = 0
      while (i < 4096) { s += a(i) * a((i + it) & 4095); i += 1 }
      acc += s
      it += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    cpuProbeSink = acc
    ms
  }

  private def cpuProbeJson(threads: Int): String = {
    try {
      val iters = sys.env.getOrElse("SPARK_GRAFT_CPU_ITERS", "8192").toInt
      cpuSpin(iters); cpuSpin(iters) // JIT warm-up (C2), untimed
      val single = cpuSpin(iters)
      val wallUs = new java.util.concurrent.atomic.AtomicLong(0L)
      val ts = (1 to math.max(1, threads)).map { _ =>
        new Thread(() => {
          val us = (cpuSpin(iters) * 1000).toLong
          wallUs.getAndUpdate(w => math.max(w, us))
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val multi = wallUs.get() / 1000.0
      // measured healthy idle on this host (r21, 32 threads): single
      // ≈ 23 ms, multi ≈ 48 ms — the bands sit ~2.5× above, the same
      // wait-for-a-better-window posture as the 400 MB/s disk band
      val singleRef = sys.env.getOrElse("SPARK_GRAFT_CPU_REF_MS", "60").toDouble
      val multiRef = sys.env.getOrElse("SPARK_GRAFT_CPU_MULTI_REF_MS",
        (singleRef * 2).toString).toDouble
      val contended = single > singleRef || multi > multiRef
      s""","cpu_probe_ms":{"single":${r4(single)},"multi":${r4(multi)},""" +
        s""""threads":$threads,"iters":$iters},"cpu_contended":$contended"""
    } catch { case scala.util.control.NonFatal(_) => "" }
  }

  private def binarizeB(ds: org.apache.spark.sql.Dataset[graft.tensor.Block]) =
    graft.tensor.Filters.mapBlocks(ds)(b => b.data.map(v => if (v > 200.0) 1.0 else 0.0))

  /** Locale-stable fixed-precision double for the compact driver line —
    * 4 decimals (0.1 ms) is below every band this artifact carries. */
  private def r4(v: Double): String =
    "%.4f".formatLocal(java.util.Locale.ROOT, v)

  /** Print the artifact: the FULL JSON line first, then a COMPACT
    * driver-contract line LAST. The driver keeps only the final ~2000
    * chars of stdout and sbt appends its own `[success]` line after us,
    * so rounds 1–17 all shipped `parsed: null`: the full line is ~3 KB
    * and its head fell out of the capture window. The compact line
    * (headline keys at 4 decimals, failures, group totals) stays well
    * under the window, so the driver's tail scan finds one complete
    * parseable JSON line; the full line stays first for the committed
    * artifacts (take stdout line 1). */
  private def emit(full: String, compact: String): Unit = {
    println(full)
    println(compact)
  }

  /** Shared body of the big-grid tensor smoke (standalone
    * SPARK_GRAFT_TENSOR_SMOKE mode AND the merged one-pass artifact):
    * gaussian5 + label_stats + affine_u8 ONCE over a side² grid in
    * 256×512 blocks, streaming from the Range-leaf synth. Returns the
    * per-kernel JSON object, the section wall, the side, and the block
    * count; restores the caller's shuffle width. */
  private def tensorSmoke(spark: SparkSession, cpus: String,
      failed: scala.collection.mutable.Set[String]): (String, Double, Int, Long) = {
    import graft.tensor._
    val side = sys.env.getOrElse("SPARK_GRAFT_TENSOR_SMOKE", "8192") match {
      case "" | "1" => 8192
      case v => v.toInt
    }
    val chunk = Seq(256, 512)
    val nBlocks = ((side + 255) / 256).toLong * ((side + 511) / 512)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    try {
      def smokeOnce(key: String)(f: => Unit): Double = {
        val t0 = System.nanoTime()
        try f catch {
          case e: Throwable =>
            failed += key
            System.err.println(s"[bench] $key FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val base = synthBlocks(spark, side, side, chunk, "smoke")
      val t0 = System.nanoTime()
      val m = Array(Array(1.0, 0.0), Array(0.0, 1.0))
      val off = Array(0.5, -0.25)
      val res = Seq(
        "gaussian5" -> smokeOnce("tensor_smoke_gaussian5")(
          forceB(Filters.gaussianFilter(base, Seq(0.5, 0.5)))),
        "label_stats" -> smokeOnce("tensor_smoke_label_stats") {
          val bin = binarizeB(base)
          val (lab, _) = Measure.label(bin, 2)
          Measure.area(bin, lab, 2).count(); ()
        },
        "affine_u8" -> smokeOnce("tensor_smoke_affine_u8")(
          forceTB(Interp.affineTransformTyped(
            TBlock.fromBlocks(base, DType.U8), 2, m, off,
            order = 1, outDtype = DType.F32))))
      val wall = (System.nanoTime() - t0) / 1e9
      val qj = res.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      (qj, wall, side, nBlocks)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Scale-aware shuffle width: target ~10 MiB of input per shuffle
    // partition (floor division), clamped to [1, cpus]. At sf0.1 (17 MiB
    // total) that is 1 — a 32-wide shuffle of kilobyte partitions is pure
    // task-dispatch latency; at sf1 (173 MiB) it is 17, in the band that
    // measured fastest (16-way beat both 6-way and 32-way: under 6 the
    // big joins starve, past ~16 dispatch overtakes the extra
    // parallelism); at 100 TB the same rule caps at the cluster's cores
    // and AQE coalescing takes over.
    val inputBytes = {
      val d = new java.io.File(sfDir)
      if (d.isDirectory) d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
      else 0L
    }
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(1L, math.min(cpus.toLong, inputBytes / (10L << 20))).toString)
    // Scale profile (SPARK_GRAFT_SCALE_PROFILE=1, default auto: input
    // > 4 GiB). The default session profile below is tuned for the
    // MB-scale latency benches: AQE off (per-stage replanning is pure
    // latency when shuffles carry kilobytes) and shuffle/spill codecs
    // off (codec + checksum time exceeds the bytes moved in-process).
    // The r15 sf100 run (17 GiB) demonstrated exactly where that
    // profile stops being right: 4-wide shuffles sort-spilled the big
    // joins/aggs UNCOMPRESSED to one local disk, and the spill-bound
    // keys went 20-100x instead of 10x (BASELINE.md sf100 section).
    // At real scale the cluster posture is the opposite — compression
    // on, AQE on (coalesce + skew split), wide initial shuffles — so
    // that is what the scale profile sets, and the rest of the library
    // never assumes either profile.
    val scaleProfile = sys.env.get("SPARK_GRAFT_SCALE_PROFILE") match {
      case Some(v) => v == "1"
      case None => inputBytes > (4L << 30)
    }
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.locality.wait", "0")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.warehouse.dir", {
        // per-run temp warehouse (concurrent Bench/Verify must not race
        // on one path), deleted by the exit hook — at sf100 a stranded
        // warehouse holds a full bucketed fact copy (tens of GB) on the
        // box where ~60 GB free disk is the binding constraint
        val wh = java.nio.file.Files.createTempDirectory("graft_wh")
        queries.TmpCleanup.register(wh)
        wh.toString
      })
      .config("spark.ui.enabled", "false")
    val builder =
      if (scaleProfile) builder0
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          (cpus.toInt * 4).toString)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        // 64 MiB splits (default 128 MiB): a single-file table scans
        // ceil(bytes/split) ways — at sf100 the 2.5 GB documents file
        // gave 10 scan tasks on 32 cores, so every text-decode-bound
        // stage idled 2/3 of the machine (the streaming trigger-sizing
        // lesson, r17, applied to batch scans). On a real lake row
        // groups + many files make this moot; on the one-file-per-table
        // fixture the split size IS scan parallelism.
        .config("spark.sql.files.maxPartitionBytes", (64L << 20).toString)
        .config("spark.shuffle.compress", "true")
        .config("spark.shuffle.spill.compress", "true")
        // zstd over the lz4 default at scale: row-oriented shuffle of a
        // wide fact runs 2-4x the parquet bytes, and on a single spill
        // disk the transient footprint is the binding constraint (the
        // sf100 bucketed-layout build overflowed 60 GB of free disk on
        // lz4; zstd halves it). Same posture as a production cluster,
        // where shuffle bytes cross a network.
        .config("spark.io.compression.codec", "zstd")
      else builder0
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
    val spark = builder.getOrCreate()
    System.err.println(s"[bench] profile=${if (scaleProfile) "scale" else "latency"} " +
      s"cpus=$cpus shuffle=$shuffleParts inputMB=${inputBytes >> 20}")
    spark.sparkContext.setLogLevel("WARN")
    // One-command layout lifecycle (r18 verdict #7): SPARK_GRAFT_ENSURE=1
    // builds/validates every durable fingerprinted layout and exits —
    // the deterministic path from a fresh environment to the benched
    // state. Runs before the cache warm (layout builds stream the
    // source; MEMORY_ONLY-caching 17 GiB first would wedge sf100).
    if (sys.env.get("SPARK_GRAFT_ENSURE").contains("1")) {
      val rows = graft.sources.Lake.ensureAll(spark, sfDir)
      rows.foreach { case (tag, reused, b) =>
        System.err.println(f"[bench] layout $tag reused=$reused build_s=$b%.2f") }
      val j = rows.map { case (tag, reused, b) =>
        s""""$tag":{"reused":$reused,"build_s":$b}""" }.mkString("{", ",", "}")
      println(s"""{"metric":"ensure_layouts","value":${rows.map(_._3).sum},""" +
        s""""unit":"sec","layouts":$j,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    // Materialize each table once before timing (BASELINE.md measures warm
    // medians and allows cached reads): CacheManager then substitutes the
    // InMemoryRelation into every matching query plan fragment. lineitem
    // is cacheable again now that inMemoryColumnarStorage.compressed=false
    // (the round-1 4x TIMESTAMP_NTZ decode penalty was the codec).
    val cacheList = sys.env.getOrElse("SPARK_GRAFT_CACHE",
      "region,nation,customer,supplier,part,orders,lineitem,events,documents,embeddings")
      .split(",").filter(_.nonEmpty).toSeq
    // Cached-table scan width: floor of min(cpus, 8) (the sf0.1-tuned
    // value), growing with the same ~10 MiB/partition rule once the data
    // is big enough to feed more scan tasks.
    Tables.benchParts = sys.env.getOrElse("SPARK_GRAFT_TABLE_PARTS",
      math.max(math.min(cpus.toInt, 8),
        math.min(cpus.toLong, inputBytes / (10L << 20)).toInt).toString).toInt
    for (name <- cacheList) {
      val df = Tables.t(spark, sfDir, name)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }
    val qs = SparkEntry.queries
    // DuckDB baseline = median of warm runs; mirror it. Three warm-ups get
    // the generated code through C2 (one is not enough — run 2 is still
    // ~30% slower than steady state on the join-heavy queries).
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "3").toInt
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]

    // Scheduler-floor probe: the cheapest possible gated query shape (one
    // cached 5-row scan → agg → exchange → final agg → count). The part of
    // each query's latency that is Spark job/stage dispatch, not operator
    // work — DuckDB-in-process has no equivalent cost.
    def floorOnce(): Double = {
      val t0 = System.nanoTime()
      Tables.t(spark, sfDir, "region").groupBy("r_regionkey").count().count()
      (System.nanoTime() - t0) / 1e9
    }

    // In the uncached one-pass, several keys localCheckpoint
    // intermediates (collapse reps, candidate sets, distinct-text
    // aggregates); left persisted they accumulate across the 37-key
    // pass and the tail keys run against a storage-full heap (r15
    // sf100: 91 GB peak, tail keys 5-10x their standalone walls).
    // Keys are independent, so drop everything persisted after each —
    // only when NO tables were cached (normal mode must keep them).
    val dropPersistedPerKey =
      sys.env.contains("SPARK_GRAFT_ONEPASS") && cacheList.isEmpty
    def queryOnce(name: String): Double = {
      val fn = qs(name)
      val t0 = System.nanoTime()
      // a crashing query must not silently bench as ~0s: record it and
      // surface the failure in the JSON line, not just stderr
      try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // INVARIANT (r16, per ADVICE): this drops EVERY persistent RDD,
      // including eagerly localCheckpointed ones whose lineage is gone —
      // safe only because each queryOnce rebuilds its plan from scratch.
      // A future key that reuses a checkpointed frame across the
      // median-3 repeats would die with missing checkpoint blocks; such
      // a key must opt out of dropPersistedPerKey or re-checkpoint.
      if (dropPersistedPerKey)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t
    }
    def queryMedian3(name: String): Double =
      Seq(queryOnce(name), queryOnce(name), queryOnce(name)).sorted.apply(1)

    // One-pass scale smoke (SURVEY §6, round 10 — the sf10 artifact):
    // each headline key runs ONCE, reporting wall clock and peak driver
    // heap. No warm-ups or medians — at GB scale a single pass is signal
    // and 6 extra runs per key would stretch the smoke to tens of
    // minutes. Run with SPARK_GRAFT_CACHE= (empty) so peak heap tracks
    // driver-side METADATA (needs tables, relabel maps, plan state), not
    // cached table storage: the row exists to catch metadata that grows
    // with the data instead of the grid — flat heap sf1 → sf10 is the
    // pass condition.
    if (sys.env.contains("SPARK_GRAFT_ONEPASS")) {
      import scala.jdk.CollectionConverters._
      val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
      // Reset per-pool peaks so the figure measures the PASS, not JVM
      // startup / table-cache warm-up highs. Summing per-pool peaks that
      // occur at different instants is still an upper bound on the true
      // simultaneous peak — fine for the flat-sf1-vs-sf10 regression flag.
      heapPools.foreach(_.resetPeakUsage())
      // SPARK_GRAFT_KEYS=a,b,c restricts every one-pass group to the
      // named keys — the re-measurement tool for forensics on a single
      // slow key without paying the full multi-hundred-second pass.
      val onlyKeys = sys.env.get("SPARK_GRAFT_KEYS")
        .map(_.split(",").filter(_.nonEmpty).toSet)
      // fail loudly on a typo'd key (r16, per ADVICE): a filter that
      // matches nothing would still write a plausible-looking JSON line
      // with every group empty — the opposite of what a forensics
      // re-measurement is for
      onlyKeys.foreach { ks =>
        val known = qs.keySet + "semantic_dedup_scaledK" + "stream_throughput" +
          "stream_stateful_throughput" + "sigindex_probe" + "pqindex_probe"
        val unknown = ks.filterNot(known.contains)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_KEYS names no known query: ${unknown.mkString(",")}")
      }
      def keep(n: String): Boolean = onlyKeys.forall(_.contains(n))
      // Pre-pass disk probe (r19 verdict #2, widened r20): every
      // one-pass artifact carries its own disk MB/s so a regression
      // band can tell a slow disk window from a slow plan without
      // out-of-band forensics — cold-groups passes via drop-caches
      // read, warm passes via O_DIRECT (cache-neutral).
      val preProbe = diskProbeAuto(sfDir)
      if (preProbe._1 >= 0)
        System.err.println(f"[bench] disk probe (pre, ${preProbe._3}): " +
          f"${preProbe._1}%.1f MB/s over ${preProbe._2 / 1e6}%.0f MB")
      // cache drop BEFORE t0 (r17, per ADVICE): the other groups take
      // their timestamps after their coldGroup call — billing the sync +
      // drop into the headline wall made it incomparable under the flag
      coldGroup("headline")
      val t0 = System.nanoTime()
      val res = headline.filter(qs.contains).filter(keep)
        .map(n => n -> queryOnce(n))
      val wall = (System.nanoTime() - t0) / 1e9
      // LLM group in the same pass (round 11 — the sf10 dedup artifact:
      // banding miscalibration shows up as superlinear candidate growth,
      // and this is the scale where it would): separate wall so the
      // 16-key row stays comparable to prior rounds.
      var llmOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_LLM", "1") == "1") {
        coldGroup("llm")
        val lt0 = System.nanoTime()
        val lres = llmHeadline.filter(qs.contains).filter(keep)
          .map(n => n -> queryOnce(n))
        // Scaled-K SemDeDup (r12, judge item #2): the production K rule
        // (kmeansK ≈ ⌈N/5000⌉) instead of the gated key's oracle K=10 —
        // at sf10 this is the row proving the cluster-bounded quadratic
        // stays in band when K tracks the corpus.
        val runScaledK = keep("semantic_dedup_scaledK")
        val embRows = if (!runScaledK) 0L
          else try Tables.t(spark, sfDir, "embeddings").count()
          catch { case _: Throwable => 0L }
        val scaledK = queries.Similarity.kmeansK(embRows)
        val skt0 = System.nanoTime()
        if (runScaledK)
          try queries.Similarity.semanticDedupWith(
              Tables.t(spark, sfDir, "embeddings"), scaledK).count()
          catch {
            case e: Throwable =>
              failed += "semantic_dedup_scaledK"
              System.err.println(s"[bench] semantic_dedup_scaledK FAILED: ${e.getMessage}")
          }
        val skT = (System.nanoTime() - skt0) / 1e9
        val lwall = (System.nanoTime() - lt0) / 1e9
        val lj = (if (runScaledK) lres :+ ("semantic_dedup_scaledK" -> skT) else lres)
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        // scaled_k only when the scaledK leg actually ran (r16, per
        // ADVICE): when SPARK_GRAFT_KEYS filters it out, kmeansK(0)
        // would be a misleading value in a forensics artifact
        val skJson = if (runScaledK) s""","scaled_k":$scaledK""" else ""
        llmOnepass = s""","llm":$lj,"llm_wall":$lwall$skJson"""
      }
      // Forensics affordance: a SPARK_GRAFT_KEYS entry naming a gated
      // query OUTSIDE every one-pass group (e.g. minhash_signatures —
      // the signature-scan HALF of minhash_near_dup) runs here with the
      // same protocol and no bespoke main. Its own group + JSON field
      // (r18, per ADVICE): folding extras into the llm group billed
      // leg-owned keys (q3_bucketed, time_slice_day, ...) named for a
      // re-measurement into that artifact's llm wall/llm_total — a leg
      // key named here still runs in its leg too, but its extra-group
      // timing is now reported under "extra", never in a group total.
      var extraOnepass = ""
      val extraKeys = onlyKeys.map(_.filter(k => qs.contains(k) &&
        !headline.contains(k) && !llmHeadline.contains(k) &&
        !curationHeadline.contains(k)).toSeq.sorted).getOrElse(Seq.empty)
      if (extraKeys.nonEmpty) {
        coldGroup("extra")
        val et0 = System.nanoTime()
        val eres = extraKeys.map(n => n -> queryOnce(n))
        val ewall = (System.nanoTime() - et0) / 1e9
        val ej = eres.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        extraOnepass = s""","extra":$ej,"extra_wall":$ewall"""
      }
      // Curation group in the same pass (r12 session 3): the quality/
      // scoring scans are linear by construction, but exact_substring_
      // dedup's shared-gram set grows with distinct content — sf10 is
      // where a broadcast-budget miscalibration would show.
      var curOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_CURATION", "1") == "1") {
        coldGroup("curation")
        val ct0 = System.nanoTime()
        val cres = curationHeadline.filter(qs.contains).filter(keep)
          .map(n => n -> queryOnce(n))
        val cwall = (System.nanoTime() - ct0) / 1e9
        val cj = cres.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString("{", ",", "}")
        curOnepass = s""","curation":$cj,"curation_wall":$cwall"""
      }
      // Streaming throughput probe (r17, verdict #8): the quality-gate
      // — deliberately ORDERED BEFORE the bucketed/partitioned layout
      // legs: their builds rewrite a full fact table and the probe's
      // micro-batch reads would otherwise measure that writeback
      // aftermath (in-pass 38 s vs 15 s standalone, r17), the same
      // context tax window_rank pays after q3's spill.
      // stream over the scale corpus — 8 parquet shards drained one per
      // micro-batch through the Gopher filter with the RocksDB state
      // store (the cluster provider). Reports rows/s, batch count, and
      // final state size; flags if the streamed pass costs more than
      // 5× its batch twin + 1.5 s per micro-batch (state-store or
      // micro-batch regression, not operator work or trigger floor).
      var streamingOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_STREAMING", "1") == "1" &&
          keep("stream_throughput")) {
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val prevProv = spark.conf.getOption(provKey)
        val prevShufflePart = spark.conf.get("spark.sql.shuffle.partitions")
        coldGroup("streaming")
        try {
          val docs = Tables.t(spark, sfDir, "documents")
          val nDocs = docs.count()
          val base = new java.io.File(sys.props("java.io.tmpdir"),
            s"graft_bench_stream_${graft.sources.Lake.dirSuffix(sfDir)}" +
              s"_${spark.sparkContext.applicationId}").toString
          val (inDir, ckpt) = (base + "_in", base + "_ckpt")
          queries.TmpCleanup.register(inDir)
          queries.TmpCleanup.register(ckpt)
          // 32 shard files, 8 per trigger: each micro-batch's scan holds
          // ≥ cpus splits, so the batch feeds the whole machine — with
          // 1 big file per trigger a 12-split scan left 2/3 of the cores
          // idle every batch (sf100, r17: 106k rows/s vs the batch
          // plan's full-width scan). The production rule: size the
          // TRIGGER to the cluster, not to latency alone.
          docs.repartition(32).write.mode("overwrite").parquet(inDir)
          // batch twin FIRST, over the SAME shard files the stream will
          // read (r17 sf100: a twin on the original table measured warm
          // page cache against the stream's cold shard copy and flagged
          // a phantom 66× — same bytes, same layout, same cache state,
          // so the band isolates micro-batch overhead, the thing it
          // exists to judge)
          // the twin's failure PROPAGATES to the probe's outer catch
          // (r17, per ADVICE): a swallowed twin yielded batchS ≈ 0,
          // which flagged the stream unconditionally and shipped a bogus
          // batch_twin_s with no sign the twin never ran
          val bt0 = System.nanoTime()
          queries.TextOps.gopherOver(queries.TextOps.augmentSymbols(
            spark.read.parquet(inDir))).count()
          val batchS = (System.nanoTime() - bt0) / 1e9
          spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
            ".state.RocksDBStateStoreProvider")
          // State width is sized to the STATE (20 groups), not the batch:
          // a stateful query spins one RocksDB instance per shuffle
          // partition, and each instance pays snapshot+commit EVERY
          // micro-batch — at the scale profile's 32-wide shuffle that
          // fixed cost measured ~10 s/batch for a 20-row aggregate
          // (sf10, r17), 32 RocksDB maintenance cycles to move 20 rows.
          // Production rule at 100 TB: state partitions track state
          // cardinality; scan/map parallelism still follows file splits.
          spark.conf.set("spark.sql.shuffle.partitions",
            math.min(8, cpus.toInt).toString)
          val stream = spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "8").parquet(inDir)
          val agg = queries.TextOps.gopherOver(
            queries.TextOps.augmentSymbols(stream))
          val t0 = System.nanoTime()
          val q = agg.writeStream.format("memory")
            .queryName("graft_bench_stream_gate")
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
          // restore full width BEFORE the batch twin measurement
          spark.conf.set("spark.sql.shuffle.partitions", prevShufflePart)
          val wall = (System.nanoTime() - t0) / 1e9
          val progress = q.recentProgress.toSeq
          val batches = progress.count(_.numInputRows > 0)
          val stateOps = progress.reverse
            .find(_.stateOperators.nonEmpty).toSeq.flatMap(_.stateOperators.toSeq)
          val stateRows = stateOps.map(_.numRowsTotal).sum
          val stateMb = stateOps.map(_.memoryUsedBytes).sum / 1e6
          // flag band: 5× the batch twin's operator work plus ~1.5 s per
          // micro-batch (job dispatch + state-store commit are a FIXED
          // per-trigger cost — measured ~0.9 s/batch at toy sf, where
          // they dominate; at sf10 the operator term carries the band)
          // plus a 3 s one-time STARTUP allowance (offset-log/checkpoint
          // init + file-index build — paid once per query regardless of
          // data). Without it the band flipped on ±1 s of disk noise at
          // sf100: three same-HEAD runs measured 633/576/542 k rows/s —
          // all ~5× the r17 fix's target throughput — and the two
          // slower ones flagged (r18). The flag exists for the
          // 106 k-rows/s class of micro-batch/state regressions, which
          // a 3 s constant cannot mask.
          val ok = wall <= batchS * 5 + 1.5 * math.max(batches, 1) + 3.0
          if (!ok) {
            failed += "stream_throughput"
            System.err.println(f"[bench] stream_throughput FLAG: streamed " +
              f"$wall%.1f s vs batch twin $batchS%.1f s — past the " +
              "5x + 1.5s/batch band")
          }
          streamingOnepass = s""","streaming":{"rows":$nDocs,""" +
            s""""batches":$batches,"wall_s":$wall,""" +
            s""""rows_per_s":${nDocs / math.max(wall, 1e-9)},""" +
            s""""batch_twin_s":$batchS,"state_rows":$stateRows,""" +
            s""""state_mem_mb":$stateMb,"overhead_ok":$ok}"""
        } catch {
          case e: Throwable =>
            failed += "stream_throughput"
            System.err.println(s"[bench] onepass streaming FAILED: ${e.getMessage}")
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prevShufflePart)
          prevProv match {
            case Some(v) => spark.conf.set(provKey, v)
            case None => spark.conf.unset(provKey)
          }
        }
      }
      // Stateful streaming throughput (r18, verdict #5): the stateless
      // probe above judges micro-batch overhead; this leg drives the
      // LIVE-CRAWL posture — the near-dedup flatMapGroupsWithState with
      // RocksDB state — over the same 32-shard corpus and reports
      // rows/s plus the state the stream actually carried. State WIDTH
      // tracks STATE CARDINALITY (the r17 rule): the near-dedup state is
      // one entry per (band, distinct-signature) bucket — thousands of
      // groups, not 20 — so the stateful shuffle keeps the cluster width
      // instead of the 8-way squeeze the tiny-state gate needs.
      var statefulOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_STREAMING_STATEFUL",
            sys.env.getOrElse("SPARK_GRAFT_STREAMING", "1")) == "1" &&
          keep("stream_stateful_throughput")) {
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val prevProv = spark.conf.getOption(provKey)
        val prevShufflePart = spark.conf.get("spark.sql.shuffle.partitions")
        coldGroup("streaming_stateful")
        try {
          val docs = Tables.t(spark, sfDir, "documents")
            .select("doc_id", "source", "text")
          val nDocs = docs.count()
          val base = new java.io.File(sys.props("java.io.tmpdir"),
            s"graft_bench_sstream_${graft.sources.Lake.dirSuffix(sfDir)}" +
              s"_${spark.sparkContext.applicationId}").toString
          val (inDir, ckpt) = (base + "_in", base + "_ckpt")
          queries.TmpCleanup.register(inDir)
          queries.TmpCleanup.register(ckpt)
          // distributed shard write (the verdict-path writeDocShards is a
          // driver collect — test plumbing, not a scale fixture)
          docs.repartition(32).write.mode("overwrite").json(inDir)
          spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
            ".state.RocksDBStateStoreProvider")
          val width = sys.env.getOrElse("SPARK_GRAFT_STATE_WIDTH",
            cpus).toInt
          spark.conf.set("spark.sql.shuffle.partitions", width.toString)
          val verdicts = graft.streaming.StreamOps.nearDedupVerdictStream(
            spark, inDir, filesPerTrigger = 8, maxSigsPerBucket = 1 << 14,
            ttlMs = 0L)
          // Progress accounting via a listener, not q.recentProgress:
          // Spark retains only numRecentProgressUpdates (default 100)
          // entries, so a >100-micro-batch run would undercount ingested
          // rows and falsely flag the leg (r19 ADVICE). The listener
          // sees EVERY progress event regardless of retention.
          val ingestedAcc = new java.util.concurrent.atomic.AtomicLong(0L)
          val batchesAcc = new java.util.concurrent.atomic.AtomicLong(0L)
          @volatile var qid: java.util.UUID = null
          val listener = new org.apache.spark.sql.streaming
              .StreamingQueryListener {
            override def onQueryStarted(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryStartedEvent): Unit = ()
            override def onQueryProgress(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryProgressEvent): Unit =
              if (qid != null && e.progress.id == qid) {
                ingestedAcc.addAndGet(e.progress.numInputRows)
                if (e.progress.numInputRows > 0) batchesAcc.incrementAndGet()
              }
            override def onQueryTerminated(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(listener)
          val t0 = System.nanoTime()
          var stateQ: org.apache.spark.sql.streaming.StreamingQuery = null
          val wall = try {
            val q0 = verdicts.writeStream.format("noop")
              .option("checkpointLocation", ckpt)
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            qid = q0.id
            try q0.awaitTermination() finally q0.stop()
            stateQ = q0
            (System.nanoTime() - t0) / 1e9
          } finally {
            // listener events are async — wait for the counter to reach
            // the expectation (or stabilize) before reading it
            val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
            var last = -1L
            var stableSince = System.nanoTime()
            while (ingestedAcc.get() < nDocs && System.nanoTime() < deadline &&
                System.nanoTime() - stableSince < 2L * 1000 * 1000 * 1000) {
              if (ingestedAcc.get() != last) {
                last = ingestedAcc.get(); stableSince = System.nanoTime()
              }
              Thread.sleep(50)
            }
            spark.streams.removeListener(listener)
          }
          val batches = batchesAcc.get()
          // throughput numerator = rows the stream ACTUALLY ingested
          // (listener-summed per-batch numInputRows), not the source
          // count — a glob/hidden-file mismatch dropping a shard would
          // otherwise silently overstate rows/s (r18 ADVICE). nDocs
          // stays as the expectation; a shortfall is a flagged leg.
          val ingested = ingestedAcc.get()
          if (ingested != nDocs) {
            failed += "stream_stateful_throughput"
            System.err.println(s"[bench] stateful stream FLAG: ingested " +
              s"$ingested rows but source has $nDocs")
          }
          // the LAST progress entry is always within retention — state
          // totals read fine from recentProgress
          val stateOps = stateQ.recentProgress.toSeq.reverse
            .find(_.stateOperators.nonEmpty).toSeq.flatMap(_.stateOperators.toSeq)
          val stateRows = stateOps.map(_.numRowsTotal).sum
          val stateMb = stateOps.map(_.memoryUsedBytes).sum / 1e6
          statefulOnepass = s""","streaming_stateful":{"rows":$ingested,""" +
            s""""rows_expected":$nDocs,""" +
            s""""batches":$batches,"wall_s":$wall,""" +
            s""""rows_per_s":${ingested / math.max(wall, 1e-9)},""" +
            s""""state_rows":$stateRows,"state_mem_mb":$stateMb,""" +
            s""""state_width":$width}"""
        } catch {
          case e: Throwable =>
            failed += "stream_stateful_throughput"
            System.err.println(
              s"[bench] onepass stateful streaming FAILED: ${e.getMessage}")
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prevShufflePart)
          prevProv match {
            case Some(v) => spark.conf.set(provKey, v)
            case None => spark.conf.unset(provKey)
          }
        }
      }
      // Bucketed-lake leg in the one-pass artifact (r16, verdict #2):
      // at sf10/sf100 this is where q3's shuffle-spill wall actually
      // hurts, so the layout demonstration belongs in the same artifact
      // — build cost reported separately from the probe, never hidden.
      var bucketedOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_BUCKETED", "1") == "1" &&
          keep("q3_bucketed")) {
        coldGroup("bucketed")
        try {
          // the layout is durable across runs (r18, verdict #3 — same
          // contract as the partitioned leg): a reuse run registers the
          // external tables at build_s ≈ 0 with reused=true, and its
          // probe is the honest layout number
          val reused = queries.Relational.bucketedLayoutExists(sfDir)
          val b0 = System.nanoTime()
          queries.Relational.bucketedFacts(spark, sfDir)
          val buildS = (System.nanoTime() - b0) / 1e9
          val qT = queryOnce("q3_bucketed")
          bucketedOnepass =
            s""","bucketed":{"build_s":$buildS,"reused":$reused,"q3_bucketed_s":$qT}"""
        } catch {
          case e: Throwable =>
            failed += "q3_bucketed"
            System.err.println(s"[bench] onepass bucketed FAILED: ${e.getMessage}")
        }
      }
      // Time-partitioned lake leg (r17, verdict #1): the month layout's
      // build cost and the two pruned-scan twins, reported next to the
      // flat keys in the same artifact — the time-axis analog of the
      // bucketed leg above.
      var partitionedOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_PARTITIONED", "1") == "1" &&
          keep("date_trunc_agg_partitioned")) {
        coldGroup("partitioned")
        try {
          // the layout is durable across runs (content-fingerprinted):
          // a reuse run reports build_s ≈ 0 with reused=true, and its
          // probe walls are the honest layout numbers — a same-JVM
          // build-then-probe measures the build's page-cache eviction
          // instead (r17 sf100: twin probes read COLD at ~flat-key walls
          // right after the 1172 s build)
          val reused = queries.Relational.monthLayoutExists(sfDir)
          val b0 = System.nanoTime()
          queries.Relational.monthLineitem(spark, sfDir)
          val buildS = (System.nanoTime() - b0) / 1e9
          val dT = queryOnce("date_trunc_agg_partitioned")
          val qT = queryOnce("q1_partitioned")
          val sT = queryOnce("time_slice_quarter")
          val dayT = queryOnce("time_slice_day")
          // the events day layout rides the same leg: build cost
          // reported, then the day-sliced sessionization probe
          val eReused = queries.Relational.dayEventsLayoutExists(sfDir)
          val e0 = System.nanoTime()
          queries.Relational.dayEvents(spark, sfDir)
          val eBuildS = (System.nanoTime() - e0) / 1e9
          val sgT = queryOnce("session_gap_day")
          partitionedOnepass = s""","partitioned":{"build_s":$buildS,""" +
            s""""reused":$reused,""" +
            s""""date_trunc_agg_partitioned_s":$dT,"q1_partitioned_s":$qT,""" +
            s""""time_slice_quarter_s":$sT,"time_slice_day_s":$dayT,""" +
            s""""events_build_s":$eBuildS,"events_reused":$eReused,""" +
            s""""session_gap_day_s":$sgT}"""
        } catch {
          case e: Throwable =>
            failed += "date_trunc_agg_partitioned"
            System.err.println(s"[bench] onepass partitioned FAILED: ${e.getMessage}")
        }
      }
      // Persisted-SigIndex probe leg (r19, verdict #6): the production
      // batch-arrival shape next to minhash_near_dup's full-corpus
      // number. The index over the accumulated corpus (doc_id below the
      // 90th-percentile cut) is DURABLE — same fingerprinted-layout
      // contract as the bucketed/partitioned legs, so a warm run skips
      // the corpus signature pass entirely (build_s ≈ 0, reused: true) —
      // and the timed probe computes the 10% batch's signatures, reads
      // the index pruned to the batch's own (band, part) partitions
      // (pruned_scan_ok pins the literal PartitionFilters at scale),
      // and runs the collide verdict. Corpus TEXT is never read.
      var sigIndexOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_SIGINDEX", "1") == "1" &&
          keep("sigindex_probe")) {
        coldGroup("sigindex")
        try {
          import graft.queries.TextOps
          import graft.sources.SigIndex
          import org.apache.spark.sql.functions.col
          val docs = Tables.t(spark, sfDir, "documents")
          val (root, cut) = SigIndex.benchRoot(spark, sfDir)
          val (reused, buildS) = SigIndex.ensureBenchIndex(spark, sfDir)
          val pt0 = System.nanoTime()
          // batch signatures once (localCheckpoint: banded keys + the
          // verdict probe both consume them; recomputing the minhash
          // fold per consumer would double the timed work)
          val batchSigs = TextOps.nearDupSigs(docs.filter(col("doc_id") >= cut))
            .localCheckpoint(true)
          val batchBanded = TextOps.nearDupBand(batchSigs)
          val keys = SigIndex.probeKeys(batchBanded)
          val idx = SigIndex.prunedRead(spark, root.toString, keys)
            .withColumnRenamed("sig", "idx_sig")
          val nCollided = TextOps.nearDupCollidedIds(
            batchSigs.select("doc_id", "sig"), idx).count()
          val probeS = (System.nanoTime() - pt0) / 1e9
          val nBatch = batchSigs.count()
          val prunedOk = "PartitionFilters: \\[[^\\]]*band".r
            .findFirstIn(idx.queryExecution.executedPlan.toString).isDefined
          if (!prunedOk) {
            failed += "sigindex_probe"
            System.err.println(
              "[bench] sigindex probe FLAG: partition pruning not in scan")
          }
          // Band-sparse small-batch probe (r19 verdict #4): the 10%
          // batch above bands into every (band, part) partition on the
          // synthetic corpus (512/512 — the pruning mechanism is pinned
          // but inert), so this twin probes what pruning is FOR: a
          // micro-batch of 16 arriving docs whose ≤128 banded keys list
          // a fraction of the 512 partitions. Reported against an
          // UNPRUNED twin of the same verdict (full index scan, no IN
          // filter) — listed-vs-total partitions plus both walls, and a
          // flag if the two verdicts ever disagree (pruning must never
          // change the answer).
          val smallDocs = docs
            .filter(col("doc_id") >= cut && col("doc_id") < cut + 16)
          val st0 = System.nanoTime()
          val smallSigs = TextOps.nearDupSigs(smallDocs).localCheckpoint(true)
          val smallBanded = TextOps.nearDupBand(smallSigs)
          val sKeys = SigIndex.probeKeys(smallBanded)
          val sIdx = SigIndex.prunedRead(spark, root.toString, sKeys)
            .withColumnRenamed("sig", "idx_sig")
          val sCollided = TextOps.nearDupCollidedIds(
            smallSigs.select("doc_id", "sig"), sIdx).count()
          val sPrunedS = (System.nanoTime() - st0) / 1e9
          val su0 = System.nanoTime()
          val uIdx = SigIndex.read(spark, root.toString)
            .withColumnRenamed("sig", "idx_sig")
          val uCollided = TextOps.nearDupCollidedIds(
            smallSigs.select("doc_id", "sig"), uIdx).count()
          val sUnprunedS = (System.nanoTime() - su0) / 1e9
          if (sCollided != uCollided) {
            failed += "sigindex_probe"
            System.err.println(s"[bench] sigindex small-batch FLAG: pruned " +
              s"verdict $sCollided != unpruned $uCollided")
          }
          sigIndexOnepass = s""","sigindex":{"build_s":$buildS,""" +
            s""""reused":$reused,"probe_s":$probeS,"batch_docs":$nBatch,""" +
            s""""n_collided":$nCollided,"probe_partitions":${keys.length},""" +
            s""""pruned_scan_ok":$prunedOk,"small_batch":{"batch_docs":16,""" +
            s""""probe_partitions":${sKeys.length},"total_partitions":512,""" +
            s""""pruned_probe_s":$sPrunedS,"unpruned_probe_s":$sUnprunedS,""" +
            s""""n_collided":$sCollided,"verdict_equal":${sCollided == uCollided}}}"""
        } catch {
          case e: Throwable =>
            failed += "sigindex_probe"
            System.err.println(s"[bench] onepass sigindex FAILED: ${e.getMessage}")
        }
      }
      // Stored-index IVF-PQ leg (r19): the ANN serving-path number at
      // scale — the durable index (codes 4 B/vector + cell id) is built
      // once per corpus fingerprint; the timed probe reads the index
      // relations, ADCs the probed cells' packed codes, and fetches
      // only the 200 shortlisted float payloads (pushed vec_id IN).
      // codes_mb is the measured at-rest index size — the BASELINE.md
      // memory-table claim as an artifact row.
      var pqIndexOnepass = ""
      if (sys.env.getOrElse("SPARK_GRAFT_PQINDEX", "1") == "1" &&
          keep("pqindex_probe")) {
        coldGroup("pqindex")
        try {
          import graft.queries.Similarity
          val reused = Similarity.pqIndexExists(sfDir)
          val bt0 = System.nanoTime()
          val root = Similarity.ensurePqIndex(spark, sfDir)
          val buildS = (System.nanoTime() - bt0) / 1e9
          def dirMb(d: java.io.File): Double =
            Option(d.listFiles()).getOrElse(Array.empty)
              .map(f => if (f.isFile) f.length else 0L).sum / 1e6
          val codesMb = dirMb(new java.io.File(root, "codes"))
          val pt0 = System.nanoTime()
          val top = qs("ivf_pq_probe")(spark, sfDir).collect()
          val probeS = (System.nanoTime() - pt0) / 1e9
          if (top.length != 10) {
            failed += "pqindex_probe"
            System.err.println(s"[bench] pqindex probe FLAG: ${top.length} rows")
          }
          // Incremental-append datapoint (r19 verdict #6): the marginal
          // cost of adding the newest 10% of vectors to the FROZEN
          // index — encode + cell-assign + parquet write of only the
          // new codes (zero corpus re-reads, zero index rewrites).
          // Writes land in a throwaway dir so the durable index stays
          // exactly its fingerprinted build.
          val maxId = Tables.t(spark, sfDir, "embeddings")
            .agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
          val aCut = maxId - maxId / 10
          val newVecs = Similarity.normedForTest(spark, sfDir)
            .filter(org.apache.spark.sql.functions.col("vec_id") >= aCut)
          val aDir = new java.io.File(sys.props("java.io.tmpdir"),
            s"graft_bench_pqappend_${spark.sparkContext.applicationId}")
          queries.TmpCleanup.register(aDir.toString)
          val at0 = System.nanoTime()
          Similarity.appendPqCodes(spark, root, newVecs, aDir.toString)
          val appendS = (System.nanoTime() - at0) / 1e9
          val nAppended = spark.read.parquet(aDir.toString).count()
          pqIndexOnepass = s""","pqindex":{"build_s":$buildS,""" +
            s""""reused":$reused,"probe_s":$probeS,"codes_mb":$codesMb,""" +
            s""""append_s":$appendS,"append_rows":$nAppended}"""
        } catch {
          case e: Throwable =>
            failed += "pqindex_probe"
            System.err.println(s"[bench] onepass pqindex FAILED: ${e.getMessage}")
        }
      }
      val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
      // Tensor smoke in the SAME artifact pass (r12, judge item #6 — one
      // JSON instead of two driver invocations): peaks are re-reset so
      // the tensor figure keeps its own-section semantics, comparable to
      // the standalone-mode artifacts of earlier rounds.
      var tensorOnepass = ""
      if (sys.env.contains("SPARK_GRAFT_TENSOR_SMOKE")) {
        heapPools.foreach(_.resetPeakUsage())
        val (tj, twall, side, nBlocks) = tensorSmoke(spark, cpus, failed)
        val tPeakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
        tensorOnepass = s""","tensor_smoke":$tj,"tensor_smoke_wall":$twall,""" +
          s""""tensor_side":$side,"tensor_blocks":$nBlocks,"tensor_peak_heap_mb":$tPeakMb"""
      }
      val qj = res.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val cqj = res.map { case (k, v) => "\"" + k + "\":" + r4(v) }
        .mkString("{", ",", "}")
      // Post-pass probe + contended flag: the pass is only
      // self-adjudicating if the disk was healthy BOTH ends (r19 watched
      // a window collapse mid-pass). The 400 MB/s band is the SKILL
      // protocol's wait-for-a-better-window threshold; a sub-256 MB
      // probe file (toy sf) can't saturate a real disk so it never
      // raises the flag.
      val postProbe = diskProbeAuto(sfDir)
      if (postProbe._1 >= 0)
        System.err.println(f"[bench] disk probe (post, ${postProbe._3}): " +
          f"${postProbe._1}%.1f MB/s")
      val diskJson = diskJsonFor((preProbe._1, preProbe._2),
        (postProbe._1, postProbe._2), preProbe._3) + cpuProbeJson(cpus.toInt)
      emit(
        s"""{"metric":"onepass","value":$wall,"unit":"sec","queries":$qj,""" +
          s""""failed":$fj$llmOnepass$extraOnepass$curOnepass$bucketedOnepass$partitionedOnepass$sigIndexOnepass$pqIndexOnepass$streamingOnepass$statefulOnepass$tensorOnepass$diskJson,"peak_heap_mb":$peakMb,"sf":"$sfDir"}""",
        s"""{"metric":"onepass","value":${r4(wall)},"unit":"sec","queries":$cqj,""" +
          s""""failed":$fj$diskJson,"peak_heap_mb":$peakMb,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    // Big-grid tensor one-pass smoke (round 11 — the tensor twin of the
    // sf10 relational row): SPARK_GRAFT_TENSOR_SMOKE=<side> runs
    // gaussian5 + label_stats + affine_u8 ONCE over a side² grid in
    // 256×512 blocks (8192² default → 512 blocks, 64× the bench
    // synthetic) and reports wall + peak heap. Nothing is persisted —
    // every kernel streams from the Range-leaf synth — so peak heap
    // tracks per-kernel operator state (halo slabs, CC edge tables,
    // gather needs rows), the metadata classes that must grow with the
    // BLOCK, not the grid. Flat heap 1024² → 8192² is the pass bar.
    if (sys.env.contains("SPARK_GRAFT_TENSOR_SMOKE")) {
      import scala.jdk.CollectionConverters._
      val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
      heapPools.foreach(_.resetPeakUsage())
      val (qj, wall, side, nBlocks) = tensorSmoke(spark, cpus, failed)
      val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)
      val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      println(s"""{"metric":"tensor_onepass","value":$wall,"unit":"sec","queries":$qj,""" +
        s""""failed":$fj,"peak_heap_mb":$peakMb,"side":$side,"blocks":$nBlocks}""")
      spark.stop()
      return
    }

    /** One full measurement pass. Floor probes are INTERLEAVED between
      * query groups (before, every 4 queries, after) so a load spike that
      * inflates the queries inflates the floor samples too — the round-7
      * artifact (queries timed under contention, floor timed after it had
      * passed) recorded a 35× phantom regression precisely because the
      * floor ran once, at the end. */
    def runPass(): (Seq[(String, Double)], Seq[Double]) = {
      val floors = scala.collection.mutable.ArrayBuffer(floorOnce())
      val res = headline.filter(qs.contains).zipWithIndex.map { case (name, i) =>
        (1 to warmups).foreach(_ => queryOnce(name))
        val t = queryMedian3(name)
        if ((i + 1) % 4 == 0) floors += floorOnce()
        name -> t
      }
      floors += floorOnce()
      (res, floors.toSeq)
    }

    /** Per-query spike guard: the floor guard catches SUSTAINED
      * contention, not a transient spike that poisons one query's three
      * timed runs while the interleaved floor stays clean (observed: one
      * 4.7 s q3 median against its 0.5–0.9 s band). A query whose median
      * exceeds 5× the pass's own per-query median gets ONE fresh
      * median-of-3, and the fresh median is kept UNCONDITIONALLY — a
      * min(old, new) would be a one-sided filter that can only lower the
      * reported total, a bias the DuckDB baseline protocol (one warm-up,
      * median of 3, no re-probe) does not share. A genuine regression
      * reproduces in the re-run and is reported at its re-run value. */
    def reprobeSpikes(results: Seq[(String, Double)]): Seq[(String, Double)] = {
      val passMed = median(results.map(_._2))
      results.map { case (name, t) =>
        if (t > 5 * math.max(passMed, 0.05)) {
          val again = queryMedian3(name)
          System.err.println(f"[bench] $name spike $t%.3f s -> re-measured $again%.3f s (kept)")
          name -> again
        } else name -> t
      }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }

    // Contention guard: a healthy idle-machine floor at local[32] has been
    // 0.05–0.15 s/query across rounds 2–7. If the interleaved floor median
    // exceeds 3× the reference the pass was contended — retry (something
    // else is hammering the box; a retry is cheaper than shipping a
    // garbage artifact) and flag the line if it never clears.
    val floorRef = sys.env.getOrElse("SPARK_GRAFT_FLOOR_REF", "0.15").toDouble
    // Floor-IQR trip (r14 judge): the r14 pass sailed under the median
    // test while a fresh-boot environment inflated the floor UNIFORMLY
    // 1.6× with 5.6× the spread (iqr 0.0585 vs a healthy 0.0105) — a
    // noisy pass must flag ITSELF even when its median stays in band.
    // Healthy idle iqr has been ~0.01 s; 0.04 s of spread across ~9
    // interleaved probes means the machine changed speed mid-pass.
    val iqrRef = sys.env.getOrElse("SPARK_GRAFT_FLOOR_IQR_REF", "0.04").toDouble
    def iqr(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.length * 3) / 4) - s(s.length / 4)
    }
    val maxAttempts = sys.env.getOrElse("SPARK_GRAFT_BENCH_ATTEMPTS", "3").toInt
    // Disk self-adjudication for the default (driver-run) mode too
    // (r20): the CPU floor probe can't see a collapsed disk window, and
    // warm walls still pay it through shuffle/spill writes. O_DIRECT —
    // cache-neutral, so the warm pass stays warm.
    val preDiskProbe = diskProbeDirect(sfDir)
    if (preDiskProbe._1 >= 0)
      System.err.println(f"[bench] disk probe (pre, o_direct): " +
        f"${preDiskProbe._1}%.1f MB/s over ${preDiskProbe._2 / 1e6}%.0f MB")
    (1 to warmups).foreach(_ => floorOnce())
    var attempt = 0
    var best: (Seq[(String, Double)], Seq[Double]) = null
    var bestFloor = Double.MaxValue
    var contended = true
    while (attempt < maxAttempts && contended) {
      attempt += 1
      val pass = runPass()
      val fm = median(pass._2)
      if (fm < bestFloor) { bestFloor = fm; best = pass }
      val fIqr = iqr(best._2)
      contended = bestFloor > 3 * floorRef || fIqr > iqrRef
      if (contended)
        System.err.println(f"[bench] attempt $attempt contended: floor " +
          f"median $fm%.3f s (limit ${3 * floorRef}%.2f) / best-pass iqr " +
          f"$fIqr%.3f s (limit $iqrRef%.2f)")
    }
    val (rawResults, floorSamples) = best
    val results = reprobeSpikes(rawResults)

    // -------------------------------- group-level contention guard
    // r15 verdict #8: the headline artifact recorded machine noise in
    // the curation group that its own quiet re-pass disproved — the
    // main pass's floor verdict cannot cover groups that run minutes
    // later. Each group now interleaves its OWN floor probes and
    // retries on a contended floor (lowest-floor pass kept), so the
    // shipped group total IS the quiet number — one unambiguous
    // continuity figure per round. Contention test is the floor MEDIAN
    // only, unlike the main pass: group floor probes sit right after
    // multi-second GC-churning keys (minhash, substring dedup), so a
    // single probe spiking on a collection pause is the NORMAL quiet
    // state here and the IQR would flag forever; the median is robust
    // to those spikes and still moves when the machine is genuinely
    // busy. The IQR ships in the JSON for forensics, unjudged.
    def guardedGroup(tag: String, names: Seq[String])
        : (Seq[(String, Double)], Double, Double, Boolean, Int) = {
      def pass(): (Seq[(String, Double)], Seq[Double]) = {
        val floors = scala.collection.mutable.ArrayBuffer(floorOnce())
        val res = names.zipWithIndex.map { case (name, i) =>
          (1 to warmups).foreach(_ => queryOnce(name))
          val t = queryMedian3(name)
          if ((i + 1) % 4 == 0) floors += floorOnce()
          name -> t
        }
        floors += floorOnce()
        (res, floors.toSeq)
      }
      var a = 0
      var best: (Seq[(String, Double)], Seq[Double]) = null
      var bestFloor = Double.MaxValue
      var cont = true
      while (a < maxAttempts && cont) {
        a += 1
        val p = pass()
        val fm = median(p._2)
        if (fm < bestFloor) { bestFloor = fm; best = p }
        cont = bestFloor > 3 * floorRef
        if (cont) System.err.println(
          f"[bench] $tag attempt $a contended: floor median $fm%.3f s " +
            f"(limit ${3 * floorRef}%.2f)")
      }
      (reprobeSpikes(best._1), bestFloor, iqr(best._2), cont, a)
    }

    // ------------------------------------------------ LLM-pipeline group
    // Same per-query protocol as the main pass (warm-ups then median of
    // 3, spike re-probe), separate total so the 16-key relational
    // continuity artifact is untouched.
    val llmOn = sys.env.getOrElse("SPARK_GRAFT_LLM", "1") == "1"
    var llmJson = ""
    var compactTotals = ""
    if (llmOn) {
      val (llm, lFloor, lIqr, lCont, lAtt) =
        guardedGroup("llm", llmHeadline.filter(qs.contains))
      val lj = llm.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      llmJson = s""","llm":$lj,"llm_total":${llm.map(_._2).sum},""" +
        s""""llm_floor":$lFloor,"llm_floor_iqr":$lIqr,""" +
        s""""llm_contended":$lCont,"llm_attempts":$lAtt"""
      compactTotals += s""","llm_total":${r4(llm.map(_._2).sum)}"""
    }

    // ------------------------------------------------ curation group
    // The round-12 data-curation additions (exact-substring dedup, URL
    // canonicalization, Gopher/C4 quality rules, unigram-LM scoring) —
    // same protocol as the LLM group, own total so neither band moves.
    val curOn = sys.env.getOrElse("SPARK_GRAFT_CURATION", "1") == "1"
    var curJson = ""
    if (curOn) {
      val (cur, cFloor, cIqr, cCont, cAtt) =
        guardedGroup("curation", curationHeadline.filter(qs.contains))
      val cj = cur.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      curJson = s""","curation":$cj,"curation_total":${cur.map(_._2).sum},""" +
        s""""curation_floor":$cFloor,"curation_floor_iqr":$cIqr,""" +
        s""""curation_contended":$cCont,"curation_attempts":$cAtt"""
      compactTotals += s""","curation_total":${r4(cur.map(_._2).sum)}"""
    }

    // --------------------------- heavy hitters at HIGH cardinality
    // r12 verdict #5: the MG candidates+verify claim ("the naive plan's
    // full-cardinality term shuffle is what dies at web scale") was
    // structural only — the sf fixture has a ~50-term vocabulary, where
    // naive GROUP BY trivially wins. This leg generates a deterministic
    // zipf-ish stream INSIDE the query (spark.range + md5; no fixture
    // file, identical generator SQL in the DuckDB twin): 50% of rows
    // spread over 16 hot tokens (~3.1% each, all above the 2%
    // threshold), 50% unique md5 tokens — at the default 32M rows that
    // is ~16M distinct terms. Both plans must return the SAME 16 terms;
    // the artifact rows are the medians of 3 after 1 warm-up.
    var hhJson = ""
    if (sys.env.get("SPARK_GRAFT_HH").map(_ == "1").getOrElse(curOn)) {
      try {
        graft.functions.GraftExtensions.install(spark)
        // default 32M: at 8M the naive GROUP BY's wall is bistable
        // (0.5–3 s depending on shuffle-buffer warmth — the whole
        // shuffle intermittently stays in memory), while at 32M the
        // bounded-vs-full-shuffle gap is robust in any JVM state
        val n = sys.env.getOrElse("SPARK_GRAFT_HH_ROWS", "32000000").toLong
        def tokens = spark.range(n).selectExpr(
          // (id div 4) % 16 is uniform over the id % 4 < 2 subset (the
          // naive id % 16 only reaches 8 residues there)
          "IF(id % 4 < 2, concat('hot_', (id div 4) % 16), " +
            "concat('r_', md5(cast(id AS string)))) AS tok")
        def mgDf = {
          val tok = tokens
          val mg = tok.agg(org.apache.spark.sql.functions.expr("misra_gries(tok)").as("s"))
            .select(org.apache.spark.sql.functions.col("s.n").as("n"),
              org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.col("s.terms")).as("tok"))
          tok.join(org.apache.spark.sql.functions.broadcast(mg), "tok")
            .groupBy("tok", "n")
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("cnt"))
            .filter(org.apache.spark.sql.functions.col("cnt").cast("double")
              >= org.apache.spark.sql.functions.col("n").cast("double") * 0.02)
            .select("tok")
        }
        def naiveDf = tokens.groupBy("tok")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("cnt"))
          .filter(org.apache.spark.sql.functions.col("cnt") >= n * 0.02)
          .select("tok")
        // equal answers, once (untimed)
        val mgTerms = mgDf.collect().map(_.getString(0)).toSet
        val nvTerms = naiveDf.collect().map(_.getString(0)).toSet
        require(mgTerms == nvTerms && mgTerms.size == 16,
          s"hh_highcard answers diverged: mg=${mgTerms.size} naive=${nvTerms.size}")
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def med3(f: => Unit): Double =
          Seq(time(f), time(f), time(f)).sorted.apply(1)
        // SHUFFLE BYTES are the deterministic figure (wall-clock can't
        // carry the claim on one box: with local in-memory shuffle and
        // compression off, the naive plan's wall is bistable — the OS
        // absorbs the exchange — while at 100 TB the exchange crosses a
        // NETWORK; bytes moved per plan is exactly what changes there).
        // Collected via a task-metrics listener; one settle pause after
        // each run because the listener bus is async.
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
        spark.sparkContext.addSparkListener(listener)
        def shuffled(f: => Unit): Long = {
          drainListenerBus(spark); shuffleBytes.set(0)
          f
          drainListenerBus(spark); shuffleBytes.get()
        }
        try {
          val mgS = med3 { mgDf.count(): Unit }
          val nvS = med3 { naiveDf.count(): Unit }
          val mgBytes = shuffled { mgDf.count(): Unit }
          val nvBytes = shuffled { naiveDf.count(): Unit }
          // record-and-flag, not require (r14 ADVICE): the listener is
          // async best-effort, so a metrics hiccup must not abort the
          // whole bench artifact — the claim lands in the JSON where
          // the judge reads it either way
          val mgBounded = mgBytes * 10 < nvBytes
          if (!mgBounded) System.err.println(
            s"[bench] hh_highcard FLAG: MG shuffled $mgBytes B — not an " +
              s"order of magnitude under the naive plan's $nvBytes B")
          // generation-only baseline: both plans embed the md5 stream
          // generator, so the OPERATOR cost is (plan − gen). MG reads the
          // stream twice (summary + verify), naive once — so MG's operator
          // cost ≈ mg_s − 2·gen_s, naive's ≈ naive_s − gen_s.
          val genS = med3 {
            tokens.agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.col("tok"))).collect(): Unit
          }
          hhJson = s""","hh_highcard":{"rows":$n,"distinct_approx":${n / 2},""" +
            s""""gen_s":$genS,"mg_s":$mgS,"naive_groupby_s":$nvS,""" +
            s""""mg_shuffle_mb":${mgBytes / 1e6},""" +
            s""""naive_shuffle_mb":${nvBytes / 1e6},""" +
            s""""mg_bounded_buffer_ok":$mgBounded}"""
        } finally spark.sparkContext.removeSparkListener(listener)
      } catch {
        case e: Throwable =>
          failed += "hh_highcard"
          System.err.println(s"[bench] hh_highcard FAILED: ${e.getMessage}")
      }
    }

    // --------------------------- bucketed-lake layout (q3 twin)
    // r15 verdict #2: q3's sf100 wall was pure shuffle-spill disk I/O on
    // an optimal plan — the fix is STORAGE, not the plan. This leg pays
    // the one-time bucketed+sorted layout (build_s, reported, never
    // hidden), then times q3 over the bucketed facts next to the flat
    // run, and records SHUFFLE BYTES for both (same listener rationale
    // as hh_highcard: on one box the OS absorbs the exchange, at 100 TB
    // it crosses a network — bytes moved is the portable figure).
    var bucketedJson = ""
    if (sys.env.getOrElse("SPARK_GRAFT_BUCKETED", "1") == "1") {
      try {
        val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def med3(f: => Unit): Double =
          Seq(timed(f), timed(f), timed(f)).sorted.apply(1)
        def shuffled(f: => Unit): Long = {
          drainListenerBus(spark); shuffleBytes.set(0)
          f
          drainListenerBus(spark); shuffleBytes.get()
        }
        // durable layout (r18, verdict #3): build_s is the real write on
        // the first-ever run and DDL replay (≈0) with reused=true after
        val reused = queries.Relational.bucketedLayoutExists(sfDir)
        val buildS = timed { queries.Relational.bucketedFacts(spark, sfDir); () }
        val bDf = qs("q3_bucketed")(spark, sfDir)
        val fDf = qs("q3_top_orders")(spark, sfDir)
        bDf.count(); fDf.count() // warm
        spark.sparkContext.addSparkListener(listener)
        try {
          val bS = med3 { bDf.count(): Unit }
          val fS = med3 { fDf.count(): Unit }
          val bBytes = shuffled { bDf.count(): Unit }
          val fBytes = shuffled { fDf.count(): Unit }
          // the structural claim, checked on the executed plan (bytes can
          // both read 0 at toy sf where every join broadcasts): a
          // bucket-aligned q3 needs NO hash exchange anywhere — the join
          // rides the bucketing and the orderkey group-by reuses it
          val noExchange = !bDf.queryExecution.executedPlan.toString
            .contains("Exchange hashpartitioning")
          if (!noExchange) System.err.println(
            "[bench] q3_bucketed FLAG: hash exchange survived the bucketed layout")
          bucketedJson = s""","bucketed":{"build_s":$buildS,"reused":$reused,""" +
            s""""q3_bucketed_s":$bS,""" +
            s""""q3_flat_s":$fS,"q3_bucketed_shuffle_mb":${bBytes / 1e6},""" +
            s""""q3_flat_shuffle_mb":${fBytes / 1e6},"no_exchange_ok":$noExchange}"""
        } finally spark.sparkContext.removeSparkListener(listener)
      } catch {
        case e: Throwable =>
          failed += "q3_bucketed_bench"
          System.err.println(s"[bench] bucketed leg FAILED: ${e.getMessage}")
      }
    }

    // ------------------- time-partitioned lake layout (the date twins)
    // r17 (verdict #1): the time-axis analog of the bucketed leg — the
    // month layout serves date_trunc's grouping key from directory
    // metadata (no timestamp decode) and turns q1's shipdate cut into
    // directory pruning. Build cost reported next to the probes, never
    // hidden; the flat date_trunc_agg/q1 walls for comparison are in the
    // headline group of the same artifact.
    var partitionedJson = ""
    if (sys.env.getOrElse("SPARK_GRAFT_PARTITIONED", "1") == "1") {
      try {
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def med3(f: => Unit): Double =
          Seq(timed(f), timed(f), timed(f)).sorted.apply(1)
        val reused = queries.Relational.monthLayoutExists(sfDir)
        val b0 = System.nanoTime()
        queries.Relational.monthLineitem(spark, sfDir)
        val buildS = (System.nanoTime() - b0) / 1e9
        val dDf = qs("date_trunc_agg_partitioned")(spark, sfDir)
        val qDf = qs("q1_partitioned")(spark, sfDir)
        val sDf = qs("time_slice_quarter")(spark, sfDir)
        val dayDf = qs("time_slice_day")(spark, sfDir)
        dDf.count(); qDf.count(); sDf.count(); dayDf.count() // warm
        val dS = med3 { dDf.count(): Unit }
        val q1S = med3 { qDf.count(): Unit }
        val sS = med3 { sDf.count(): Unit }
        val dayS = med3 { dayDf.count(): Unit }
        // the events day layout rides the same leg
        val eReused = queries.Relational.dayEventsLayoutExists(sfDir)
        val e0 = System.nanoTime()
        queries.Relational.dayEvents(spark, sfDir)
        val eBuildS = (System.nanoTime() - e0) / 1e9
        val sgDf = qs("session_gap_day")(spark, sfDir)
        sgDf.count() // warm
        val sgS = med3 { sgDf.count(): Unit }
        // structural claim on the executed plan: the partitioned
        // date_trunc scan must never decode the timestamp column
        val noTs = !dDf.queryExecution.executedPlan.toString.contains("l_shipdate")
        if (!noTs) System.err.println(
          "[bench] date_trunc_agg_partitioned FLAG: timestamp column survived in the scan")
        partitionedJson = s""","partitioned":{"build_s":$buildS,""" +
          s""""reused":$reused,""" +
          s""""date_trunc_agg_partitioned_s":$dS,"q1_partitioned_s":$q1S,""" +
          s""""time_slice_quarter_s":$sS,"time_slice_day_s":$dayS,""" +
          s""""events_build_s":$eBuildS,"events_reused":$eReused,""" +
          s""""session_gap_day_s":$sgS,"no_ts_scan_ok":$noTs}"""
      } catch {
        case e: Throwable =>
          failed += "partitioned_bench"
          System.err.println(s"[bench] partitioned leg FAILED: ${e.getMessage}")
      }
    }

    // ------------------------------------------------------ ANN group
    // Wall + recall for the approximate top-k paths. Recall = overlap of
    // the ANN top-10 vec_ids with the exact brute-force top-10 (the
    // cosine_topk headline result) — 10 driver rows per key, no corpus
    // collect. Same timing protocol as the main pass; rides its
    // contention verdict like the LLM group.
    val annOn = sys.env.getOrElse("SPARK_GRAFT_ANN", "1") == "1"
    var annJson = ""
    if (annOn && annHeadline.forall { case (n, _) => qs.contains(n) }) {
      // recall collects are guarded like every other measurement path: a
      // crashing ANN query must cost its own row (null recall + a failed
      // entry), never the whole artifact
      def topIds(name: String): Option[Set[Long]] =
        try Some(qs(name)(spark, sfDir)
          .select("vec_id").collect().map(_.getLong(0)).toSet)
        catch {
          case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      val truth = topIds("cosine_topk")
      val ann = annHeadline.map { case (name, _) =>
        (1 to warmups).foreach(_ => queryOnce(name))
        name -> queryMedian3(name)
      }
      // NO spike re-probe for this group: its walls are bimodal BY DESIGN
      // (ivf's centroid pass is ~15× hyperplane's probe), so the
      // group-median 5× test would fire on every healthy run and the
      // detector would carry no signal. Per-key regressions are guarded
      // by the BASELINE.md ann band (and the recall floors) instead.
      val recalls: Seq[(String, Option[Double])] =
        annHeadline.map { case (name, floor) =>
          val r = for (t <- truth; ids <- topIds(name))
            yield ids.intersect(t).size / math.max(t.size, 1).toDouble
          r.filter(_ < floor).foreach { rv =>
            failed += s"${name}_recall"
            System.err.println(f"[bench] $name recall $rv%.2f below floor $floor%.2f")
          }
          name -> r
        }
      val aj = ann.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val rj = recalls.map { case (k, v) =>
        "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
      }.mkString("{", ",", "}")
      annJson = s""","ann":$aj,"ann_total":${ann.map(_._2).sum},"ann_recall":$rj"""
      compactTotals += s""","ann_total":${r4(ann.map(_._2).sum)}"""
    }

    // ---------------------------------------------- ingest (stage zero)
    // WET decode throughput: the sf documents re-encoded ONCE (untimed
    // fixture prep) as Common-Crawl-layout per-record-gzip shards, then
    // the streamed WARC parse decodes every record — count + length-sum
    // forces the full payload path. No DuckDB twin; the artifact rows
    // are wall + raw MB + MB/s, band-tracked in BASELINE.md. At 100 TB
    // this is the job's first stage, so its per-core throughput bounds
    // the whole pipeline's admission rate.
    val ingestOn = sys.env.getOrElse("SPARK_GRAFT_INGEST", "1") == "1"
    var ingestJson = ""
    if (ingestOn) {
      try {
        val docs = Tables.t(spark, sfDir, "documents")
          .select("doc_id", "source", "text")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        val nShards = 8
        // One (write shards → median-of-3 timed decode) pass per record
        // shape. Two shapes: the sf documents as-is (~300 B records —
        // stresses per-member gzip setup, the Common Crawl worst case),
        // and the same text tiled to ~5 KB records (the REAL crawl's
        // median conversion-record size) — the honest parser-throughput
        // number, separating per-member overhead from parse cost.
        def wetLeg(tag: String, recs: Int => IndexedSeq[(String, String)]): String = {
          val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
            s"graft_bench_wet_${tag}_${math.abs(sfDir.hashCode)}")
          if (java.nio.file.Files.exists(dir)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.delete)
          }
          java.nio.file.Files.createDirectories(dir)
          var rawBytes = 0L
          for (sh <- 0 until nShards) {
            val rs = recs(sh)
            rawBytes += rs.map(_._2.getBytes("UTF-8").length.toLong).sum
            java.nio.file.Files.write(dir.resolve(f"wet_$sh%02d.warc.wet.gz"),
              graft.sources.WarcSource.encodeWetGz(rs))
          }
          def once(): Double = {
            val t0 = System.nanoTime()
            graft.sources.WarcSource.readWet(spark, s"$dir/*.warc.wet.gz")
              .filter(org.apache.spark.sql.functions.col("rec_type") === "conversion")
              .agg(org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)),
                org.apache.spark.sql.functions.sum(
                  org.apache.spark.sql.functions.length(
                    org.apache.spark.sql.functions.col("text"))))
              .collect()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm-up
          val med = Seq(once(), once(), once()).sorted.apply(1)
          val mb = rawBytes / 1e6
          val prefix = if (tag == "sfdocs") "wet" else s"wet_$tag"
          s""""${prefix}_decode_s":$med,"${prefix}_raw_mb":$mb,""" +
            s""""${prefix}_mb_per_s":${mb / math.max(med, 1e-9)}"""
        }
        val sfLeg = wetLeg("sfdocs", sh =>
          docs.filter(_._1 % nShards == sh).sortBy(_._1)
            .map { case (id, src, text) => (s"https://example.com/$src/$id", text) }
            .toIndexedSeq)
        val leg5k = wetLeg("5k", sh =>
          docs.filter(_._1 % nShards == sh).sortBy(_._1)
            .map { case (id, src, text) =>
              val b = new StringBuilder(5400)
              var i = 0
              while (b.length < 5000) { b.append(text).append(f"\nseg $id%d.$i%d\n"); i += 1 }
              (s"https://example.com/$src/$id", b.toString)
            }.toIndexedSeq)
        ingestJson = s""","ingest":{$sfLeg,$leg5k}"""
      } catch {
        case e: Throwable =>
          failed += "wet_ingest_bench"
          System.err.println(s"[bench] wet ingest FAILED: ${e.getMessage}")
      }
    }

    // ---------------------------------------------- tensor headline group
    // (BASELINE.md "Tensor kernels"): four kernels over a deterministic
    // 1024×1024 synthetic in 8 chunks (256×512) vs the SAME kernel over
    // the single-block layout. No DuckDB twin exists for the tensor path,
    // so the baseline is the no-halo single-block run: the multi/single
    // ratio bounds the halo-exchange + merge tax (plus the win from 8-way
    // parallelism — a ratio < 1 means the parallelism pays for the halo).
    // Timing mirrors the relational group: one warm-up, median of 3,
    // and — round 11 — the SAME floor/contention/spike machinery: floor
    // probes interleave the kernel runs (tensor_floor / tensor_contended
    // in the JSON), and a kernel whose multi/single ratio breaches the
    // BASELINE.md ≤2 band gets ONE fresh re-measurement of BOTH layouts,
    // kept unconditionally (a transient spike clears; a real regression
    // reproduces and is reported at its re-run value). The round-10
    // driver artifact recorded gaussian5 at ratio 3.35 with no way to
    // tell contention from regression — this guard is the adjudicator.
    // Shuffle width is lifted to the block count for this group — the
    // relational width (1 at sf0.1) would serialize the 8-task exchange.
    val tensorOn = sys.env.getOrElse("SPARK_GRAFT_TENSOR", "1") == "1"
    var tensorJson = ""
    if (tensorOn) {
      import graft.tensor._
      val H = 1024; val W = 1024
      def synth(chunk: Seq[Int], id: String) = synthBlocks(spark, H, W, chunk, id)
      def force(ds: org.apache.spark.sql.Dataset[Block]): Unit = forceB(ds)
      def forceT(ds: org.apache.spark.sql.Dataset[TBlock]): Unit = forceTB(ds)
      def tOnce(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def tMed(f: => Unit): Double = {
        f; Seq(tOnce(f), tOnce(f), tOnce(f)).sorted.apply(1)
      }
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(cpus.toInt, 8).toString)
      try {
        val persistLvl = org.apache.spark.storage.StorageLevel.MEMORY_ONLY
        def binarize(ds: org.apache.spark.sql.Dataset[Block]) = binarizeB(ds)
        // Both layouts' inputs stay persisted for the whole group (≈25 MiB
        // total) so a ratio-breach re-probe can re-run either side without
        // rebuilding state.
        val inputs = Seq("multi" -> Seq(256, 512), "single" -> Seq(1024, 1024))
          .map { case (vname, chunk) =>
            val base = synth(chunk, s"bench_$vname").persist(persistLvl)
            force(base)
            val u8 = TBlock.fromBlocks(base, DType.U8).persist(persistLvl)
            forceT(u8)
            val bin = binarize(base).persist(persistLvl)
            force(bin)
            vname -> ((base, u8, bin))
          }.toMap
        val m = Array(Array(1.0, 0.0), Array(0.0, 1.0))
        val off = Array(0.5, -0.25)
        val kernelNames = Seq(
          "gaussian5", "uniform3_u8", "label_stats", "affine_shift", "affine_u8")
        def runKernel(kname: String, vname: String): Unit = {
          val (base, u8, bin) = inputs(vname)
          kname match {
            // σ=0.5, truncate=4 → radius 2: the 5×5 gaussian
            case "gaussian5" =>
              force(Filters.gaussianFilter(base, Seq(0.5, 0.5)))
            case "uniform3_u8" =>
              forceT(Filters.uniformFilterTyped(u8, Seq(3, 3), DType.F32))
            case "label_stats" =>
              val (lab, _) = Measure.label(bin, 2)
              Measure.area(bin, lab, 2).count(); ()
            case "affine_shift" =>
              force(Interp.affineTransform(base, 2, m, off, order = 1))
            // typed twin: the gather join ships 1 B/px uint8 instead of
            // 8 B/px float64 — the r10 native-byte resampling path
            case "affine_u8" =>
              forceT(Interp.affineTransformTyped(u8, 2, m, off,
                order = 1, outDtype = DType.F32))
          }
        }
        // a crashing kernel must not discard the whole pass: record the
        // failure into the CALLER's sink (same contract as queryOnce) and
        // report None — a fast-failure elapsed is not kernel performance.
        // The sink is per-pass, not the global `failed`, so a transient
        // failure in a DISCARDED contended attempt doesn't permanently
        // null the kernel in the kept pass; only the kept pass's sink
        // (and the breach re-probes') merges into the artifact.
        def measure(kname: String, vname: String,
            sink: scala.collection.mutable.Set[String]): Option[Double] = {
          val key = s"tensor_${kname}_$vname"
          var ok = true
          def once(): Unit = try runKernel(kname, vname) catch {
            case e: Throwable =>
              ok = false
              System.err.println(s"[bench] $key FAILED: ${e.getMessage}")
          }
          val t = tMed(once())
          if (ok) Some(t) else { sink += key; None }
        }
        // One guarded pass over the group: floor probes bracket each
        // kernel pair so a load spike that inflates the kernels inflates
        // the floor too (same rationale as runPass); whole-group retry on
        // a contended floor, bounded by the shared attempt budget.
        def tensorPass(): (Map[String, Option[Double]], Map[String, Option[Double]],
            Seq[Double], Set[String]) = {
          val floors = scala.collection.mutable.ArrayBuffer(floorOnce())
          val passFailed = scala.collection.mutable.LinkedHashSet.empty[String]
          val multi = scala.collection.mutable.LinkedHashMap.empty[String, Option[Double]]
          val single = scala.collection.mutable.LinkedHashMap.empty[String, Option[Double]]
          for (kname <- kernelNames) {
            multi(kname) = measure(kname, "multi", passFailed)
            single(kname) = measure(kname, "single", passFailed)
            floors += floorOnce()
          }
          (scala.collection.immutable.ListMap(multi.toSeq: _*),
            scala.collection.immutable.ListMap(single.toSeq: _*), floors.toSeq,
            passFailed.toSet)
        }
        var tAttempt = 0
        var tBest: (Map[String, Option[Double]], Map[String, Option[Double]],
          Seq[Double], Set[String]) = null
        var tBestFloor = Double.MaxValue
        var tContended = true
        while (tAttempt < maxAttempts && tContended) {
          tAttempt += 1
          val pass = tensorPass()
          val fm = median(pass._3)
          if (fm < tBestFloor) { tBestFloor = fm; tBest = pass }
          tContended = tBestFloor > 3 * floorRef
          if (tContended)
            System.err.println(
              f"[bench] tensor attempt $tAttempt contended: floor median $fm%.3f s > 3×$floorRef%.2f s")
        }
        var (tMulti, tSingle, tFloors) = (tBest._1, tBest._2, tBest._3)
        failed ++= tBest._4
        // Ratio-breach re-probe: BASELINE.md's band says multi/single ≤ 2
        // for every kernel. A breach gets ONE fresh median-of-3 of BOTH
        // layouts, kept unconditionally — mirrors reprobeSpikes' contract
        // (no min(old,new) one-sided filter).
        for (kname <- kernelNames) {
          (tMulti(kname), tSingle(kname)) match {
            case (Some(mt), Some(st)) if mt > 2 * math.max(st, 1e-9) =>
              val m2 = measure(kname, "multi", failed)
              val s2 = measure(kname, "single", failed)
              System.err.println(
                f"[bench] tensor $kname ratio ${mt / st}%.2f breach -> re-measured " +
                  f"multi ${m2.getOrElse(-1.0)}%.3f s single ${s2.getOrElse(-1.0)}%.3f s (kept)")
              tMulti = tMulti.updated(kname, m2)
              tSingle = tSingle.updated(kname, s2)
            case _ =>
          }
        }
        inputs.values.foreach { case (b, u, n) =>
          b.unpersist(); u.unpersist(); n.unpersist()
        }
        def grp(m: Map[String, Option[Double]]) =
          m.map { case (k, v) => "\"" + k + "\":" + v.map(_.toString).getOrElse("null") }
            .mkString("{", ",", "}")
        val ratios: Map[String, Option[Double]] = tMulti.map { case (k, v) =>
          k -> (for (mv <- v; sv <- tSingle(k)) yield mv / math.max(sv, 1e-9))
        }
        tensorJson = s""","tensor":${grp(tMulti)}""" +
          s""","tensor_single":${grp(tSingle)}""" +
          s""","tensor_ratio":${grp(ratios)}""" +
          s""","tensor_floor":${median(tFloors)}""" +
          s""","tensor_contended":$tContended,"tensor_attempts":$tAttempt"""
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val floorMed = median(floorSamples)
    val fs = floorSamples.sorted
    val floorIqr = fs((fs.length * 3) / 4) - fs(fs.length / 4)
    val floorTotal = floorMed * results.size
    // Floor-adjusted accounting (SURVEY §6): adjusted_total = total −
    // floor_total estimates pure operator work, the quantity comparable to
    // DuckDB's in-process total at toy scale. Both numbers are emitted;
    // the raw total remains the headline "value" for continuity.
    val adjusted = math.max(0.0, total - floorTotal)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cq = results.map { case (k, v) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val postDiskProbe = diskProbeDirect(sfDir)
    if (postDiskProbe._1 >= 0)
      System.err.println(f"[bench] disk probe (post, o_direct): " +
        f"${postDiskProbe._1}%.1f MB/s")
    val diskJson = diskJsonFor(preDiskProbe, postDiskProbe, "o_direct") +
      cpuProbeJson(cpus.toInt)
    emit(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,""" +
        s""""failed":$failedJson,"floor_per_query":$floorMed,"floor_iqr":$floorIqr,""" +
        s""""floor_total":$floorTotal,"adjusted_total":$adjusted,""" +
        s""""contended":$contended,"attempts":$attempt$llmJson$curJson$hhJson$bucketedJson$partitionedJson$annJson$ingestJson$tensorJson$diskJson,"sf":"$sfDir"}""",
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$cq,""" +
        s""""failed":$failedJson,"floor_per_query":${r4(floorMed)},""" +
        s""""adjusted_total":${r4(adjusted)},""" +
        s""""contended":$contended$compactTotals$diskJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
