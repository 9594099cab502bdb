package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Per-query structural profiler (measurement tool, guide §1): runs named
  * query keys and reports wall seconds plus the DISPATCH/SHUFFLE shape —
  * Spark job count, stage count, task count, shuffle bytes written — via a
  * task/job listener. At toy scale wall ≈ jobs × dispatch floor, so job
  * count is the actionable number; at 100 TB the same counts are corpus
  * passes and exchanges. Mirrors Bench's session profile (latency mode)
  * so the shapes match what the driver's bench executes. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val inputBytes = {
      val d = new java.io.File(sfDir)
      if (d.isDirectory) d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
      else 0L
    }
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(1L, math.min(cpus.toLong, inputBytes / (10L << 20))).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.locality.wait", "0")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val shuffleB = new AtomicLong
    val jobDetail = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobDetail) jobStartNs.put(e.jobId, System.nanoTime())
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (jobDetail) {
          val t0 = jobStartNs.remove(e.jobId)
          if (t0 != 0L) System.err.println(
            f"  JOB ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) shuffleB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(500) }
    // warm the tables like Bench does so scans hit the cache substitution
    val cacheList = sys.env.getOrElse("SPARK_GRAFT_CACHE",
      "region,nation,customer,supplier,part,orders,lineitem,events,documents,embeddings")
      .split(",").filter(_.nonEmpty).toSeq
    Tables.benchParts = sys.env.getOrElse("SPARK_GRAFT_TABLE_PARTS",
      math.max(math.min(cpus.toInt, 8),
        math.min(cpus.toLong, inputBytes / (10L << 20)).toInt).toString).toInt
    for (name <- cacheList) {
      val df = Tables.t(spark, sfDir, name)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }
    val qs = SparkEntry.queries
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "2").toInt
    for (name <- args) {
      val fn = qs(name)
      (1 to warmups).foreach(_ => fn(spark, sfDir).count()) // C2 + layouts
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val w0 = once() // counters bracket ONE run (the second timed);
      drain()         // walls are the median of 3 (bench protocol)
      jobs.set(0); stages.set(0); tasks.set(0); shuffleB.set(0)
      val w1 = once()
      drain()
      val (j, st, tk, sb) = (jobs.get(), stages.get(), tasks.get(), shuffleB.get())
      val w = Seq(w0, w1, once()).sorted.apply(1)
      println(f"PROFILE $name%-28s wall=$w%7.3f s jobs=$j%3d " +
        f"stages=$st%3d tasks=$tk%5d shuffleMB=${sb / 1e6}%9.3f")
    }
    spark.stop()
  }
}
