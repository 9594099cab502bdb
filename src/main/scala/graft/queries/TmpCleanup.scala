package graft.queries

/** JVM-exit cleanup for per-run fixture directories.
  *
  * Fixture/temp paths are keyed by the Spark applicationId so concurrent
  * Bench/Verify runs over one sf dir can't delete each other's files —
  * but run-keyed dirs are never reused, so without cleanup every
  * invocation leaks a full fixture copy into java.io.tmpdir (at sf1 the
  * source-gate fixtures are hundreds of MB). A single shutdown hook
  * deletes everything registered; a crashed JVM may leak one run's dirs,
  * which bounds disk growth at one fixture set per crash rather than one
  * per run.
  */
private[graft] object TmpCleanup {
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val installHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d)
            .sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => p.toFile.delete())
        } catch { case _: Throwable => () } // best-effort; never block exit
      }
    }, "graft-tmp-cleanup"))

  def register(d: java.nio.file.Path): Unit = { installHook; dirs.add(d); () }

  /** Register a path that may not exist yet (Spark writers create it). */
  def register(path: String): Unit = register(java.nio.file.Paths.get(path))
}
