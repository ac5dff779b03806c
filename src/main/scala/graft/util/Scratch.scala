package graft.util

import java.nio.file.{Files, Path}

import scala.collection.mutable

/** JVM-lifetime scratch directories for operators that need a filesystem
  * target (streaming merge targets, partitioned-layout demos). Every
  * directory handed out here is deleted by a single shutdown hook, so
  * repeated gate/bench invocations cannot accumulate leaked parquet trees
  * (each stream replay previously leaked a full copy of its feed + table
  * + checkpoint per run).
  */
object Scratch {

  private val registered = mutable.ArrayBuffer.empty[Path]

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => registered.synchronized {
      registered.foreach(deleteRecursively)
    }, "graft-scratch-cleanup"))

  /** Scratch root, in preference order: `SPARK_GRAFT_SCRATCH`, then a
    * RAM-backed tmpfs (`/dev/shm`) when present, then `java.io.tmpdir`.
    * Everything handed out here is EPHEMERAL by contract (stream-replay
    * checkpoints, path-memos, staging hops), so RAM is the right default:
    * a structured-streaming micro-batch fsyncs its offset/commit/state
    * files per batch, and on a disk-backed /tmp that I/O dominates
    * fixture-scale replays. Durable checkpoints in a real deployment are
    * the caller's business — they'd live on DFS, not in Scratch.
    */
  private lazy val root: Option[Path] = {
    val explicit = sys.env.get("SPARK_GRAFT_SCRATCH").map { d =>
      val p = java.nio.file.Paths.get(d)
      Files.createDirectories(p) // an explicit override must be honored
      p
    }
    // /dev/shm only qualifies when it can actually hold replay feeds +
    // tables + checkpoints: containers often mount a 64 MB shm, where
    // every streaming query would die with ENOSPC
    val shm = Some(java.nio.file.Paths.get("/dev/shm")).filter(p =>
      Files.isDirectory(p) && Files.isWritable(p) &&
        p.toFile.getUsableSpace > 8L * 1024 * 1024 * 1024)
    explicit.orElse(shm)
  }

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): Path = {
    val p = root match {
      case Some(r) => Files.createTempDirectory(r, prefix)
      case None    => Files.createTempDirectory(prefix)
    }
    registered.synchronized { hook; registered += p }
    p
  }

  /** Number of scratch directories handed out so far this JVM. A caller
    * timing a query can diff this across the run to learn whether the
    * query populated a path-memo (first computation) — i.e. whether a
    * LATER run of the same query would read the memo instead of
    * computing, and so cannot be compared against this one.
    */
  def allocated: Int = registered.synchronized(registered.size)

  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }
  }
}
