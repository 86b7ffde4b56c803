package graft.streaming

import java.util.Comparator
import java.util.concurrent.atomic.AtomicBoolean

/** Ephemeral micro-batch checkpoint locations for the single-node
  * harness: tmpfs (/dev/shm) when present, so per-batch state-store
  * and commit-log fsyncs are RAM-speed and run-to-run stable, else
  * java.io.tmpdir. Harness plumbing, not engine semantics — results
  * are checkpoint-location-independent (the oracle gates prove it);
  * a cluster deployment points checkpoints at durable shared storage
  * instead.
  */
object Checkpoints {
  private val logged = new AtomicBoolean(false)

  def ephemeral(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val dir =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    if (logged.compareAndSet(false, true))
      System.err.println(s"graft checkpoints: ephemeral base = ${dir.getParent}")
    dir.toString
  }

  /** Run `f` with a fresh ephemeral checkpoint dir, deleting it once
    * `f` returns (i.e. after the streaming query terminated). Without
    * this every invocation leaks RAM-backed state-store/commit-log
    * files on /dev/shm — q44's store holds per-doc shingle-hash
    * arrays, so repeated runs would accumulate corpus-sized state.
    */
  def withEphemeral[T](prefix: String)(f: String => T): T = {
    val dir = ephemeral(prefix)
    try f(dir)
    finally deleteRecursively(dir)
  }

  def deleteRecursively(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => f.toFile.delete())
    }
  }
}
