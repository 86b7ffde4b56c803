package graft.streaming

/** Ephemeral micro-batch checkpoint locations for the single-node
  * harness: tmpfs (/dev/shm) when present, so per-batch state-store
  * and commit-log fsyncs are RAM-speed and run-to-run stable, else
  * java.io.tmpdir. Harness plumbing, not engine semantics — results
  * are checkpoint-location-independent (the oracle gates prove it);
  * a cluster deployment points checkpoints at durable shared storage
  * instead.
  */
object Checkpoints {
  def ephemeral(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val dir =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, prefix)
      else java.nio.file.Files.createTempDirectory(prefix)
    dir.toString
  }
}
