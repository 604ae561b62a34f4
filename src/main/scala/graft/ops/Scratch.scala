package graft.ops

/** One scratch directory per JVM for all sink/warehouse operators, deleted
  * recursively on JVM exit. Operators write FIXED subdirs in overwrite
  * mode, so repeated Verify/Bench invocations inside one JVM reuse the same
  * paths — no unbounded /tmp growth across runs (and nothing survives the
  * process).
  *
  * Contract: sink operators are invoked SERIALLY within a JVM (the driver
  * harness and the test suite both run queries one at a time). Two
  * concurrent invocations of the same sink op would overwrite each other's
  * fixed subdir mid-read; a concurrent harness would need per-invocation
  * dirs (trading back the bounded-growth property).
  */
object Scratch {
  lazy val dir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  /** Scratch subdir keyed by op prefix AND sf dir — ops whose output
    * depends on the input scale need distinct paths per sf within one JVM
    * (the test fixture and Verify can touch several scales). */
  def opDir(prefix: String, sfDir: String): String =
    s"$dir/${prefix}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"
  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(); ()
  }
}
