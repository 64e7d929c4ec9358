package graft.util

/** Collision-safe scratch paths for write-then-read queries.
  *
  * The earlier scheme keyed scratch dirs by the digit residue of the
  * data dir (`dir.replaceAll("[^0-9.]", "")`), which collapses any two
  * dirs containing the same digits to ONE path, and two concurrent
  * harness runs over the same sf dir race overwrite-against-probe —
  * either can corrupt a hash-checked result. Paths are instead keyed
  * by a hash of the FULL dir string plus the JVM pid: stable within a
  * run (every query invocation for a given dir resolves to the same
  * path, so write→read pairs compose), distinct across dirs and across
  * concurrent processes.
  */
object Scratch {
  private lazy val pid: Long = ProcessHandle.current().pid()

  // pid-keyed scratch is unreachable by any OTHER process, so it is
  // garbage the instant this JVM exits — and without a hook it
  // accretes forever (r15 audit: 9,600 orphaned /tmp/graft_* dirs,
  // 6.6 GB, after 15 rounds of harness JVMs; on a long-lived cluster
  // node the same leak fills local disks). Best-effort delete of
  // every path this process handed out, registered once.
  private val issued = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(
    () => issued.keySet().forEach { p =>
      try org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      catch { case _: Throwable => () }
    }, "graft-scratch-gc"))

  def path(tag: String, dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    val p = s"/tmp/graft_${tag}_${h}_p$pid"
    hook
    issued.put(p, java.lang.Boolean.TRUE)
    p
  }
}
