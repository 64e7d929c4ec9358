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

  def path(tag: String, dir: String): String = {
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"/tmp/graft_${tag}_${h}_p$pid"
  }
}
