package graft.util

/** Per-JVM scratch space for gates that must materialize an on-disk
  * fixture (ORC copy, PNG corpus, parquet generations, JSONL dump).
  *
  * Two properties the naive `Files.createTempDirectory` per execution
  * lacks:
  *  - a FIXED path per name, so re-running the same gate in one JVM
  *    overwrites its previous fixture instead of accumulating a fresh
  *    full copy in /tmp per execution (Verify + Bench + warm-up in one
  *    process used to leave three ORC copies of the corpus behind);
  *  - a shutdown hook that removes the whole root, so nothing outlives
  *    the process at all.
  */
object Scratch {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    sys.addShutdownHook(deleteRecursively(p.toFile))
    p
  }

  /** A clean scratch directory for `name`: same JVM + same name → same
    * path, emptied on every call. */
  def dir(name: String): String = {
    val d = root.resolve(name)
    deleteRecursively(d.toFile)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Collision-free scratch-name suffix for an arbitrary string key
    * (e.g. a dataset dir). String.hashCode is 32-bit and collides in
    * practice; two colliding dirs cached in one JVM would resolve to
    * the same Scratch path, and dir() deletes the existing contents, so
    * the second dataset's write would destroy the first's asset. */
  def keyFor(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** One Hadoop `Configuration` per executor JVM — constructing one
    * parses the XML resource chain (tens of ms), which a per-partition
    * `new Configuration()` pays 32× per stage. Read-only after init, so
    * sharing across tasks is safe. */
  lazy val hadoopConf: org.apache.hadoop.conf.Configuration =
    new org.apache.hadoop.conf.Configuration()

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete()
    ()
  }
}
