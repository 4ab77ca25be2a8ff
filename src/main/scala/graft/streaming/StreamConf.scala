package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Session isolation + shuffle-partition pinning for the drain-once
  * STATEFUL streaming runners.
  *
  * A stateful streaming operator keeps one state store per shuffle
  * partition, and per-micro-batch commit cost is per-STORE, not
  * per-row (each store writes/renames its delta file on every batch).
  * The batch session's 32 shuffle partitions are right for batch
  * shuffles, but a drain-once stream over one input file carries tiny
  * per-partition state — 32 stores cost ~4× the fixed commit overhead
  * of 8 for zero parallelism benefit (measured on q_stream_join in an
  * earlier round: 14.2 → 2.8 s). At real scale state VOLUME grows and
  * more partitions become right — which is why this is a per-query
  * knob, not a session default.
  *
  * Isolation model: each runner builds its sources AND starts its
  * query on a private `newSession()` that starts from DEFAULT runtime
  * conf (`cloneSession()` is `private[sql]`), inheriting only an
  * explicit ALLOWLIST of parent settings ([[InheritedConf]]: session
  * timezone, ANSI mode, the state-store opt-in), then the pins applied
  * on top. The pinned conf lives only in the private session and the
  * shared session conf is NEVER mutated — concurrent batch queries and
  * concurrent stream starts cannot observe or clobber each other's
  * settings, and a thread that TRANSIENTLY mutates shared-session conf
  * cannot leak a setting outside the allowlist into a stream starting
  * in that window (a full `getAll` snapshot could).
  * Because memory-sink tables are registered in the session that
  * starts the stream (the clone), [[publish]] drains the query and
  * re-registers the result under the same name in the parent session;
  * a drained memory-sink table is driver-resident by construction, so
  * the copy moves no data an executor ever held.
  */
object StreamConf {

  /** Opt-in state-store backend selector, read by every stateful
    * drain-once runner: set to `"rocksdb"` to run the query's state in
    * RocksDB (`RocksDBStateStoreProvider`) instead of the default
    * executor-heap HDFS-backed store. Heap state must FIT in executor
    * memory — the 100 TB posture for large keyed state (exact global
    * dedup, wide CDC snapshots, big session maps) is RocksDB: state
    * lives off-heap/on-disk with incremental checkpointing, so state
    * size is bounded by local disk, not heap. The gate queries run
    * identically under either backend (asserted by spec); the default
    * stays heap because at drain-once fixture scale RocksDB's
    * per-store open/compaction overhead only costs time. */
  val StateStoreKey = "spark.graft.streaming.stateStore"

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Parent runtime conf the isolated session intentionally inherits:
    * result-shaping SEMANTICS a caller legitimately sets session-wide
    * and expects inside the stream too (timezone, ANSI, case
    * sensitivity, legacy datetime parsing/rebase policies, the
    * state-store opt-in). Everything else starts from defaults — in
    * particular transient mutations of shared-session conf by
    * concurrent threads cannot leak in. Extend here, never with a
    * getAll snapshot. */
  val InheritedConf: Seq[String] = Seq(
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.caseSensitive",
    "spark.sql.legacy.timeParserPolicy",
    "spark.sql.parquet.datetimeRebaseModeInRead",
    "spark.sql.parquet.datetimeRebaseModeInWrite",
    "spark.sql.parquet.int96RebaseModeInRead",
    "spark.sql.parquet.int96RebaseModeInWrite",
    StateStoreKey)

  /** An isolated session with the stream's conf pinned. `newSession()`
    * shares the SparkContext and builder-level conf but starts from
    * DEFAULT runtime conf; only [[InheritedConf]] (timezone, ANSI
    * mode, state-store opt-in) is copied from the parent — an
    * allowlist, NOT a `getAll` snapshot, so nothing a concurrent
    * thread transiently set on the shared session can ride along.
    * Then the shuffle pin and state-store provider are applied on the
    * new session only. `stateStore` is the explicit backend choice
    * (`Some("rocksdb")` → RocksDB); when absent, the parent's
    * `StateStoreKey` conf opt-in still applies (the library-level
    * switch). Runners set any source-reading conf they need (e.g.
    * nanos-as-long) on the returned session themselves. */
  /** Ephemeral checkpoint root for the drain-once runners. Micro-batch
    * offset/commit logs and state-store delta files are written and
    * fsync'd per batch per store; for a drain-once gate they are
    * throwaway by contract, yet on a disk-backed temp dir those fsyncs
    * dominate the stateful gates' wall time (stage traces: exec >> cpu,
    * tasks blocked in commit). Place them on tmpfs when the platform
    * has one. Durability posture is unchanged where it matters: a
    * production stream passes its own durable `checkpointLocation`
    * (the runners that take a checkpointDir parameter still honor it,
    * and an explicit caller conf would override this session default). */
  // ONE process-wide ephemeral root with ONE shutdown hook; each
  // isolated() call gets a private subdirectory under it. A long-lived
  // process running many drain-once gates previously registered a new
  // JVM shutdown hook (and kept a live tmpfs dir) per call — unbounded
  // hook accumulation for no isolation benefit, since the per-call
  // subdirectory is already private.
  private lazy val processCheckpointRoot: java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(base, "graft-stream-ckpt")
    // throwaway by contract — reclaim the tmpfs on JVM exit
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case scala.util.control.NonFatal(_) => () }))
    dir
  }

  private[streaming] def ephemeralCheckpointRoot(): String =
    java.nio.file.Files
      .createTempDirectory(processCheckpointRoot, "session").toString

  def isolated(parent: SparkSession, n: Int = 8,
      stateStore: Option[String] = None): SparkSession = {
    val s = parent.newSession()
    InheritedConf.foreach { k =>
      parent.conf.getOption(k).foreach { v =>
        if (s.conf.getOption(k) != Some(v)) s.conf.set(k, v)
      }
    }
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    // drain-once checkpoints are ephemeral: default them to tmpfs (per
    // isolated session; each query checkpoints under <root>/<queryName>)
    if (s.conf.getOption("spark.sql.streaming.checkpointLocation").isEmpty)
      s.conf.set("spark.sql.streaming.checkpointLocation",
        ephemeralCheckpointRoot())
    val backend =
      stateStore.orElse(parent.conf.getOption(StateStoreKey))
    if (backend.contains("rocksdb"))
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        RocksDbProvider)
    s
  }

  /** Await an AvailableNow drain of `q` (started on `child`) and FAIL
    * LOUDLY if it died or hung, then re-register the child's
    * memory-sink table `queryName` as a parent-session temp view so
    * gates read it from the session they hold. Returns the terminated
    * query (callers' `drained(q)` re-check is a no-op). */
  def publish(parent: SparkSession, child: SparkSession,
      queryName: String, q: StreamingQuery,
      timeoutMs: Long = 300000): StreamingQuery = {
    val done = q.awaitTermination(timeoutMs)
    q.exception.foreach { e =>
      throw new IllegalStateException(
        s"streaming query '${q.name}' failed: ${e.message}", e)
    }
    if (!done) {
      q.stop()
      throw new IllegalStateException(
        s"streaming query '${q.name}' did not drain within ${timeoutMs} ms; " +
          "refusing to read its sink table")
    }
    // re-bind the sink's (driver-resident) plan to the parent session
    // instead of collectAsList + createDataFrame: same rows, same
    // driver residency, but no O(rows) Row copy + re-encode on the
    // gate's clock (q_stream_merge drains 142k rows at sf0.1)
    val out = child.table(queryName)
    org.apache.spark.sql.GraftExpressionBridge
      .ofLogical(parent, out.queryExecution.analyzed)
      .createOrReplaceTempView(queryName)
    q
  }
}
