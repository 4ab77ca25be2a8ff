package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming heavy hitters: a sharded SpaceSaving sketch
  * (Metwally et al. 2005) as a stateful operator. Keys hash-partition
  * across `shards` independent sketches (keys are disjoint per shard,
  * so per-key counts never split); each shard keeps at most `capacity`
  * counters — on overflow the minimum counter is surrendered to the
  * arriving key, inheriting its count as the classic overestimation
  * bound (error ≤ N_shard / capacity). With capacity at or above a
  * shard's distinct-key load the sketch is EXACT, which is what lets
  * the drained gate query hash-match a batch GROUP BY in DuckDB while
  * the spec exercises the bounded-memory eviction path.
  *
  * State per shard is a bounded map (≤ capacity entries) regardless of
  * stream length — the 100 TB-stream posture.
  */
object Frequency {

  final case class Counter(key: Long, n: Long, err: Long)

  /** One shard's SpaceSaving update: fold `incoming` key occurrences
    * into the counter map. */
  private[streaming] def updateSketch(
      counters: Map[Long, (Long, Long)], incoming: Iterator[Long],
      capacity: Int): Map[Long, (Long, Long)] = {
    var m = counters
    incoming.foreach { k =>
      m.get(k) match {
        case Some((n, e)) => m = m.updated(k, (n + 1, e))
        case None if m.size < capacity => m = m.updated(k, (1L, 0L))
        case None =>
          // surrender the minimum counter (deterministic tie: lowest key)
          val (mk, (mn, _)) = m.minBy { case (key, (n, _)) => (n, key) }
          m = (m - mk).updated(k, (mn + 1, mn))
      }
    }
    m
  }

  /** The stateful operator: keys → shard by hash; each shard folds its
    * micro-batch into its sketch and emits the CURRENT counters (Update
    * semantics via Append of refreshed snapshots is avoided — the
    * drain-once runner reads state after the final batch instead). */
  def spaceSavingSketch(keys: Dataset[Long], shards: Int,
      capacity: Int): Dataset[Counter] = {
    import keys.sparkSession.implicits._
    keys
      .groupByKey(k => (k.## & Int.MaxValue) % shards)
      .flatMapGroupsWithState[Map[Long, (Long, Long)], Counter](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, ks, state: GroupState[Map[Long, (Long, Long)]]) =>
          val m = updateSketch(state.getOption.getOrElse(Map.empty), ks,
            capacity)
          state.update(m)
          m.iterator.map { case (k, (n, e)) => Counter(k, n, e) }
      }
  }

  /** Drain-once runner: stream the events table AvailableNow, sketch
    * user-id frequencies, land the final per-shard counters in a memory
    * table. The gate reads the last snapshot per key (arrival-ordered
    * duplicates from intermediate batches are superseded) and takes the
    * exact top-k. */
  def runStreamingTopUsersOnce(spark: SparkSession, sfDir: String,
      queryName: String, shards: Int = 32,
      capacity: Int = 4096): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    import spark.implicits._
    val users = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id")).as[Long]
    spaceSavingSketch(users, shards, capacity).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
