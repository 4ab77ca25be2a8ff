package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shuffle-partition pinning for the drain-once STATEFUL streaming
  * runners.
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
  * The streaming query clones the session and captures the conf at
  * `start()`; the batch session's setting is restored immediately
  * after, so no batch query observes the pin.
  */
private[streaming] object StreamConf {

  def withStreamShuffle[T](spark: SparkSession, n: Int = 8)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
