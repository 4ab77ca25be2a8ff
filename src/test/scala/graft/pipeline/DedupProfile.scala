package graft.pipeline

import org.apache.spark.sql.functions._

import graft.TestSpark

/** Scratch stage-profiler for the minhash dedup pipeline (not a test).
  * Run: sbt "Test/runMain graft.pipeline.DedupProfile [sfDir]" */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mutated = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        col("text").substr(lit(1),
          greatest(length(col("text")) - 30, lit(10))).as("text"))
    val docs = d.unionAll(mutated)
    docs.persist(); docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // stage 1: shingle + hash only
    time("shingle+hash") {
      docs.select(col("doc_id"),
          Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("shHash"))
        .select(sum(size(col("shHash")))).collect()
    }
    // stage 2: + signature
    time("…+signature(128)") {
      docs.select(col("doc_id"),
          Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("shHash"))
        .select(col("doc_id"), Dedup.minHashSignature(col("shHash"), 128).as("sig"))
        .select(sum(size(col("sig")))).collect()
    }
    // stage 3: full band table
    time("…+bands") {
      Dedup.lshBands(docs, "doc_id", "text", 3, 32, 4)
        .select(count(lit(1))).collect()
    }
    // stage 4: candidates
    val cands = time("…+bucket-join candidates") {
      val c = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 32, 4)
      c.persist(); println("  candidates: " + c.count()); c
    }
    // stage 5: verify
    time("verify(jaccard)") {
      Dedup.verifyJaccard(docs, cands, "doc_id", "text", 3)
        .filter(col("jaccard") >= 0.8).select(count(lit(1))).collect()
    }
    time("full nearDuplicatePairs") {
      Dedup.nearDuplicatePairs(docs, "doc_id", "text", 0.8, 3, 32, 4)
        .select(count(lit(1))).collect()
    }
    spark.stop()
  }
}
