package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (array<float>), for training-data similarity search and
  * embedding-based near-dedup.
  *
  * Brute-force cosine top-k is the exact baseline: one broadcast join of
  * the (small) query set against the corpus, dot products as zip_with +
  * aggregate column expressions (codegen), top-k via the native
  * bounded-heap aggregate (map-side partial combine — no scored row is
  * ever sorted). The scale path is random-hyperplane LSH: 16-bit sign
  * sketches, bucket join, verify — corpus never self-joins unblocked.
  */
object VectorOps {

  /** Dot product of two float-array columns. Elements are promoted to
    * double BEFORE the multiply and summed by a sequential left fold —
    * the exact operation order DuckDB's `list_transform` + `list_reduce`
    * performs, so cross-engine results are bitwise identical (float
    * multiply-then-promote would differ in the last ulp). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * queries must be small enough to broadcast (it is hint-broadcast);
    * the corpus is scanned once. Ties broken by corpus id for
    * determinism; self-matches excluded when ids collide.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = graft.Tables.fanOut(corpus)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("cvec"), col("qvec")), 6).as("cosine"))
    topKPerKey(scored, Seq("qid"), "cosine", "cid", k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** Shared top-k reduction: the native bounded-heap aggregate instead
    * of a row_number window — each partition pre-reduces to ≤ k
    * (score desc, id asc) entries per key BEFORE the shuffle, where the
    * window form shuffles and sorts every scored row. Emits
    * (keys…, rank, id, score) with the identical total order the
    * window replay (and therefore the DuckDB oracle) produces. */
  private def topKPerKey(scored: DataFrame, keyCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    val keys = keyCols.map(col)
    scored.groupBy(keys: _*)
      .agg(graft.functions.TopK.top_k_by_score(
        col(scoreCol).cast("double"), col(idCol).cast("long"), k).as("__top"))
      .select(keys :+ posexplode(col("__top")): _*)
      .select(keys ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.score").as(scoreCol)): _*)
  }

  /** Squared L2 distance between two float-array columns (double-promoted
    * sequential fold — same cross-engine determinism contract as `dot`). */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, v) => acc + v)

  /** IVF (inverted-file) approximate nearest neighbor — the indexed scale
    * path beyond brute force. The corpus is coarse-quantized into cells
    * (nearest centroid by L2); each query probes only its `nprobe`
    * nearest cells, so the candidate join touches ~nprobe/numCentroids of
    * the corpus instead of all of it.
    *
    * Centroids here are taken deterministically from the corpus
    * (`id < numCentroids`) so the whole pipeline is reproducible
    * relational algebra (and therefore DuckDB-oracle-checkable); swap in
    * k-means|| centroids at scale without changing the dataflow. The
    * centroid side of both distance joins is broadcast (numCentroids ~
    * sqrt(corpus) rows); the only real shuffle is the cell-key equi-join,
    * which is the point of IVF.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      numCentroids: Int, nprobe: Int, k: Int,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cen = centroids
      .map(_.select(col("cenId"), col("cenVec")))
      .getOrElse(corpus.filter(col(idCol) < numCentroids)
        .select(col(idCol).as("cenId"), col(vecCol).as("cenVec")))
    ivfSearch(IvfIndex(cen, assignToCells(corpus, idCol, vecCol, cen)),
      queries, idCol, vecCol, nprobe, k)
  }

  /** The persisted IVF index asset: centroids (cenId, cenVec) and cell
    * assignments (cid, cvec, cell). Build once per corpus version;
    * ingest new vectors with [[appendToIvfIndex]] — assignment cost
    * tracks the NEW batch only (broadcast centroid join), the existing
    * cell table is never recomputed or re-shuffled. */
  final case class IvfIndex(centroids: DataFrame, cells: DataFrame)

  /** Vectors → owning cell (argmin L2 against the broadcast centroids,
    * centroid id as tiebreak). Argmin rides the native top-1 aggregate
    * (score = −distSq, so "best" = nearest; equal distances tie on
    * ascending centroid id, matching the window form this replaced) —
    * the build never sorts the corpus: each partition's HashAggregate
    * keeps one running (cell, dist) pair per vector. */
  private def assignToCells(vectors: DataFrame, idCol: String,
      vecCol: String, cen: DataFrame): DataFrame =
    graft.Tables.fanOut(vectors)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .join(broadcast(cen))
      .select(col("cid"), col("cvec"), col("cenId"),
        l2DistSq(col("cvec"), col("cenVec")).as("distSq"))
      .groupBy(col("cid"))
      .agg(first(col("cvec")).as("cvec"),
        graft.functions.TopK.top_k_by_score(
          -col("distSq"), col("cenId").cast("long"), 1).as("__top"))
      .select(col("cid"), col("cvec"),
        element_at(col("__top"), 1).getField("id").as("cell"))

  /** Build the index: assign every corpus vector to its cell. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): IvfIndex =
    IvfIndex(centroids.select(col("cenId"), col("cenVec")),
      assignToCells(corpus, idCol, vecCol, centroids))

  /** Incremental ingest: assign ONLY the new batch against the existing
    * centroids and append to the cell table. The index ages (centroids
    * drift from the true means as the corpus grows) but search recall
    * degrades gracefully — the standard rebuild-on-schedule trade. */
  def appendToIvfIndex(index: IvfIndex, newVecs: DataFrame,
      idCol: String, vecCol: String): IvfIndex =
    IvfIndex(index.centroids,
      index.cells.unionAll(
        assignToCells(newVecs, idCol, vecCol, index.centroids)))

  /** Materialize / load the index (parquet, two tables under `path`). */
  def writeIvfIndex(index: IvfIndex, path: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids.parquet")
    index.cells.write.mode("overwrite").parquet(s"$path/cells.parquet")
  }
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfIndex = {
    val cells = spark.read.parquet(s"$path/cells.parquet")
    require(cells.columns.contains("cell"),
      s"$path/cells.parquet has columns [${cells.columns.mkString(", ")}]; " +
        "expected (cid, cvec, cell) — rebuild with buildIvfIndex/writeIvfIndex")
    IvfIndex(spark.read.parquet(s"$path/centroids.parquet"), cells)
  }

  /** Probe + search an (in-memory or loaded) IVF index. Both top-k
    * reductions (query → nprobe nearest cells, per-query result top-k)
    * use the native bounded-heap aggregate — no scored row ever sorts,
    * and the shuffle after scoring carries ≤ k entries per query per
    * partition. */
  def ivfSearch(index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, nprobe: Int, k: Int): DataFrame = {
    val cen = index.centroids
    // query → nprobe nearest cells (score = −distSq: nearest wins,
    // equal distances tie on ascending centroid id)
    val probed = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .join(broadcast(cen))
      .select(col("qid"), col("qvec"), col("cenId"),
        l2DistSq(col("qvec"), col("cenVec")).as("distSq"))
      .groupBy(col("qid"))
      .agg(first(col("qvec")).as("qvec"),
        graft.functions.TopK.top_k_by_score(
          -col("distSq"), col("cenId").cast("long"), nprobe).as("__top"))
      .select(col("qid"), col("qvec"), explode(col("__top")).as("__probe"))
      .select(col("qid"), col("qvec"), col("__probe.id").as("cell"))
    // search only the probed cells
    val scored = probed.join(index.cells, "cell")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("cvec"), col("qvec")), 6).as("cosine"))
    topKPerKey(scored, Seq("qid"), "cosine", "cid", k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** k-means|| centroids for `ivfTopK` — the quality path for real
    * embedding distributions, where the deterministic `id < k` placeholder
    * gives arbitrary cells and poor recall at fixed nprobe. Runs Spark
    * MLlib's distributed k-means (k-means|| init, seeded → deterministic
    * for a fixed input partitioning); the returned (cenId, cenVec) frame
    * plugs into `ivfTopK`'s `centroids` parameter without changing the
    * search dataflow. Centroid ids are assigned 0..k-1 in MLlib's center
    * order. */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String,
      k: Int, maxIter: Int = 5, seed: Long = 42L): DataFrame = {
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed).setInitMode("k-means||")
      .fit(corpus.select(org.apache.spark.ml.functions
        .array_to_vector(col(vecCol)).as("features")))
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cenId", "cenVec")
  }

  /** Result of [[lloydKMeans]]: `centroids` (cenId, cenVec double
    * array) after the final update, and `assignments`
    * (cid, cell, distSq) of every corpus vector under those final
    * centroids. */
  final case class KMeansModel(centroids: DataFrame, assignments: DataFrame)

  /** Deterministic Lloyd k-means over an embedding column — the
    * oracle-checkable clustering path (contrast [[kmeansCentroids]],
    * whose k-means|| init is seeded-random and not SQL-replayable).
    * Used for cluster-balanced corpus sampling and as an exact,
    * replayable centroid builder for IVF.
    *
    * Determinism contract, per iteration:
    *  - init = the k lowest-id corpus vectors (double-promoted);
    *  - assignment = argmin squared L2 against the broadcast centroids,
    *    ascending centroid id as tiebreak — distances use the
    *    double-promoted sequential fold of [[l2DistSq]], bitwise equal
    *    to DuckDB's `list_reduce` replay;
    *  - update = per-dimension mean ROUNDED to `roundDigits` decimals.
    *    The rounding is what makes the whole loop engine-portable:
    *    partial-aggregation sum order differs between engines at the
    *    last ulp, and an unrounded centroid would propagate that into
    *    every later distance. Rounded centroids are identical bytes on
    *    both sides, so every subsequent distance is too.
    *
    * Scale shape: the per-iteration dataflow is one broadcast join
    * (corpus × k centroids, no shuffle of vectors) plus one
    * partial-aggregated shuffle of (cell, pos, sum, count) — k·dim rows
    * per map partition, not corpus rows. Only the k×dim centroid model
    * ever reaches the driver (the synchronization point every
    * distributed Lloyd implementation has, MLlib included); assignments
    * stay distributed. */
  def lloydKMeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, roundDigits: Int = 6): KMeansModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = graft.Tables.fanOut(corpus)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
    // the k lowest IDS, not ids < k: a 1-based or offset id space would
    // otherwise silently train on fewer (or zero) centroids. TopK limit
    // k is a TakeOrderedAndProject — no global sort at any corpus size.
    var cen: DataFrame = c.orderBy(col("cid")).limit(k)
      .select(col("cid").as("cenId"),
        transform(col("cvec"), x => x.cast("double")).as("cenVec"))
    for (_ <- 1 to iters) {
      val next = nearestCell(c, cen)
        .select(col("cell"), posexplode(col("cvec")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("col").cast("double")), roundDigits).as("x"))
        .groupBy(col("cell"))
        .agg(collect_list(struct(col("pos"), col("x"))).as("__px"))
        .select(col("cell").as("cenId"),
          transform(array_sort(col("__px")), p => p.getField("x"))
            .as("cenVec"))
      // truncate lineage at the model: k×dim doubles to the driver,
      // re-emitted as a literal frame for the next broadcast join
      val rows = next.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      cen = spark.createDataset(rows).toDF("cenId", "cenVec")
    }
    KMeansModel(cen, nearestCell(c, cen)
      .select(col("cid"), col("cell"), col("distSq")))
  }

  /** Argmin-L2 cell assignment (broadcast centroids, native top-1
    * aggregate — no window sort; ties on ascending centroid id),
    * emitting the winning squared distance alongside. */
  private def nearestCell(vectors: DataFrame, cen: DataFrame): DataFrame =
    vectors.join(broadcast(cen))
      .select(col("cid"), col("cvec"), col("cenId"),
        l2DistSq(col("cvec"), col("cenVec")).as("distSq"))
      .groupBy(col("cid"))
      .agg(first(col("cvec")).as("cvec"),
        graft.functions.TopK.top_k_by_score(
          -col("distSq"), col("cenId").cast("long"), 1).as("__top"))
      .select(col("cid"), col("cvec"),
        element_at(col("__top"), 1).getField("id").as("cell"),
        (-element_at(col("__top"), 1).getField("score")).as("distSq"))

  /** Random-hyperplane LSH sketch: `bits` sign bits from deterministic
    * pseudo-random hyperplanes (hyperplane component h_{b,i} derived from
    * xxhash64(b, i), mapped to [-1, 1]). Same-bucket vectors are
    * candidates; Hamming-close buckets can be probed by re-running with a
    * different seed band. Computed by the native `HyperplaneSig`
    * expression (one cached component matrix per JVM instead of per-row
    * hash regeneration); bitwise-equal to the algebra form below. */
  def hyperplaneSketch(vecCol: Column, bits: Int, seed: Int = 0): Column =
    graft.functions.Sketches.hyperplane_sig(vecCol, bits, seed)

  /** Column-algebra reference form — parity oracle for `HyperplaneSig`. */
  private[pipeline] def hyperplaneSketchAlgebra(
      vecCol: Column, bits: Int, seed: Int = 0): Column = {
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vecCol,
          transform(sequence(lit(0), size(vecCol) - 1),
            i => (pmod(xxhash64(lit(seed), lit(b), i), lit(2000000L)).cast("double") -
              1000000.0) / 1000000.0),
          (x, h) => x * h),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via LSH: bucket on the sketch, verify cosine within buckets.
    *
    * Recall math (governs bits/probes choice): a pair at angle θ agrees
    * on one sign bit with probability 1 - θ/π, collides in one probe's
    * bucket with p = (1 - θ/π)^bits, and is found by at least one of n
    * independent probe seeds with recall = 1 - (1 - p)^n. At cosine 0.9
    * (θ/π ≈ 0.144): bits=6, probes=10 → recall ≈ 0.994 per pair; the
    * default bits=12, probes=2 only reaches ~0.2 there and is meant for
    * near-identical pairs (cosine ≥ 0.99 → recall ≈ 0.998).
    *
    * Dataflow: the bucket self-join shuffles (id, probe, bucket) rows
    * only — never the embedding arrays. Vectors re-enter through a
    * semi-join pruned to ids that appear in some candidate pair, so at
    * scale the array-carrying shuffles move candidate vectors only.
    *
    * Caching contract: intermediate tables are persisted at
    * `persistLevel` and stay cached until the session cache is cleared;
    * long-lived callers should clear the cache after consuming the
    * result or pass `StorageLevel.NONE`. */
  def lshNeighborPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12, minCosine: Double = 0.8, probes: Int = 2,
      maxBucket: Int = 8192,
      persistLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    def cached(df: DataFrame): DataFrame =
      if (persistLevel == org.apache.spark.storage.StorageLevel.NONE) df
      else df.persist(persistLevel)
    val vecs = cached(graft.Tables.fanOut(corpus)
      .select(col(idCol).as("id"), col(vecCol).as("vec")))
    val cands = cached(
      lshCandidatePairs(vecs, "id", "vec", bits, probes, maxBucket))
    val candIds = cands.select(col("a").as("id"))
      .union(cands.select(col("b").as("id"))).distinct()
    // norms computed ONCE per candidate vector here, not once per pair in
    // the verify join — dot/(na*nb) below is arithmetically identical to
    // cosine() but does a third of the array folds per pair
    val vCand = vecs.join(candIds, Seq("id"), "left_semi")
      .withColumn("nrm", l2Norm(col("vec")))
    cands
      .join(vCand.toDF("a", "va", "na"), "a")
      .join(vCand.toDF("b", "vb", "nb"), "b")
      // zero-norm vectors (padding rows, failed encodes) have UNDEFINED
      // cosine: 0/0 = NaN, which Spark's comparison orders ABOVE every
      // number, so an unguarded filter would emit the bogus pair (and
      // the streaming matcher's BigDecimal round would crash on it) —
      // they match nothing instead, on both paths
      .filter(col("na") > 0.0 && col("nb") > 0.0)
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** The UNVERIFIED candidate stage of [[lshNeighborPairs]]: distinct
    * (a, b), a < b, pairs that share at least one (probe, bucket) under
    * the hyperplane sketch. Factored out so verify predicates other
    * than cosine (e.g. [[dbscan]]'s rounded squared-L2 grid) can reuse
    * the bucketed pair generation — candidates come from id-only
    * shuffles; vectors never self-join all-pairs.
    *
    * All probe sketches come from ONE pass over the corpus
    * (posexplode); buckets become df-capped posting lists instead of an
    * uncapped bucket self-join: with few bits (coarse buckets) or
    * clustered embeddings a hot bucket costs B² pairs; beyond
    * `maxBucket` a bucket is dropped — its members are crowd-similar
    * and pairs that matter also collide in other probes' buckets. */
  def lshCandidatePairs(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int, probes: Int, maxBucket: Int = 8192): DataFrame = {
    val sketches = graft.Tables.fanOut(corpus)
      .select(col(idCol).as("id"),
        posexplode(array((0 until probes).map(seed =>
          hyperplaneSketch(col(vecCol), bits, seed)): _*)))
      .withColumnRenamed("pos", "probe")
      .withColumnRenamed("col", "bucket")
    sketches
      .groupBy("probe", "bucket")
      .agg(collect_set(col("id")).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
      .select(explode(col("__ids")).as("a"), col("__ids"))
      .select(col("a"), explode(col("__ids")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** SemDeDup-style semantic deduplication ("SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", Abbas et
    * al. 2023): embedding-cosine near-duplicate groups, closed
    * transitively, one survivor (minimum id) kept per group. Returns (id, group_id, keep) for EVERY corpus
    * row — singletons are their own group and always kept — so the
    * result is directly usable as a keep-filter or as dedup lineage.
    *
    * Dataflow at scale: candidates come from [[lshNeighborPairs]]
    * (bucketed sketch join — the corpus never self-joins all-pairs, and
    * only id/bucket rows shuffle), the pair graph is closed by
    * [[graft.operators.ConnectedComponents]] (one aggregation shuffle
    * per iteration; near-dup groups are near-cliques, so the loop
    * converges in a handful of rounds on the pair-graph nodes ONLY —
    * a tiny fraction of the corpus), and the final left join re-attaches
    * labels to the full id set (label side is duplicate-members only,
    * broadcastable under AQE in the common low-duplication regime).
    *
    * With a full-recall bits/probes configuration (see the recall math
    * on [[lshNeighborPairs]]) the output is exactly the brute-force
    * all-pairs answer, which is what the DuckDB gate oracle replays. */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bits: Int = 10, probes: Int = 40,
      maxBucket: Int = 8192,
      persistLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val pairs = lshNeighborPairs(corpus, idCol, vecCol, bits, minCosine,
      probes, maxBucket, persistLevel).select(col("a"), col("b"))
    val comps = graft.operators.ConnectedComponents.components(pairs)
    corpus.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("group_id"))
      .withColumn("keep", col("id") === col("group_id"))
  }

  /** Per-dimension min-max int8 scalar quantization of an embedding
    * column, reporting reconstruction quality per vector: (id, code_sum,
    * rmse) where code_sum checksums the 0..255 codes and rmse is the
    * dequantization error √(mean((x − x̂)²)).
    *
    * Dataflow: one posexplode → per-dimension (min,max) hash aggregate
    * (map-side combine collapses each partition to `dim` rows before the
    * shuffle, so the aggregate shuffles partitions·dim rows, not n·dim),
    * broadcast the dim-sized stats table back onto the exploded values,
    * one per-vector regroup. A production sink would emit the packed
    * `code` arrays; the gate keeps the per-vector summary so the oracle
    * can replay the arithmetic relationally.
    *
    * Cross-engine determinism: values promote float→double before any
    * arithmetic, codes use floor(z·255 + 0.5) (explicit half-up — engine
    * `round()` tie rules differ), and a constant dimension (min == max)
    * maps to code 0 / exact reconstruction. */
  def quantizeInt8Stats(
      embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vals = graft.Tables.fanOut(embeddings)
      .select(col(idCol).as("id"),
        posexplode(transform(col(vecCol), x => x.cast("double"))))
      .toDF("id", "dim", "x")
    val stats = vals.groupBy("dim")
      .agg(min("x").as("mn"), max("x").as("mx"))
    val q = vals.join(broadcast(stats), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(greatest(
            floor((col("x") - col("mn")) / (col("mx") - col("mn")) * 255.0 + 0.5),
            lit(0.0)), lit(255.0)).cast("long")))
      .withColumn("xq",
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("code") / 255.0 * (col("mx") - col("mn")) + col("mn")))
    q.groupBy(col("id").as(idCol))
      .agg(sum("code").as("code_sum"),
        round(sqrt(avg((col("x") - col("xq")) * (col("x") - col("xq")))), 6)
          .as("rmse"))
  }

  /** Deterministic Rademacher (±1) sign matrix for Achlioptas random
    * projection, derived from the engine-portable md5 parity of
    * "<seed>:<i>:<j>" (the same derivation a SQL oracle replays as
    * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2`). Computed
    * once on the driver and inlined as plan literals — per-row hashing
    * would repeat dim×k digests per record for no information gain. */
  def rademacherSigns(dim: Int, k: Int, seed: String): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim, k) { (i, j) =>
      md.reset()
      val hex = md.digest(s"$seed:$i:$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Johnson-Lindenstrauss random projection of `vecCol` (dim `dim`)
    * onto `k` dimensions: y_j = Σ_i x_i·s(i,j) / √k with the Rademacher
    * signs above. Stateless column algebra — a per-row O(dim·k) map
    * with full pushdown and no shuffle; the projected columns are
    * appended as y0_e4..y(k-1)_e4 (1e-4-grid integers) plus the
    * squared-norm ratio ||y||²/||x||² as norm_ratio_e3 (the JL
    * distortion diagnostic, E[ratio] = 1, in integer milli-units). */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, seed: String = "rp"): DataFrame = {
    val signs = rademacherSigns(dim, k, seed)
    val x = (i: Int) => element_at(col(vecCol), i + 1).cast("double")
    // left-fold addition chains + a literal /sqrt(k) division mirror a
    // SQL oracle's sequential list_sum(...)/sqrt(k), so the doubles are
    // bit-identical across engines
    val ys = (0 until k).map { j =>
      (0 until dim).map(i => x(i) * lit(signs(i)(j))).reduce(_ + _) /
        lit(math.sqrt(k.toDouble))
    }
    val nx = aggregate(
      transform(col(vecCol), v => v.cast("double") * v.cast("double")),
      lit(0.0d), (a, b) => a + b)
    val ny = ys.map(y => y * y).reduce(_ + _)
    // projections pinned as INTEGERS on a 1e-4 grid (norm ratio 1e-3):
    // explicit IEEE multiply + scale-0 round + BIGINT cast. A rounded
    // DOUBLE here once emitted -0.0 for y ∈ (−1e-4, 0) and decimal-
    // scale round(x, n) drifts across engine builds; integers can do
    // neither.
    df.select(col(idCol) +:
      (ys.zipWithIndex.map { case (y, j) =>
        round(y * lit(1e4) + lit(1e-3)).cast("long").as(s"y${j}_e4")
      } :+ round(ny / nx * lit(1e3) + lit(1e-3)).cast("long")
        .as("norm_ratio_e3")): _*)
  }

  /** Per-label centroids as arrays: posexplode → per-(label, dim) mean
    * → re-collect ordered by dim. Centroid components are rounded
    * (nudged +1e-9) so downstream arithmetic is bit-identical across
    * engines despite each engine's own partial-aggregation sum order.
    * Result is labels × dim — broadcast-sized at any corpus scale. */
  def labelCentroids(corpus: DataFrame, vecCol: String,
      labelCol: String): DataFrame =
    corpus.select(col(labelCol).as("c_label"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("c_label"), col("pos"))
      .agg(round(avg(col("v").cast("double")) + 1e-9, 6).as("m"))
      .groupBy(col("c_label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        s => s("m")).as("centroid"))

  /** Simplified (centroid-based) silhouette per label: for each vector,
    * a = distance to its own label's centroid, b = min distance to any
    * other centroid, s = (b − a)/max(a, b); averaged per label. The
    * centroid table is broadcast, so the whole diagnostic is one
    * corpus scan + one labels-sized aggregate — unlike the classic
    * pairwise silhouette, which is O(n²) and dies at scale. */
  def silhouetteByLabel(corpus: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val cen = labelCentroids(corpus, vecCol, labelCol)
    val scored = corpus.crossJoin(broadcast(cen))
      .withColumn("__d", sqrt(l2DistSq(col(vecCol), col("centroid"))))
      .groupBy(col(idCol), col(labelCol))
      .agg(
        min(when(col(labelCol) === col("c_label"), col("__d"))).as("__a"),
        min(when(col(labelCol) =!= col("c_label"), col("__d"))).as("__b"))
      .withColumn("__s",
        (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
    scored.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__s")) + 1e-9, 4).as("avg_silhouette"))
  }

  /** Product-quantization ANN (Jégou et al. 2011): vectors split into
    * `m` subvectors, each quantized to its nearest subspace centroid;
    * a query's distance to an encoded vector is the sum of
    * per-subspace distances to the stored CODES (asymmetric distance
    * computation). The index stores m bytes-ish per vector instead of
    * the full float array — the memory step that makes billion-vector
    * ANN feasible; IVF (cell pruning) and PQ (compression) compose.
    *
    * Centroids are supplied (deterministic subsets in the gates,
    * k-means at scale), so the whole pipeline is reproducible
    * relational algebra: encode = argmin join against the broadcast
    * codebook (ties → smaller centroid id), search = distance-table
    * join + an IN-ROW j-ordered fold (so the per-subspace sum order is
    * pinned and the DuckDB oracle reproduces it bitwise).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, m: Int, k: Int): DataFrame = {
    // per-subspace codebook: (j, cenId, subvector) — broadcast-sized.
    // Sub-length derives from each frame's own vector column (the
    // codebook frame has no corpus column).
    def subvecs(c: org.apache.spark.sql.Column) = {
      val len = (org.apache.spark.sql.functions.size(c) / m).cast("int")
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(c, j * len + 1, len)))
    }
    val cb = centroids
      .select(col("cenId"), subvecs(col("cenVec")).as(Seq("j", "csub")))
    val enc = graft.Tables.fanOut(corpus)
      .select(col(idCol).as("cid"), subvecs(col(vecCol)).as(Seq("j", "vsub")))
      .join(broadcast(cb), "j")
      .groupBy(col("cid"), col("j"))
      .agg(min_by(col("cenId"),
        struct(l2DistSq(col("vsub"), col("csub")).as("d"), col("cenId")))
        .as("code"))
    val qsub = queries
      .select(col(idCol).as("qid"), subvecs(col(vecCol)).as(Seq("j", "qsub")))
    // asymmetric distance tables: query-subvector × codebook
    val dt = qsub.join(broadcast(cb), "j")
      .select(col("qid"), col("j"), col("cenId"),
        l2DistSq(col("qsub"), col("csub")).as("d"))
    val dists = enc
      .join(broadcast(dt),
        col("code") === col("cenId") && enc("j") === dt("j"))
      .filter(col("cid") =!= col("qid"))
      .groupBy(col("qid"), col("cid"))
      // j-ordered in-row fold pins the 4-term sum order cross-engine
      .agg(aggregate(
        transform(sort_array(collect_list(struct(enc("j"), col("d")))),
          s => s("d")),
        lit(0.0d), (acc, v) => acc + v).as("adist"))
    dists
      .withColumn("adist", round(col("adist"), 6))
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.top_k_by_score(
        -col("adist"), col("cid").cast("long"), k).as("__top"))
      .select(col("qid") +: Seq(posexplode(col("__top"))): _*)
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("cid"), (-col("col.score")).as("adist"))
  }

  /** IVF + PQ composed — the standard billion-scale ANN stack: IVF
    * prunes the corpus to the query's `nprobe` nearest cells, PQ scores
    * the survivors from codes instead of full vectors. Pruning and
    * compression are independent axes; this operator proves they
    * compose in the same dataflow (cell equi-join → code/distance-table
    * join → bounded-heap top-k) with no step quadratic in the corpus.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, ivfCentroids: DataFrame, pqCentroids: DataFrame,
      nprobe: Int, m: Int, k: Int): DataFrame = {
    // IVF half: corpus cells + per-query probe set (argmin machinery
    // shared with ivfTopK)
    val cells = assignToCells(corpus, idCol, vecCol, ivfCentroids)
      .select(col("cid"), col("cell"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .join(broadcast(ivfCentroids))
      .select(col("qid"), col("cenId"),
        l2DistSq(col("qvec"), col("cenVec")).as("distSq"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.top_k_by_score(
        -col("distSq"), col("cenId").cast("long"), nprobe).as("__top"))
      .select(col("qid"), explode(col("__top")).as("__p"))
      .select(col("qid"), col("__p.id").as("cell"))
    // candidate pairs: queries meet only their probed cells' vectors
    val cand = probes.join(cells, "cell")
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"))
    // PQ half: encode corpus, per-query distance tables, j-ordered fold
    def subvecs(c: org.apache.spark.sql.Column) = {
      val len = (org.apache.spark.sql.functions.size(c) / m).cast("int")
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(c, j * len + 1, len)))
    }
    val cb = pqCentroids
      .select(col("cenId"), subvecs(col("cenVec")).as(Seq("j", "csub")))
    val enc = graft.Tables.fanOut(corpus)
      .select(col(idCol).as("cid"), subvecs(col(vecCol)).as(Seq("j", "vsub")))
      .join(broadcast(cb), "j")
      .groupBy(col("cid"), col("j"))
      .agg(min_by(col("cenId"),
        struct(l2DistSq(col("vsub"), col("csub")).as("d"), col("cenId")))
        .as("code"))
    val dt = queries
      .select(col(idCol).as("qid"), subvecs(col(vecCol)).as(Seq("j", "qsub")))
      .join(broadcast(cb), "j")
      .select(col("qid"), col("j"), col("cenId"),
        l2DistSq(col("qsub"), col("csub")).as("d"))
    val dists = cand
      .join(enc, "cid")
      .join(broadcast(dt),
        col("code") === col("cenId") && enc("j") === dt("j") &&
          cand("qid") === dt("qid"))
      .groupBy(cand("qid"), col("cid"))
      .agg(aggregate(
        transform(sort_array(collect_list(struct(enc("j"), col("d")))),
          s => s("d")),
        lit(0.0d), (acc, v) => acc + v).as("adist"))
    dists
      .withColumn("adist", round(col("adist"), 6))
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.top_k_by_score(
        -col("adist"), col("cid").cast("long"), k).as("__top"))
      .select(col("qid") +: Seq(posexplode(col("__top"))): _*)
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("cid"), (-col("col.score")).as("adist"))
  }

  /** DBSCAN density clustering over an embedding column, expressed
    * relationally: ε-neighbor pairs → core points (≥ minPts neighbors,
    * self included) → connected components over the core-core graph →
    * border points adopt the MINIMUM adjacent core cluster (a
    * deterministic refinement of classic DBSCAN's arrival-order
    * assignment); everything else is noise (cluster −1).
    *
    * The pair stage is size-routed: at or below `exactPairThreshold`
    * corpus rows it is the exact blocked self-join (corpus joined
    * against its broadcast — quadratic but lossless and shuffle-free);
    * above it, candidates come from [[lshCandidatePairs]] in a
    * full-recall configuration (few bits, many probes — fixed seeds, so
    * the result is reproducible) and only candidates pay the exact
    * distance check — the corpus never self-joins all-pairs, which is
    * the 100 TB path. Either way the SAME exact ε predicate decides
    * membership, so the two paths differ only if LSH misses an ε-pair
    * (per-pair miss ≈ (1−(1−θ/π)^bits)^probes; ~1e-8 at the defaults
    * for near-duplicate angles — asserted equal on the planted spec
    * corpus). The rest of the pipeline is shared, which is the point of
    * phrasing DBSCAN as dataflow. Distances compare on ROUNDED squared
    * L2 (1e-6 grid, the engine-parity convention), so the oracle
    * replays bit-identically.
    *
    * Reliable checkpoint mode durably materializes the pair set and the
    * core table (and components() its core-edge subgraph) — recovery
    * state while the call runs; on return the result roots at its own
    * durable cut and the intermediate files are reclaimed, so only one
    * result-sized footprint remains under the checkpoint dir per call.
    *
    * The default threshold keeps the EXACT pair stage for any corpus up
    * to 100k rows — the documented guarantee existing callers rely on.
    * Routing a mid-size corpus to the LSH stage is result-affecting (if
    * the full-recall config misses an ε-pair), so it must be explicit at
    * the call site: pass a lower `exactPairThreshold` to opt in, `0` to
    * force LSH with no routing count, or `Long.MaxValue` for exact at
    * any size.
    */
  def dbscan(corpus: DataFrame, idCol: String, vecCol: String,
      eps: Double, minPts: Int, exactPairThreshold: Long = 100000L,
      lshBits: Int = 4, lshProbes: Int = 24): DataFrame = {
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // Routing count only when the exact path is even on the table —
    // threshold <= 0 forces LSH with no extra corpus pass. The default
    // threshold caps the quadratic broadcast path at ~5e9 pair checks
    // (100k rows); past that the LSH stage wins decisively.
    val exact = exactPairThreshold > 0L && c.count() <= exactPairThreshold
    val epsPred = (l: Column, r: Column) =>
      round(l2DistSq(l, r), 6) <= eps * eps
    val rawPairs =
      if (exact)
        c.as("l")
          .join(broadcast(c.as("r")), col("l.__id") < col("r.__id"))
          .filter(epsPred(col("l.__v"), col("r.__v")))
          .select(col("l.__id").as("a"), col("r.__id").as("b"))
      else
        lshCandidatePairs(c, "__id", "__v", lshBits, lshProbes)
          .join(c.toDF("a", "__va"), "a")
          .join(c.toDF("b", "__vb"), "b")
          .filter(epsPred(col("__va"), col("__vb")))
          .select(col("a"), col("b"))
    val cp = graft.operators.LoopCheckpoint.forLoop(corpus.sparkSession)
    val pairs = cp.pin(rawPairs)
    val und = pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
    // neighbor counts (self included, as in classic DBSCAN)
    val degrees = und.groupBy(col("a").as("__id"))
      .agg((count(lit(1)) + 1).as("__deg"))
    val core = cp.pin(c.select(col("__id"))
      .join(degrees, Seq("__id"), "left")
      .select(col("__id"),
        (coalesce(col("__deg"), lit(1L)) >= minPts).as("__core")))
    // consumed by the output join below
    val coreIds = core.filter(col("__core")).select(col("__id"))
    // components over the core-core subgraph
    val coreEdges = pairs
      .join(coreIds.select(col("__id").as("a")), "a")
      .join(coreIds.select(col("__id").as("b")), "b")
      .select(col("a"), col("b"))
    // nested loop shares THIS truncator so cp.finish below reclaims its
    // cuts too (a standalone components() would orphan its result cut)
    val comps =
      graft.operators.ConnectedComponents.componentsWith(coreEdges, cp)
    // core points keep their component (isolated cores self-cluster);
    // border points adopt the min adjacent core cluster; rest is noise
    val coreCluster = coreIds
      .join(comps.withColumnRenamed("id", "__id"), Seq("__id"), "left")
      .select(col("__id"), coalesce(col("comp"), col("__id")).as("__cl"))
    val borderCluster = und
      .join(coreCluster.select(col("__id").as("b"), col("__cl")), "b")
      .groupBy(col("a").as("__id"))
      .agg(min(col("__cl")).as("__bcl"))
    // finish(): local mode is a no-op; reliable mode roots the result at
    // its own durable cut and reclaims the pair/core pin files (the
    // returned frame would otherwise stay lazy over them, leaving
    // O(pairs) in the checkpoint dir per call).
    cp.finish(core
      .join(coreCluster, Seq("__id"), "left")
      .join(borderCluster, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        col("__core").as("is_core"),
        when(col("__core"), col("__cl"))
          .otherwise(coalesce(col("__bcl"), lit(-1L))).as("cluster")))
  }

  /** k-nearest-neighbor classification: each query's label is the
    * majority label among its k exact cosine neighbors (ties: more
    * votes win, then the smaller label). Rides the bounded-heap top-k
    * (map-side partials, no window sort); the vote argmax is ONE
    * hash aggregate via max(struct(votes, −label)). */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("cid"),
      col(labelCol).as("__lbl"))
    broadcast(nn).join(labels, "cid")
      .groupBy(col("qid"), col("__lbl"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("qid"))
      .agg(max(struct(col("__votes"), (-col("__lbl")).as("__neg"))).as("__w"))
      .select(col("qid"), (-col("__w.__neg")).cast("int").as("pred_label"),
        col("__w.__votes").as("votes"))
  }

  /** 1e-7-grid quantization shared by the PCA moment pass and power
    * iteration: explicit IEEE multiply, +1e-3 nudge (in grid units, so
    * 1e-10 absolute) to keep values off half-integer round boundaries,
    * scale-0 HALF_UP round (matching Spark's `round` and DuckDB's),
    * exact BIGINT→double division back. Every cross-row float sum in
    * the PCA pipeline passes through this grid, so downstream
    * arithmetic sees identical BYTES on both engines regardless of
    * partial-aggregation order. */
  private def q7(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e7 + 1e-3)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue() / 1e7
  private def q7c(c: Column): Column =
    round(c * lit(1e7) + lit(1e-3)).cast("long").cast("double") / lit(1e7)

  /** Top principal component of an embedding column by the classic
    * two-phase distributed PCA: a single-pass second-moment sweep (the
    * d×d Gram/mean statistics — the ONLY thing that ever touches the
    * corpus), then power iteration on the tiny d×d covariance at the
    * driver (the same bounded-model sync point as [[lloydKMeans]]'s
    * centroids; d²=4096 doubles here, never corpus rows).
    *
    * Scale shape: the upper-triangle product view explodes d(d+1)/2
    * entries per row, but the hash aggregate's map-side combine
    * reduces each partition to ≤ 2080 partial sums before the shuffle
    * — at any corpus size the shuffle carries (partitions × 2080)
    * rows. That is exactly how MLlib's RowMatrix computes its Gramian,
    * restated declaratively.
    *
    * Determinism contract: every cross-row average is quantized to the
    * 1e-7 grid ([[q7]]), covariance entries are exact-double algebra
    * of quantized parts, and each power-iteration step re-quantizes
    * the normalized iterate — matrix-vector products and norms fold in
    * ascending index order, so DuckDB replays the whole iteration
    * bit-exactly (j-ordered `list_reduce`, the q_ann_pq fold
    * discipline).
    *
    * Output (one row per dimension, integer grids): pos, loading_e7
    * (eigenvector component × 1e7), plus the constant lambda_e7
    * (top eigenvalue), trace_e7 (total variance) and share_e6
    * (explained-variance ratio × 1e6). */
  /** The fitted model: quantized per-dimension means, the top
    * eigenvector (components on the 1e-7 grid), its eigenvalue, and
    * the covariance trace. Driver-side — d + d doubles, the artifact a
    * real pipeline persists and reuses for projection/whitening. */
  final case class PcaModel(mu: Array[Double], loadings: Array[Double],
      lambda: Double, trace: Double)

  def pcaTopComponent(corpus: DataFrame, vecCol: String, dim: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = pcaModel(corpus, vecCol, dim, iters)
    def grid(x: Double, s: Double): Long =
      java.math.BigDecimal.valueOf(x * s + 1e-3)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    spark.createDataset((0 until dim).map(i =>
        (i, grid(m.loadings(i), 1e7), grid(m.lambda, 1e7),
          grid(m.trace, 1e7), grid(m.lambda / m.trace, 1e6))))
      .toDF("pos", "loading_e7", "lambda_e7", "trace_e7", "share_e6")
  }

  /** Fit the model (see [[pcaTopComponent]] for the full contract). */
  def pcaModel(corpus: DataFrame, vecCol: String, dim: Int,
      iters: Int): PcaModel = {
    require(dim >= 2 && iters >= 1, "need dim >= 2 and iters >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = graft.Tables.fanOut(corpus)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
    val muQ: Map[Int, Double] = rows
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(q7c(avg(col("x"))).as("m"))
      .as[(Int, Double)].collect().toMap
    val m2Q: Map[(Int, Int), Double] = rows
      .select(explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)), i =>
          transform(sequence(i, lit(dim - 1)), j =>
            struct(i.as("i"), j.as("j"),
              (element_at(col("v"), i + 1) *
                element_at(col("v"), j + 1)).as("p")))))).as("z"))
      .groupBy(col("z.i").as("i"), col("z.j").as("j"))
      .agg(q7c(avg(col("z.p"))).as("aq"))
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, a) => (i, j) -> a }.toMap
    // covariance from quantized parts — identical bytes on both engines
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      m2Q((a, b)) - muQ(i) * muQ(j)
    }
    var v = Array.fill(dim)(0.125) // 1/8: exact at dim 64; any exact
    // binary constant works — the iteration renormalizes immediately
    var u = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      u = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }; acc
      }
      var n2 = 0.0; var i = 0
      while (i < dim) { n2 += u(i) * u(i); i += 1 }
      val nrm = math.sqrt(n2)
      v = Array.tabulate(dim)(i => q7(u(i) / nrm))
    }
    val uf = Array.tabulate(dim) { i =>
      var acc = 0.0; var j = 0
      while (j < dim) { acc += c(i)(j) * v(j); j += 1 }; acc
    }
    var lambda = 0.0; var trace = 0.0
    for (i <- 0 until dim) { lambda += v(i) * uf(i); trace += c(i)(i) }
    PcaModel(Array.tabulate(dim)(muQ), v, lambda, trace)
  }

  /** Project every corpus vector onto the fitted component: the
    * centered dot product (x − μ)·v, folded in ascending index order
    * (grid-exact μ and v, so the coordinate bytes replay in DuckDB).
    * One narrow map over the corpus — the whitening/compression step
    * that turns the model into per-document features at any scale.
    * Output: idCol, coord_e6 (coordinate × 1e6, BIGINT). */
  def pcaProject(corpus: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame =
    graft.Tables.fanOut(corpus).select(col(idCol),
      round(aggregate(
        zip_with(
          zip_with(transform(col(vecCol), x => x.cast("double")),
            typedlit(model.mu.toSeq), (x, m) => x - m),
          typedlit(model.loadings.toSeq), (d, l) => d * l),
        lit(0.0d), (acc, t) => acc + t) * lit(1e6) + lit(1e-3))
        .cast("long").as("coord_e6"))
}
