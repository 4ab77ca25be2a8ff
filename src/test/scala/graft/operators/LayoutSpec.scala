package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.ZOrder

/** Z-order layout: Morton kernel correctness and the clustering payoff
  * (a two-dimensional range filter touches few partitions). */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleave places x on even bits, y on odd; deinterleave inverts") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L)
    assert(ZOrder.interleave(0L, 1L) == 2L)
    assert(ZOrder.interleave(3L, 3L) == 15L)
    assert(ZOrder.interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    val zs = Seq((5L, 9L), (1023L, 0L), (123456L, 654321L))
    zs.foreach { case (x, y) =>
      assert(ZOrder.deinterleave(ZOrder.interleave(x, y)) == ((x, y)))
    }
  }

  test("zOrdered: partition Morton ranges are disjoint; 2-D box is local") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
    val laid = Layout.zOrdered(li, "l_extendedprice", "l_quantity",
      numPartitions = 8, bits = 8)
      .withColumn("__pid", spark_partition_id())
      .cache()
    try {
      // range repartition => per-partition code ranges must not overlap
      val ranges = laid.groupBy("__pid")
        .agg(min("__z").as("lo"), max("__z").as("hi"))
        .orderBy("lo").collect()
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
          s"overlapping Morton ranges: $a / $b")
        case _ =>
      }
      // a box selective in BOTH dimensions lands in a few partitions,
      // not spread across all of them — the pruning payoff
      val stats = li.agg(
        expr("percentile(l_extendedprice, 0.40)"),
        expr("percentile(l_extendedprice, 0.45)"),
        expr("percentile(l_quantity, 0.40)"),
        expr("percentile(l_quantity, 0.45)")).head()
      val hit = laid.filter(
        col("l_extendedprice").between(stats.getDouble(0), stats.getDouble(1)) &&
          col("l_quantity").between(stats.getDouble(2), stats.getDouble(3)))
      assert(hit.count() > 0)
      val touched = hit.select("__pid").distinct().count()
      assert(touched <= 4, s"2-D box touched $touched of 8 partitions")
    } finally laid.unpersist()
  }

  test("zone map: prune equals plain filter, skips zones, prunes partitions") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity"), col("l_linenumber"), col("l_orderkey"))
      .withColumn("zone", Layout.zoneId(
        floor(col("l_quantity") / 4).cast("long"),
        col("l_linenumber").cast("long"), 2))
    val ix = Layout.zoneMapIndex(li, "zone",
      Seq("l_quantity", "l_linenumber")).cache()
    try {
      // index bounds hold for every row
      val violations = li.join(ix, Seq("zone"))
        .filter(col("l_quantity") < col("min_l_quantity") ||
          col("l_quantity") > col("max_l_quantity") ||
          col("l_linenumber") < col("min_l_linenumber") ||
          col("l_linenumber") > col("max_l_linenumber"))
      assert(violations.count() == 0)

      val ranges = Seq(("l_quantity", 36.0, 50.0), ("l_linenumber", 1.0, 2.0))
      // semantics-preserving: pruned scan == plain filter
      val pruned = Layout.pruneByZoneMap(li, ix, "zone", ranges)
        .select("l_orderkey", "l_quantity", "l_linenumber")
        .as[(Long, Double, Int)].collect().toSet
      val plain = li.filter(col("l_quantity").between(36, 50) &&
          col("l_linenumber").between(1, 2))
        .select("l_orderkey", "l_quantity", "l_linenumber")
        .as[(Long, Double, Int)].collect().toSet
      assert(pruned === plain && pruned.nonEmpty)
      // and it genuinely skips: candidate zones are a strict subset
      val total = ix.count()
      val kept = Layout.matchingZones(ix, "zone", ranges).count()
      assert(kept < total, s"kept $kept of $total zones — no skipping")

      // on a zone-partitioned table the candidate set prunes at the scan
      val dir = java.nio.file.Files.createTempDirectory("zonemap").toString
      li.write.mode("overwrite").partitionBy("zone").parquet(dir)
      val zones = Layout.matchingZones(ix, "zone", ranges)
        .as[Long].collect()   // metadata-sized by construction
      val scan = spark.read.parquet(dir)
        .filter(col("zone").isin(zones: _*))
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("zone#"),
        plan.take(2000))
      val files = scan.select(input_file_name()).distinct().as[String].collect()
      assert(files.forall(f => zones.exists(z => f.contains(s"zone=$z"))),
        files.take(5).mkString("\n"))
    } finally ix.unpersist()
  }

  test("zone map prune keeps matching rows whose zone is NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10.0, 100L), (Some(1L), 20.0, 101L),
      (None, 15.0, 102L),       // un-bucketable row inside the range
      (None, 99.0, 103L),       // un-bucketable row outside the range
      (Some(2L), 50.0, 104L))
      .toDF("zone", "v", "id")
    val ix = Layout.zoneMapIndex(df, "zone", Seq("v"))
    val kept = Layout.pruneByZoneMap(df, ix, "zone",
        Seq(("v", 10.0, 20.0)))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(100L, 101L, 102L))
  }

  test("mergeZoneMaps over split batches equals the full index") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_quantity"), col("l_linenumber"), col("l_orderkey"))
      .withColumn("zone", Layout.zoneId(
        floor(col("l_quantity") / 4).cast("long"),
        col("l_linenumber").cast("long"), 2))
    val stats = Seq("l_quantity", "l_linenumber")
    val full = Layout.zoneMapIndex(li, "zone", stats)
    val merged = Layout.mergeZoneMaps(
      Seq(li.filter(col("l_orderkey") % 2 === 0),
        li.filter(col("l_orderkey") % 2 =!= 0))
        .map(Layout.zoneMapIndex(_, "zone", stats)), "zone", stats)
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select("zone", "n_rows", "min_l_quantity", "max_l_quantity",
        "min_l_linenumber", "max_l_linenumber")
        .as[(Long, Long, Double, Double, Int, Int)].collect().toSet
    assert(key(merged) === key(full) && key(full).nonEmpty)
  }

  test("binary-search bucketing matches the algebra form; NULL yields NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // duplicate boundaries + values at/around every boundary: the
    // upper-bound search must agree with count(bounds <= v) everywhere
    val bounds = Array(1.0, 2.0, 2.0, 5.0, 9.0)
    val vals = Seq(0.0, 1.0, 1.5, 2.0, 3.0, 5.0, 8.9, 9.0, 10.0,
      Double.MinValue, Double.MaxValue)
    val df = vals.toDF("v")
    val both = df.select(
      Layout.bucketByBounds(col("v"), bounds).as("fast"),
      Layout.bucketByBoundsAlgebra(col("v"), bounds).as("slow"))
      .as[(Long, Long)].collect()
    both.foreach { case (f, sl) => assert(f == sl, s"fast=$f slow=$sl") }
    val nullBucket = Seq[Option[Double]](None).toDF("v")
      .select(Layout.bucketByBounds(col("v"), bounds)).head()
    assert(nullBucket.isNullAt(0), "NULL must not land in a real bucket")
  }
}
