package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership (Bloom 1970) as a native codegen
  * expression — the canonical large-scale ingest-dedup prefilter. A bloom built over the
  * corpus's content hashes answers "definitely new" without touching
  * the corpus: rows whose hash the filter rejects CANNOT be duplicates
  * and skip the anti-join entirely; only bloom positives (true dups +
  * the configured false-positive fraction) proceed to the exact check.
  * At 100 TB that turns the per-ingest corpus anti-join into a join
  * against a few-hundred-MB broadcast asset plus an exact join over a
  * small suspect set.
  *
  * Build is `Dataset.stat.bloomFilter` (distributed treeAggregate; the
  * driver merges per-partition bitsets), persisted as plain bytes next
  * to the other corpus sketch assets. Membership is a strict-typed
  * UnaryExpression over the same `xxhash64` content hash, evaluated
  * inside whole-stage codegen.
  *
  * Reference capability: dblink has no streaming-ingest dedup; this
  * extends the incremental pipeline (Dedup.dedupAgainstCorpus /
  * dedupAgainstSketch) the same way the posting-list band assets do.
  */
object Bloom {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Build a bloom over a LONG column (use xxhash64 of the dedup key).
    * `expectedItems`/`fpp` size the bitset: m = -n·ln(p)/ln(2)², e.g.
    * 1e9 items at 1% fpp ≈ 1.2 GB — cap fpp accordingly or shard. */
  def buildLong(df: DataFrame, column: String,
      expectedItems: Long, fpp: Double): Array[Byte] =
    serialize(df.stat.bloomFilter(column, expectedItems, fpp))

  /** Membership test column: true = possibly present, false =
    * DEFINITELY absent. */
  def might_contain_long(bloomBytes: Array[Byte], hashCol: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BloomMightContainLong(bloomBytes,
        org.apache.spark.sql.GraftExpressionBridge.expression(hashCol)))

  /** Expression builder shared by the temp-function registration and
    * the SparkSessionExtensions injection:
    * bloom_might_contain_long(binary literal filter, bigint key). */
  def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(l: org.apache.spark.sql.catalyst.expressions.Literal, child)
        if l.dataType == org.apache.spark.sql.types.BinaryType &&
          l.value != null =>
      BloomMightContainLong(l.value.asInstanceOf[Array[Byte]], child)
    case _ => throw new IllegalArgumentException(
      "bloom_might_contain_long expects (binary literal filter, bigint key)")
  }

  /** SQL registration: bloom_might_contain_long(X'…', key). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain_long", builder(_), "scala_udf")
}

/** `bloom.mightContainLong(child)` with the deserialized filter cached
  * per expression instance (the bytes travel with the serialized plan;
  * deserialization happens once per task, not per row). Strict LongType
  * input — a silently-cast key would hash differently than the build
  * side and return garbage membership. */
case class BloomMightContainLong(bytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val bloom = Bloom.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT hash key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
