package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Truncated-rescaled normalized Levenshtein similarity as a native
  * Catalyst expression (SURVEY §4.2's optional custom `Expression`):
  * participates in whole-stage codegen (no Scala-UDF serialization
  * boundary), null-propagating, registered for the SQL surface as
  * `lev_sim(a, b, threshold, maxSim)`.
  *
  * Semantics identical to graft.core.LevenshteinSimilarity (reference
  * SimilarityFn.scala:61-106): unit = 1 - 2d/(|a|+|b|+d);
  * sim = max(0, (max/(max-θ)) · (max·unit - θ)).
  */
case class LevenshteinSim(
    left: Expression,
    right: Expression,
    threshold: Double,
    maxSim: Double) extends BinaryExpression {

  require(maxSim > 0 && threshold >= 0 && threshold < maxSim,
    "need 0 <= threshold < maxSim")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "lev_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinSim.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      threshold, maxSim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinSim.sim($a, $b, $threshold, $maxSim);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinSim {

  /** Static kernel shared by interpreted eval and generated code. Uses
    * Spark's native UTF8String Levenshtein (SIMD-friendly byte walk). */
  def sim(a: UTF8String, b: UTF8String, threshold: Double, maxSim: Double): Double = {
    val la = a.numChars()
    val lb = b.numChars()
    if (la == 0 && lb == 0) return maxSim
    val d = a.levenshteinDistance(b).toDouble
    val unit = 1.0 - 2.0 * d / (la + lb + d)
    val raw = maxSim * unit - threshold
    if (raw <= 0.0) 0.0 else raw * maxSim / (maxSim - threshold)
  }

  /** Column-API form. */
  def lev_sim(a: Column, b: Column, threshold: Double = 7.0,
      maxSim: Double = 10.0): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      LevenshteinSim(expr(a), expr(b), threshold, maxSim))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftExpressionBridge.expression(c)

  /** Expression builder shared by the temp-function registration and the
    * SparkSessionExtensions injection (graft.GraftExtensions). */
  def builder(exprs: Seq[Expression]): Expression = {
    def litD(e: Expression, name: String): Double = e match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal =>
        l.value match {
          case d: java.lang.Double => d.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"$name must be a numeric literal, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$name must be a literal, got $other")
    }
    exprs match {
      case Seq(a, b) => LevenshteinSim(a, b, 7.0, 10.0)
      case Seq(a, b, t) => LevenshteinSim(a, b, litD(t, "threshold"), 10.0)
      case Seq(a, b, t, m) =>
        LevenshteinSim(a, b, litD(t, "threshold"), litD(m, "maxSim"))
      case _ => throw new IllegalArgumentException(
        "lev_sim expects 2-4 arguments")
    }
  }

  /** SQL registration: lev_sim(a, b[, threshold[, maxSim]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("lev_sim",
      builder(_), "scala_udf")
}
