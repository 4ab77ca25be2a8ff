package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler string similarity as a native Catalyst expression
  * (whole-stage-codegen'd, null-propagating) — the classic record-linkage
  * comparator the reference's similarity registry (SimilarityFn.scala)
  * anticipates but does not ship. Registered for SQL as
  * `jaro_winkler(a, b)` and `jaro_sim(a, b)`.
  *
  * Semantics pinned to the rapidfuzz/DuckDB convention so the DuckDB
  * oracle (`jaro_winkler_similarity`) is bit-comparable:
  *   - either side empty => 0.0 (including both empty);
  *   - match window = max(|a|,|b|)/2 - 1 (integer division, floor 0);
  *   - jaro = (m/|a| + m/|b| + (m - t)/m) / 3 with t = half-transpositions/2
  *     floored to an integer (rapidfuzz's size_t division);
  *   - Winkler boost applied only when jaro > 0.7 (strict), prefix capped
  *     at 4 chars, scaling p = 0.1.
  */
case class JaroWinkler(
    left: Expression,
    right: Expression,
    winkler: Boolean) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = if (winkler) "jaro_winkler" else "jaro_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      winkler)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b, $winkler);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code.
    * Operates on code points; allocates two small flag arrays per call
    * (name-length strings — tens of bytes), no boxing in the hot loop. */
  def sim(ua: UTF8String, ub: UTF8String, winkler: Boolean): Double = {
    // CODE POINTS, not UTF-16 units: a surrogate pair is one character
    // here, matching DuckDB/rapidfuzz (DamerauLevenshtein does the same)
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      val ca = a(i)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && b(j) == ca) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars read out in order from each side
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    // rapidfuzz/DuckDB floor the half-transposition count with integer
    // division (t = halfT / 2, not halfT / 2.0) — pinned by oracle diff
    val t = (halfT / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (!winkler || jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column-API forms. */
  def jaro_winkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      JaroWinkler(expr(a), expr(b), winkler = true))

  def jaro_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      JaroWinkler(expr(a), expr(b), winkler = false))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftExpressionBridge.expression(c)

  /** SQL registration: jaro_winkler(a, b) and jaro_sim(a, b). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => exprs match {
        case Seq(a, b) => JaroWinkler(a, b, winkler = true)
        case _ => throw new IllegalArgumentException(
          "jaro_winkler expects 2 arguments")
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_sim",
      exprs => exprs match {
        case Seq(a, b) => JaroWinkler(a, b, winkler = false)
        case _ => throw new IllegalArgumentException(
          "jaro_sim expects 2 arguments")
      },
      "scala_udf")
  }
}
