package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau–Levenshtein distance (Lowrance–Wagner: unrestricted
  * transpositions, so "CA"→"ABC" = 2, not OSA's 3) as a native
  * whole-stage-codegen expression — the third member of the string-
  * comparator family next to `lev_sim` and `jaro_winkler`, completing
  * the classical record-linkage toolkit the reference's similarity
  * registry anticipates (reference SimilarityFn.scala declares the
  * extension point; it ships only Levenshtein and constant).
  *
  * Semantics pinned to DuckDB's `damerau_levenshtein`, which the
  * correctness oracle calls natively — the strongest possible check
  * for a from-scratch dynamic-programming kernel.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance–Wagner DP over a (la+2)×(lb+2) matrix with the
    * last-occurrence table. O(la·lb) time, O(la·lb) ints — the matrix
    * is name-length-sized in every realistic comparator use; kernels
    * comparing documents should fingerprint instead.
    *
    * Operates on Unicode CODE POINTS, not UTF-16 code units — DuckDB's
    * native `damerau_levenshtein` (the shared-SQL oracle for this
    * kernel) is codepoint-based, and a code-unit DP would silently
    * diverge on any non-BMP input (each astral character would count
    * as two units). */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    @inline def get(i: Int, j: Int): Int = d(i * w + j)
    @inline def set(i: Int, j: Int, v: Int): Unit = d(i * w + j) = v
    set(0, 0, maxd)
    var i = 0
    while (i <= la) { set(i + 1, 0, maxd); set(i + 1, 1, i); i += 1 }
    var j = 0
    while (j <= lb) { set(0, j + 1, maxd); set(1, j + 1, j); j += 1 }
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = da.getOrDefault(b(j - 1), 0)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = get(i, j) + cost
        val ins = get(i + 1, j) + 1
        val del = get(i, j + 1) + 1
        val trans = get(k, l) + (i - k - 1) + 1 + (j - l - 1)
        set(i + 1, j + 1,
          math.min(math.min(sub, ins), math.min(del, trans)))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    get(la + 1, lb + 1)
  }

  def damerau_levenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      DamerauLevenshtein(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  /** SQL registration: damerau_levenshtein(a, b). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein",
      exprs => exprs match {
        case Seq(a, b) => DamerauLevenshtein(a, b)
        case _ => throw new IllegalArgumentException(
          "damerau_levenshtein expects 2 arguments")
      },
      "scala_udf")
}
