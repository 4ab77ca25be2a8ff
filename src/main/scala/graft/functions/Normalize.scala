package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text normalization for corpus curation. Accent folding is the
  * standard pre-pass before hash-based dedup and shingling — "café" and
  * "cafe" must land in the same bucket — and Spark has no built-in for
  * it (the usual workaround is a Scala UDF, which blocks whole-stage
  * codegen and serializes per row). This is the custom-`Expression`
  * path (SURVEY §4.2): a strict, codegen'd unary expression with an
  * ASCII fast path that returns the input buffer untouched — at corpus
  * scale the overwhelming majority of rows pay one byte-scan and zero
  * allocation.
  *
  * Semantics: Unicode NFD decomposition, then drop combining marks
  * (category Mn). Characters with no canonical decomposition ('ø', 'æ')
  * pass through — the same contract as DuckDB's `strip_accents`
  * (utf8proc), which is what lets the gate oracle replay it exactly.
  */
object Normalize {

  def stripAccentsKernel(s: UTF8String): UTF8String = {
    // ASCII fast path: no byte >= 0x80 → nothing to decompose
    val n = s.numBytes()
    val bytes = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0L
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(bytes, off + i) < 0)
        ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def strip_accents(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      StripAccents(org.apache.spark.sql.GraftExpressionBridge.expression(c)))
}

/** `strip_accents(string)`: NFD + drop combining marks. Strict input
  * type (exposed on the SQL surface — a mistyped argument should fail
  * analysis, not cast silently). */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    Normalize.stripAccentsKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Normalize.stripAccentsKernel($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
