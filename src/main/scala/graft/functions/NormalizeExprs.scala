package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernels — the canonicalization step every
  * multilingual corpus pipeline runs before hashing/dedup (the same
  * logical text arrives from the web in composed AND decomposed forms;
  * un-normalized, they fingerprint as different documents).
  *
  * Static JVM kernels (java.text.Normalizer) invoked from `doGenCode`,
  * so the expressions stay inside whole-stage codegen like the other
  * graft kernels (SURVEY.md §7.4). Semantics are pinned to what the
  * DuckDB oracle computes: `graft_nfc` ≡ nfc_normalize, and
  * `graft_strip_accents` ≡ strip_accents (NFD + drop combining marks —
  * verified equal on composed, decomposed, and mixed Latin inputs).
  */
object TextKernels {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      // drop combining marks (general categories Mn/Mc/Me)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.TextKernels.nfc($v)")
  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"
  override def nullSafeEval(input: Any): Any =
    TextKernels.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.TextKernels.stripAccents($v)")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object NormalizeExprs {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "NormalizeExprs")(doRegister(spark))
  private def doRegister(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      { exprs =>
        require(exprs.length == 1, "graft_nfc(text)")
        NfcExpr(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents",
      { exprs =>
        require(exprs.length == 1, "graft_strip_accents(text)")
        StripAccentsExpr(exprs.head)
      },
      "built-in")
  }
}
