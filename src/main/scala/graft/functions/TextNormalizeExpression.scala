package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for `TextNormalize` — a top-level object so the generated
  * Java can call the static forwarders directly (`TextNormalizeFns.nfc(s)`),
  * keeping the expression inside whole-stage codegen.
  */
object TextNormalizeFns {
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Unicode canonical composition (NFC) — DuckDB's `nfc_normalize`,
    * Postgres `normalize(s, NFC)`. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  /** Accent fold: canonical decomposition, then strip combining marks —
    * 'é' (either form) → 'e'. The portable subset of DuckDB's
    * `strip_accents` (both decompose-then-drop-Mn). */
  def unaccent(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Marks.matcher(Normalizer.normalize(s.toString, Normalizer.Form.NFD))
        .replaceAll(""))
}

/** Native Unicode text normalization — the canonicalization step every text
  * dedup/fingerprint pipeline needs BEFORE hashing (a precomposed 'é' and
  * 'e'+combining-acute are different bytes but the same text; an unnormalized
  * corpus near-dups against itself). Spark ships no normalize builtin, so
  * this is the §2.9 extension path: a codegen'd `UnaryExpression`
  * (`graft_nfc` / `graft_unaccent` in SQL) rather than a UDF — per-row work
  * stays inside whole-stage codegen with no serialization seam.
  *
  * `fold = false`: NFC composition. `fold = true`: accent fold (NFD + strip
  * combining marks). NULL in → NULL out.
  */
case class TextNormalize(child: Expression, fold: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = if (fold) "graft_unaccent" else "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.catalogString}")
  }

  private def kernel: String = if (fold) "unaccent" else "nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (fold) TextNormalizeFns.unaccent(s) else TextNormalizeFns.nfc(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizeFns.$kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  /** Column API: NFC composition. */
  def nfc(c: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(c), fold = false))

  /** Column API: accent fold. */
  def unaccent(c: Column): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(c), fold = true))
}
