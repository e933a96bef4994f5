package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass windowed byte statistics over a BINARY payload: for each FULL
  * window of `win` bytes, the unsigned-byte sum (`energy`) and max (`peak`)
  * — the audio-featurizer map kernel (RMS/VAD/silence-trim shape).
  *
  * Semantically identical to the declarative form the DuckDB oracle mirrors
  * (hex the payload, per window transform 2-char slices back to integers,
  * aggregate sum / array_max; tail bytes beyond the last full window drop),
  * but in ONE pass over the raw bytes. The declarative form carried the
  * whole payload's hex string into EVERY exploded window row and re-sliced
  * it per byte — O(payload × windows) traffic per document, a quadratic
  * that a multi-MB audio blob turns into a scan-killer. Here the per-doc
  * cost is one O(n) pass producing n/win structs, and the explode fans out
  * only the 16-byte stats rows (BinaryWindowSpec pins equality against the
  * composition).
  *
  * NULL semantics: NULL payload → NULL (nullSafeEval); under `win` bytes →
  * empty array (explode then emits no rows — the composition's n_win = 0).
  */
case class BinaryWindowStats(child: Expression, win: Int) extends UnaryExpression {

  require(win >= 1, s"window must be >= 1 byte, got $win")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("energy", LongType, nullable = false),
    StructField("peak", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_binary_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  /** Invoked from generated code too — must stay public. */
  def kernel(bytes: Array[Byte]): GenericArrayData = {
    val n = bytes.length / win
    val out = new Array[Any](n)
    var w = 0
    while (w < n) {
      var energy = 0L
      var peak = 0L
      var i = w * win
      val end = i + win
      while (i < end) {
        val b = (bytes(i) & 0xFF).toLong
        energy += b
        if (b > peak) peak = b
        i += 1
      }
      out(w) = InternalRow(energy, peak)
      w += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("binWin", this, classOf[BinaryWindowStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryWindowExpression {
  /** Per-full-window (energy, peak) structs of a binary column. */
  def binaryWindows(payload: Column, winBytes: Int): Column =
    ColumnBridge.column(BinaryWindowStats(ColumnBridge.expression(payload), winBytes))
}
