package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dedup-verify hot path: exact Jaccard
  * similarity of two string arrays in ONE fused pass.
  *
  * Semantically identical to the built-in composition
  * `size(array_intersect(a, b)).cast(double) / size(array_union(a, b))` —
  * distinct semantics on both sides, null elements count as members — so
  * oracle parity is untouched (JaccardExprSpec pins bit-equality). The one
  * divergence is deliberate: two EMPTY sets yield NULL here where the
  * ANSI-mode builtin raises DIVIDE_BY_ZERO — the dedup pipeline always
  * filters empty shingle sets before verification, and NULL (similarity
  * undefined) is the total extension of that contract, never a wrong
  * number. The built-in form walks both arrays four
  * times and materializes two intermediate arrays per row; candidate
  * verification runs this over every LSH candidate pair, so the fused
  * two-hash-set evaluation is the kernel worth owning natively (the same
  * preference order as DotProduct/MinHashSignature: built-ins where free, a
  * codegen'd Expression where hot — SURVEY §2.9).
  *
  * Null semantics: NULL input array → NULL row result (nullSafeEval), the
  * same as the composition.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  // the two set-element types the dedup family uses: raw shingle strings
  // and their 60-bit hashes
  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (StringType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left), elemOf(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<STRING> or two ARRAY<BIGINT> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val longElems = elemOf(left).contains(LongType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    def elem(arr: ArrayData, i: Int): Any =
      if (arr.isNullAt(i)) null
      else if (longElems) java.lang.Long.valueOf(arr.getLong(i))
      else arr.getUTF8String(i)
    val setA = new java.util.HashSet[Any]()
    var i = 0
    while (i < a.numElements()) {
      setA.add(elem(a, i))
      i += 1
    }
    val setB = new java.util.HashSet[Any]()
    i = 0
    while (i < b.numElements()) {
      setB.add(elem(b, i))
      i += 1
    }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) inter += 1
    val union = setA.size + setB.size - inter
    if (union == 0) null else inter.toDouble / union
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val setA = ctx.freshName("setA")
      val setB = ctx.freshName("setB")
      val inter = ctx.freshName("inter")
      val it = ctx.freshName("it")
      def getter(arr: String): String =
        if (longElems) s"(Object) java.lang.Long.valueOf($arr.getLong($i))"
        else s"(Object) $arr.getUTF8String($i)"
      s"""
         |java.util.HashSet $setA = new java.util.HashSet();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $setA.add($a.isNullAt($i) ? null : ${getter(a)});
         |}
         |java.util.HashSet $setB = new java.util.HashSet();
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  $setB.add($b.isNullAt($i) ? null : ${getter(b)});
         |}
         |int $inter = 0;
         |java.util.Iterator $it = $setB.iterator();
         |while ($it.hasNext()) { if ($setA.contains($it.next())) $inter++; }
         |int ${inter}U = $setA.size() + $setB.size() - $inter;
         |if (${inter}U == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / ${inter}U; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardExpression {
  /** Column-level entry point: exact Jaccard of two string-array columns. */
  def jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
