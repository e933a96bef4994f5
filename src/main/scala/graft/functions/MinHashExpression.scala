package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fused MinHash signature: for K XOR-permutation seeds, computes
  * `[min(h ⊕ seed_0), …, min(h ⊕ seed_{K-1})]` in ONE pass over the input
  * hash array — semantically identical to K separate
  * `array_min(transform(hs, h -> h ⊕ seed_k))` passes (DedupText's shape,
  * mirrored by the DuckDB oracle), but with one loop, no K intermediate
  * arrays, and no per-element lambda dispatch. The dedup pipeline evaluates
  * this over every document's shingle set — the hottest kernel after md5
  * itself.
  *
  * NULL semantics match the composition: NULL input array → NULL; a NULL
  * element → that element is ignored by array_min (array_min skips nulls);
  * an empty array → all-NULL signature (array_min of empty is NULL).
  *
  * `rots` (optional, per-component 60-bit LEFT-rotation amounts applied to
  * h BEFORE the xor) exists because xor alone is an ORDER-STRUCTURE-
  * PRESERVING family: every component's argmin is decided by the same
  * high-bit prefix trie of the ONE underlying hash realization, so band
  * collisions are strongly correlated ACROSS bands and pair-level recall
  * falls well short of the 1−(1−J^r)^b theory at high r (measured on a
  * 256k-doc planted corpus: mixed recall 0.535 vs 0.73 theory at r=8, b=4).
  * Rotating h by a per-band amount gives each band its own trie — an
  * independent quenched structure — and restores the theory rate
  * (measured 0.725 with rotations, same corpus/geometry) at the cost of
  * two shifts and an OR per component. Empty `rots` = all zeros = the
  * plain xor family.
  */
case class MinHashSignature(child: Expression, seeds: Seq[Long],
                            rots: Seq[Int] = Seq.empty) extends UnaryExpression {
  require(rots.isEmpty || rots.length == seeds.length,
    "rots must be empty or one rotation per seed")
  require(rots.forall(k => k >= 0 && k < 60), "rotations must be in [0, 60)")

  /** Effective per-component rotations (empty input → all zero). */
  private def effRots: Array[Int] =
    if (rots.isEmpty) Array.fill(seeds.length)(0) else rots.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = seeds.length
    val rot = effRots
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val r = rot(j)
          val hr = if (r == 0) h
            else ((h & ((1L << (60 - r)) - 1)) << r) | (h >>> (60 - r))
          val v = hr ^ seeds(j); if (v < mins(j)) mins(j) = v; j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(Long.box))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds.toArray, "long[]")
    val rotsRef = ctx.addReferenceObj("rots", effRots, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int $k = $seedsRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $any = true;
         |    long $h = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      int $v$j = $rotsRef[$j];
         |      long $v = ($v$j == 0 ? $h
         |        : (($h & ((1L << (60 - $v$j)) - 1)) << $v$j) | ($h >>> (60 - $v$j)));
         |      $v = $v ^ $seedsRef[$j];
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |Object[] $out = new Object[$k];
         |for (int $j = 0; $j < $k; $j++) $out[$j] = $any ? (Object) $mins[$j] : null;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpression {
  /** Column entry point: minhash signature array for the given seeds. */
  def minhash(hashes: Column, seeds: Seq[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), seeds))

  /** Signature with per-component pre-xor rotations (band decorrelation). */
  def minhash(hashes: Column, seeds: Seq[Long], rots: Seq[Int]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), seeds, rots))
}
