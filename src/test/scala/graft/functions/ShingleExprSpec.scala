package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the fused ShingleSet kernel to the declarative composition it
  * replaces (normalize → split/substring → n-gram → array_distinct), on both
  * corpus data and adversarial edge texts — the oracle mirrors the
  * composition, so kernel-vs-composition equality IS oracle parity. */
class ShingleExprSpec extends SparkTestBase {

  private def normText = regexp_replace(lower(trim(col("text"))), "\\s+", " ")

  // the exact pre-kernel declarative forms (DedupText's old wordShingleSet /
  // shingledChars), kept here as the reference implementation
  private def wordRef = {
    val t = split(normText, " ")
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }
  private def charRef(n: Int) = {
    val nt = normText
    when(length(nt) >= n,
      array_distinct(transform(sequence(lit(1), length(nt) - (n - 1)), i =>
        substring(nt, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private val edges = Seq(
    "",                       // empty
    "   ",                    // blank: ASCII-space trim leaves nothing
    "one",                    // under 3 tokens
    "one two",                // exactly 2 tokens
    "one two three",          // exactly 3 tokens → 1 shingle
    "a a a a a",              // heavy duplication → distinct bites
    "  Mixed   CASE \t tabs\nand newlines  ",
    "\tleading tab whitespace survives ascii trim",
    "àccénts ÜBER ünïcode droit español français",
    "a b c a b c a b c",      // repeated shingles
    "x" * 500,                // one huge token
    ("tok " * 200).trim       // many tokens
  )

  private def corpus = {
    val session = spark
    import session.implicits._
    edges.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .unionByName(
        graft.Tables(spark, "/root/testdata/sf0.001", "documents")
          .select((col("doc_id") + 1000).as("doc_id"), col("text")))
  }

  test("word-shingle kernel is bit-equal to the declarative composition") {
    val diff = corpus
      .withColumn("k", ShingleExpression.wordShingles(col("text"), 3))
      .withColumn("r", wordRef)
      .filter(!(col("k") <=> col("r")))
    assert(diff.count() === 0)
  }

  test("char-shingle kernel is bit-equal to the declarative composition") {
    val diff = corpus
      .withColumn("k", ShingleExpression.charShingles(col("text"), 6))
      .withColumn("r", charRef(6))
      .filter(!(col("k") <=> col("r")))
    assert(diff.count() === 0)
  }

  // positional (dedupe = false) reference: same normalize/split, NO distinct
  private def wordSeqRef(n: Int) = {
    val t = split(normText, " ")
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  test("positional word-gram kernel keeps every gram in document order") {
    val diff = corpus
      .withColumn("k", ShingleExpression.wordGramSeq(col("text"), 8))
      .withColumn("r", wordSeqRef(8))
      .filter(!(col("k") <=> col("r")))
    assert(diff.count() === 0)
    // and duplication is really preserved: the repeated-shingle edge doc has
    // more positional 3-grams than distinct ones
    val rep = corpus.filter(col("text") === "a b c a b c a b c")
      .select(size(ShingleExpression.wordGramSeq(col("text"), 3)).as("all"),
        size(ShingleExpression.wordShingles(col("text"), 3)).as("dist"))
      .head()
    assert(rep.getInt(0) === 7)
    assert(rep.getInt(1) === 3)
  }

  test("NULL text yields NULL, not an empty set") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c d"))).toDF("doc_id", "text")
      .withColumn("k", ShingleExpression.wordShingles(col("text"), 3))
    val rows = df.select(col("doc_id"), col("k").isNull.as("n")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L) === true)
    assert(rows(2L) === false)
  }

  test("interpreted and codegen paths agree") {
    val expr0 = ShingleSet(
      org.apache.spark.sql.catalyst.expressions.Literal("a b c d e  f"), 3, chars = false)
    val interp = expr0.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString).toSeq
    val session = spark
    import session.implicits._
    val codegen = Seq("a b c d e  f").toDF("text")
      .select(ShingleExpression.wordShingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(interp === codegen)
  }
}
