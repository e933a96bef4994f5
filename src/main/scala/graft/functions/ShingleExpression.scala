package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-set kernel: normalize → tokenize → n-gram → distinct in ONE
  * imperative pass per document.
  *
  * Semantically identical to the declarative composition the DuckDB oracle
  * mirrors (DedupText.shSql / chShSql):
  *
  *   norm = regexp_replace(lower(trim(text)), '\s+', ' ')
  *   word mode:  t = split(norm, ' ');
  *               n >= |t| ? [] : distinct([concat_ws(' ', t[i..i+n-1])])
  *   char mode:  |norm| < n ? [] : distinct([substring(norm, i, n)])
  *
  * and built from the SAME primitives the builtins use — UTF8String.trim
  * (ASCII-space trim), UTF8String.toLowerCase, java.util.regex for the
  * whitespace collapse, UTF8String.split for tokens, UTF8String.concatWs /
  * substringSQL for gram construction — so outputs are bit-equal
  * (ShingleExprSpec pins equality against the composition on every doc).
  *
  * Why it exists: the declarative form evaluates its lambda body once PER
  * ELEMENT, and Catalyst inlines the token-array alias back into the lambda
  * (CollapseProject substitutes aliases even through an exchange), so every
  * shingle re-ran normalize+split over the whole document — measured ~9 s
  * for 5 000 sf0.1 docs where this kernel does the same work in well under
  * a second. Same preference order as MinHashSignature/DotProduct/
  * JaccardSimilarity: built-ins where free, a native kernel where hot
  * (SURVEY §2.9).
  *
  * NULL semantics: NULL text → NULL (nullSafeEval). Distinct keeps first-
  * occurrence order, like array_distinct.
  *
  * `dedupe = false` keeps EVERY gram in document order (index = token/char
  * position), for positional consumers — duplicated-span detection needs
  * (position, gram) pairs, which a distinct set destroys.
  */
case class ShingleSet(child: Expression, n: Int, chars: Boolean,
                      dedupe: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    (if (chars) "graft_char_" else "graft_word_") +
      (if (dedupe) "shingles" else "grams")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** Invoked from generated code too — must stay public. */
  def kernel(raw: UTF8String): GenericArrayData = {
    // trim (ASCII space, like StringTrim) → lower (UTF8String casing, like
    // Lower) → collapse runs of whitespace (java regex, like RegExpReplace)
    val norm = UTF8String.fromString(
      ShingleSet.WS.matcher(raw.trim().toLowerCase().toString).replaceAll(" "))
    // LinkedHashSet dedups in first-occurrence order; ArrayList keeps all
    // grams positionally. Both expose java.util.Collection.
    val out: java.util.Collection[UTF8String] =
      if (dedupe) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String]()
    if (chars) {
      // One linear pass over the bytes. substringSQL(i, n) per gram would
      // rescan from the string START to locate char i every call — O(len²)
      // bytes per document, measured 6.4 cpu-ms/doc on ~1.7 KB docs (the
      // whole char-lane bottleneck at 500k+ docs). Char-boundary byte
      // offsets make each gram a zero-copy fromBytes window: same bytes,
      // bit-equal values (ShingleExprSpec pins equality per doc).
      val len = norm.numChars()
      if (len >= n) {
        val bytes = norm.getBytes
        val offs = new Array[Int](len + 1)
        var c = 0
        var b = 0
        while (c < len) {
          offs(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        offs(len) = b
        var i = 0
        while (i + n <= len) {
          out.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
          i += 1
        }
      }
    } else {
      val toks = norm.split(ShingleSet.SPACE, -1)
      val sep = ShingleSet.SPACE
      var i = 0
      while (i <= toks.length - n) {
        var g = toks(i)
        var j = 1
        while (j < n) { g = UTF8String.concat(g, sep, toks(i + j)); j += 1 }
        out.add(g)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleSet", this, classOf[ShingleSet].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val SPACE = UTF8String.fromString(" ")
}

object ShingleExpression {
  /** Distinct word n-gram set of `text` (normalized), [] under n tokens. */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), n, chars = false))

  /** Distinct character n-gram set of `text` (normalized), [] under n chars. */
  def charShingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), n, chars = true))

  /** ALL word n-grams of `text` in document order (array index = 0-based
    * token position) — the positional feed for span-level dedup. */
  def wordGramSeq(text: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleSet(ColumnBridge.expression(text), n, chars = false, dedupe = false))
}
