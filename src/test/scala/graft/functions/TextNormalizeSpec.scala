package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the native Unicode normalization pair: NFC composes decomposed
  * sequences (and is idempotent), the accent fold strips combining marks
  * from either representation, NULLs pass through, and both are reachable
  * from SQL via GraftExtensions.
  */
class TextNormalizeSpec extends SparkTestBase {

  private val composed = "caf\u00e9"      // precomposed
  private val decomposed = "cafe\u0301"   // e + combining acute

  test("NFC composes decomposed input, is a no-op on composed input, and is idempotent") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "s")
    val got = df.select(col("id"), TextNormalize.nfc(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == composed, "NFC must compose e+U+0301 into U+00E9")
    assert(got(2L) == composed)
    val twice = df.select(TextNormalize.nfc(TextNormalize.nfc(col("s"))).as("n"))
      .as[String].collect().toSet
    assert(twice == Set(composed))
  }

  test("accent fold strips combining marks from either representation; NULL passes through") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, Some(decomposed)), (2L, Some(composed)),
      (3L, Some("niño strasse")), (4L, None))
      .toDF("id", "s")
    val got = df.select(col("id"), TextNormalize.unaccent(col("s")).as("u"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("cafe") && got(2L).contains("cafe"))
    assert(got(3L).contains("nino strasse"))
    assert(got(4L).isEmpty, "NULL in must be NULL out")
  }

  test("SQL registration: graft_nfc / graft_unaccent work from spark.sql") {
    val got = spark.sql(
      s"SELECT graft_nfc('$decomposed') AS n, graft_unaccent('$decomposed') AS u")
      .collect().head
    assert(got.getString(0) == composed)
    assert(got.getString(1) == "cafe")
  }

  test("normalization before hashing: the dedup motivation (same text, different bytes, one hash)") {
    val session = spark
    import session.implicits._
    val df = Seq(composed, decomposed).toDF("s")
    assert(df.select(md5(col("s"))).distinct().count() == 2,
      "raw byte hashes must differ (the trap)")
    assert(df.select(md5(TextNormalize.nfc(col("s")))).distinct().count() == 1,
      "NFC-normalized hashes must collapse to one")
  }
}
