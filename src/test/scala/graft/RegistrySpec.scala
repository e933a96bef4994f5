package graft

import graft.SparkTestBase

/** Driver-contract mirror: the t1 smoke (flagship entry returns rows) and
  * registry invariants (every query key keeps its oracle; a silently dropped
  * oracle would downgrade that key to the weaker rows-only check).
  */
class RegistrySpec extends SparkTestBase {

  test("flagship entry returns rows at sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Empty since round 16: bpe_train_big — the last rows-only row — is now
  // graded via its BIG_P merge prefix (prefix equality pins the greedy
  // loop's determinism; see Bpe.BIG_P). Kept so any future exemption must
  // be named here explicitly rather than silently dropping its oracle.
  private val rowsOnlyByDesign = Set.empty[String]

  test("every query key has an oracle — the registry is fully graded") {
    // round 14 closed the one historic exception: now_snapshot reads an
    // injectable clock pinned to a literal in the graded query, so even
    // the wall-clock key is DuckDB-checked
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"keys silently missing an oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("every graded query constructs against sf0.001 (no phantom tables/columns)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, "/root/testdata/sf0.001").schema
      catch { case e: Throwable => fail(s"$name failed to construct: $e") }
    }
  }
}
