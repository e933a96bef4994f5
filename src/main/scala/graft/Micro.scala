package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, sum}
import org.apache.spark.sql.types.DecimalType

/** Exact double summation with NO cross-engine rounding window.
  *
  * The engine's float-determinism rule used to be "sum doubles through an
  * exact DECIMAL(25,6) accumulator" — associative, so partial-aggregation
  * order can never change the result. The round-18 sf10 value gate showed
  * the idiom still carries an ENGINE-disagreement window: Spark converts
  * double→decimal by rounding the EXACT binary expansion
  * (BigDecimal.setScale HALF_UP) while DuckDB rounds the scaled double,
  * and a value whose expansion straddles the half-µ boundary converts
  * differently (~100 per 15M jittered values — invisible at sf1, a
  * guaranteed hash mismatch at sf10 on agg_cube/agg_grouping_sets).
  * Rounding-mode fixes (bround / half-even) just move the boundary:
  * DuckDB's double→BIGINT cast is half-away-from-zero, Spark's round
  * family works on decimal expansions.
  *
  * The fix: FLOOR at micro precision. floor(x·10⁶) is pure IEEE
  * arithmetic — one deterministic multiply, one exact floor: no rounding
  * MODE, no tie, no decimal expansion — so both engines compute the
  * identical integer; then an exact integer sum and one deterministic
  * IEEE divide. floor has no boundary at all.
  *
  * Accumulator width: the micro-units sum in DECIMAL(38,0), not BIGINT.
  * BIGINT's headroom is |Σx| ≤ 9.2e12 per group (9.2e18 µ-units), which
  * the sf100 orders global cube cell (~150M rows × ~1.5e5 avg ≈ 2.3e13)
  * already exceeds — under Spark 4's ANSI default that's an
  * ARITHMETIC_OVERFLOW at the next graded scale, while DuckDB's native
  * HUGEINT sum sails on and the engines diverge in failure mode. The
  * per-row integers are identical either way, so DECIMAL(38,0) (exact,
  * overflow-free to 10³⁸ µ-units) mirrored by DuckDB's HUGEINT keeps
  * determinism AND survives the scale-up.
  *
  * Mirror (see [[sqlSum]]): DuckDB sums the BIGINT micro-units natively
  * in HUGEINT — `CAST(sum(CAST(floor(x * 1000000.0) AS BIGINT)) AS
  * DOUBLE) / 1000000.0`.
  */
object Micro {

  /** floor(x·10⁶) as an exact DECIMAL(38,0) micro-unit integer — the
    * engine-portable per-row quantization both sides agree on bit-for-bit. */
  def micro(c: Column): Column = floor(c * lit(1e6)).cast(DecimalType(38, 0))

  /** SUM of micro-units — still in µ; compose with [[fromMicro]] (directly,
    * or after `.over(window)`). Exact and associative at any partitioning. */
  def microSum(c: Column): Column = sum(micro(c))

  /** µ-units → double value: one cast (exact integer → nearest double, the
    * identical conversion DuckDB applies to its HUGEINT sum) and one
    * deterministic IEEE divide. */
  def fromMicro(c: Column): Column = c.cast("double") / lit(1e6)

  /** The one-shot grouped form: exact double sum, no rounding window. */
  def dsumMicro(c: Column): Column = fromMicro(microSum(c))

  /** round(x, 6) with no cross-engine window, for quotients of micro-sums:
    * a µ-grained numerator divided by a small count lands systematically
    * near 1e-6 digit boundaries, where Spark's round (exact binary
    * expansion, HALF_UP) and DuckDB's (scaled-double) disagree — the
    * ts_ewma lesson, now shared: both sides scale by 10⁶ EXPLICITLY,
    * round the identical product double to an integer (no scale, so no
    * expansion-vs-scaled asymmetry), and divide back. Mirror:
    * round(x * 1000000.0) / 1000000.0. */
  def round6(c: Column): Column =
    org.apache.spark.sql.functions.round(c * lit(1e6)) / lit(1e6)

  /** DuckDB mirror of [[round6]]. */
  def sqlRound6(e: String): String = s"round(($e) * 1000000.0) / 1000000.0"

  /** DuckDB mirror of [[dsumMicro]] over SQL expression `e`. Generated from
    * one helper so the two sides can never drift. */
  def sqlSum(e: String): String =
    s"CAST(sum(CAST(floor(($e) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0"

  /** Windowed mirror: the same micro-sum OVER a named window `w`. */
  def sqlSumOver(e: String, w: String): String =
    s"CAST(sum(CAST(floor(($e) * 1000000.0) AS BIGINT)) OVER $w AS DOUBLE) / 1000000.0"
}
