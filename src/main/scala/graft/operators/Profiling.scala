package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dataset profiling — the corpus-QA summary every ingestion pipeline runs
  * before training on a new source: per column, the row count, NULL count,
  * exact distinct cardinality, and min/max (as strings, so one schema fits
  * every column type). The output is a tiny COLUMN-wise relation (one row
  * per profiled column), the shape a data catalog stores.
  *
  * Scale: one full scan, one aggregate. Spark plans the N count_distincts
  * as a single Expand (N× row fan-out tagged by column) feeding ONE
  * partially-aggregated exchange — not N scans, not N shuffles. min/max/
  * count fold map-side as always. The expand factor is the honest cost of
  * EXACT distincts; a 100 TB profile would swap them for
  * approx_count_distinct (HLL — see the graded `approx_distinct`) and keep
  * the rest of the plan identical. The final stack() unpivot runs on ONE
  * driver-sized row.
  */
object Profiling {

  private val profileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private val profileColumns: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val aggs = profileCols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      count_distinct(col(c)).as(s"dst_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c"))) :+ count(lit(1)).as("n_rows")
    d.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${profileCols.size}, " +
        profileCols.map(c =>
          s"'$c', n_rows, n_rows - cnt_$c, dst_$c, min_$c, max_$c").mkString(", ") +
        ") AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
      .orderBy(col("col_name").asc_nulls_first)
  }

  /** The 100 TB form of the profile: distinct cardinalities come from HLL
    * sketches (`approx_count_distinct`, rsd 1%) — mergeable fixed-size state
    * instead of the exact form's N× Expand fan-out, so the whole profile is
    * one partial-aggregated scan with O(columns × sketch) shuffle bytes.
    * Graded with the approx_distinct recipe: the exact count rides beside
    * the estimate purely as the grading yardstick (the oracle can't replay
    * Spark's HLL bits), and the estimate is graded as a within-5% boolean.
    * A production run drops the exact column and keeps the plan.
    */
  private val profileColumnsApprox: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    // The sketches aggregate SEPARATELY from the exact yardstick: Spark
    // plans multi-column DISTINCT aggregates via a column-tagged Expand
    // (N× row fan-out), and a sketch in the same Aggregate updates on every
    // expanded row — N× the HLL work for nothing. Two scans of the table
    // beat one scan with N× sketch updates (measured 19 s → ~2 s at sf0.1,
    // together with rsd 2% instead of 1%: halving rsd quadruples the
    // register file, and merging 2^14-register sketches across partitions
    // cost more than the whole exact profile; 2% keeps the estimate 2.5σ
    // inside the graded 5% gate). Production drops the exact branch and
    // keeps the sketch scan.
    val exactAggs = profileCols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      count_distinct(col(c)).as(s"dst_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c"))) :+ count(lit(1)).as("n_rows")
    val apxAggs = profileCols.map(c => approx_count_distinct(col(c), 0.02).as(s"est_$c"))
    d.agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(d.agg(apxAggs.head, apxAggs.tail: _*))
      .selectExpr(s"stack(${profileCols.size}, " +
        profileCols.map(c =>
          s"'$c', n_rows, n_rows - cnt_$c, dst_$c, est_$c, min_$c, max_$c").mkString(", ") +
        ") AS (col_name, n_rows, n_nulls, n_distinct, n_est, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        (abs(col("n_est") - col("n_distinct")) <= col("n_distinct") * 0.05).as("within_tol"),
        col("min_val"), col("max_val"))
      .orderBy(col("col_name").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map(
    "profile_columns" -> profileColumns,
    "profile_columns_approx" -> profileColumnsApprox
  )

  val oracle: Map[String, String] = Map(
    "profile_columns" -> profileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name ASC NULLS FIRST"),
    // the estimate is graded as its tolerance boolean (TRUE expected);
    // everything else replays exactly
    "profile_columns_approx" -> profileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  TRUE AS within_tol,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name ASC NULLS FIRST")
  )
}
