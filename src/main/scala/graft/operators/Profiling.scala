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

  val queries: Map[String, Q] = Map(
    "profile_columns" -> profileColumns
  )

  val oracle: Map[String, String] = Map(
    "profile_columns" -> profileCols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name ASC NULLS FIRST")
  )
}
