package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.streaming.JdbcUpsertSink

/** The JDBC boundary graded end-to-end in the correctness gate: a table is
  * pushed through the real Derby JDBC driver (staging INSERTs +
  * transactional MERGE — JdbcUpsertSink, the reference's psycopg2 boundary
  * `connect.py:8-14` / `agency.py:26-37`) and read back through Spark's JDBC
  * SOURCE. The oracle is simply the original table: a hash match proves the
  * full write-then-read JDBC round trip preserves every row, column, and
  * value bit-exactly (BIGINT/DOUBLE/VARCHAR through java.sql get/set).
  *
  * Derby reports column names upper-case; the read-back re-aliases to the
  * original names so the driver's by-name column compare lines up.
  */
object JdbcSource {

  private val jdbcRoundtrip: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
    val work = graft.Scratch.dir("graft-jdbc-rt")
    val url = s"jdbc:derby:$work/db;create=true"
    val sink = new JdbcUpsertSink(url, "customer_rt", Seq("c_custkey"), cust.schema)
    sink.merge(cust, batchId = 0L)
    val back = s.read.format("jdbc")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("url", url).option("dbtable", "customer_rt").load()
    back.select(cust.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  val queries: Map[String, Q] = Map("jdbc_roundtrip" -> jdbcRoundtrip)

  val oracle: Map[String, String] = Map(
    "jdbc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin
  )
}
