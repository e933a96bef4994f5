package graft.streaming

import org.apache.spark.sql.types._

/** Child-process driver for the JdbcSinkSpec two-process drive: a REAL
  * second JVM pointed at the same embedded Derby database directory. No
  * SparkSession — the contract under test (a second concurrent merger
  * fails loud BEFORE touching staging) trips at the JDBC connection, which
  * `ensureTables()` reaches without a DataFrame in sight.
  *
  * Prints `CONNECTED` if the engine let it in (the spec treats that as a
  * failure while the parent holds the database booted) or `LOST <the full
  * SQLException chain>` — embedded Derby's dual-boot refusal surfaces as
  * XJ040 caused by XSDB6, and the spec asserts on that marker.
  */
object JdbcDriveMain {
  def main(args: Array[String]): Unit = {
    val url = args(0)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val sink = new JdbcUpsertSink(url, "t2p", Seq("id"), schema)
    try {
      sink.ensureTables()
      println("CONNECTED")
    } catch { case e: Throwable =>
      // Derby chains detail via BOTH getCause and SQLException.getNextException
      // depending on the path — walk both.
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty
        else t +: (chain(t.getCause) ++ (t match {
          case s: java.sql.SQLException => chain(s.getNextException)
          case _ => Seq.empty
        })).take(8)
      val all = chain(e).distinct
      val states = all.collect { case s: java.sql.SQLException => s.getSQLState }.mkString(",")
      val msgs = all.map(t => Option(t.getMessage).getOrElse(t.getClass.getName)).mkString(" | ")
      println(s"LOST [$states] $msgs")
    }
  }
}
