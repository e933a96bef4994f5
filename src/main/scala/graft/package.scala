import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A graded query: (session, scale-factor dir) => result frame. */
  type Q = (SparkSession, String) => DataFrame
}
