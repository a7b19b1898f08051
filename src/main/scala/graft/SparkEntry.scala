package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.TaxiQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in [[queries]] has a DuckDB oracle in [[oracleSql]] (same
  * column names, total ORDER BY) unless noted; the driver hash-compares them
  * at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TaxiQueries.q1Tumble(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_rides" -> (TaxiQueries.srcRides _),
    "q1_tumble" -> (TaxiQueries.q1Tumble _),
    "q2_tumble_sql" -> (TaxiQueries.q2TumbleSql _),
    "q3_over_window" -> (TaxiQueries.q3OverWindow _),
    "q3_over_daily" -> (TaxiQueries.q3OverDaily _),
    "q4_cnt_freq" -> (TaxiQueries.q4CntFreq _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "src_rides" -> TaxiQueries.srcRidesOracleSql,
    "q1_tumble" -> TaxiQueries.q1OracleSql,
    "q2_tumble_sql" -> TaxiQueries.q2OracleSql,
    "q3_over_window" -> TaxiQueries.q3OracleSql,
    "q3_over_daily" -> TaxiQueries.q3DailyOracleSql,
    "q4_cnt_freq" -> TaxiQueries.q4OracleSql,
  )
}
