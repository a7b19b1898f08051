package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (/root/repo/TESTDATA.md).
  * Mirrors the reference's catalog-registration step
  * (TaxiRideQueries.scala:46-48): each table is exposed both as a DataFrame
  * and as a temp view for `spark.sql`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright; read nanos as long and truncate to a
    * microsecond TimestampType column (floor, matching DuckDB's ns->us/ms
    * truncation of the same file).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // integer `div`, not `/`: ns-since-epoch (~1.7e18) exceeds double's 2^53
    // exact-integer range, so float division would corrupt low-order digits.
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table of `dir` as a temp view (idempotent, lazy scans). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
