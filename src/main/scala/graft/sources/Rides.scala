package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** The `rides` table (reference schema: TaxiRide.java:39-69 +
  * the logical `rowtime` event-time attribute, TaxiRideTableSource.scala:30-41).
  *
  * Two sources:
  *  - [[fromCsv]]: the reference's CSV wire format
  *    (TaxiRide.java:91-129 / TaxiRideSource.java), batch or streaming.
  *  - [[fromEvents]]: a deterministic derivation from the driver's
  *    `events.parquet` so every taxi query has a DuckDB-checkable oracle over
  *    the shared testdata (there is no taxi CSV in /root/testdata). The
  *    derivation uses only arithmetic that is bit-identical between Spark and
  *    DuckDB (integer ops, IEEE-754 double ops, one final cast to float).
  */
/** Typed record matching the reference's TaxiRide POJO layout
  * (TaxiRide.java:39-69) plus the derived event-time attribute.
  */
case class TaxiRide(
    rideId: Long, isStart: Boolean,
    startTime: java.sql.Timestamp, endTime: java.sql.Timestamp,
    startLon: Float, startLat: Float, endLon: Float, endLat: Float,
    passengerCnt: Short, rowtime: java.sql.Timestamp)

object Rides {

  /** Typed Dataset surface (the reference exposes the stream as
    * DataStream[TaxiRide]; this is the Spark analogue — same engine plans,
    * compile-time field access for per-record logic).
    */
  def typed(spark: SparkSession, dir: String): Dataset[TaxiRide] = {
    import spark.implicits._
    fromEvents(spark, dir).as[TaxiRide]
  }

  /** Parsed-ride schema (FIXTURES.md §A.2). */
  val schema: StructType = StructType(Seq(
    StructField("rideId", LongType, nullable = false),
    StructField("isStart", BooleanType, nullable = false),
    StructField("startTime", TimestampType, nullable = false),
    StructField("endTime", TimestampType, nullable = false),
    StructField("startLon", FloatType, nullable = false),
    StructField("startLat", FloatType, nullable = false),
    StructField("endLon", FloatType, nullable = false),
    StructField("endLat", FloatType, nullable = false),
    StructField("passengerCnt", ShortType, nullable = false)))

  /** Event-time column (reference TaxiRideSource.java:221-228: startTime for
    * START events, endTime for END events).
    */
  private def withRowtime(df: DataFrame): DataFrame =
    df.withColumn("rowtime", when(col("isStart"), col("startTime")).otherwise(col("endTime")))

  // -------------------------------------------------------------------------
  // CSV wire format
  // -------------------------------------------------------------------------

  /** Parse the reference CSV line format
    * `rideId,START|END,time,time,lon,lat,lon,lat,cnt`:
    *  - col3 is the EVENT time, col4 the other time: START rows carry
    *    (startTime, endTime), END rows carry (endTime, startTime)
    *    (TaxiRide.java:103-116 — event-time-first column order);
    *  - empty lon/lat fields parse to 0.0f (TaxiRide.java:118-121);
    *  - timestamps `yyyy-MM-dd HH:mm:ss` in UTC (TaxiRide.java:41-42).
    * Returns the full rides schema + `rowtime`.
    */
  def parseCsvLines(raw: DataFrame): DataFrame = {
    val c = split(col("value"), ",")
    val isStart = c.getItem(1) === "START"
    val t2 = to_timestamp(c.getItem(2), "yyyy-MM-dd HH:mm:ss")
    val t3 = to_timestamp(c.getItem(3), "yyyy-MM-dd HH:mm:ss")
    // nullif before cast: ANSI mode (Spark 4 default) would otherwise throw
    // on the reference's empty-coordinate fields instead of yielding 0.0f
    def f(i: Int) = coalesce(nullif(c.getItem(i), lit("")).cast(FloatType), lit(0.0f))
    raw.select(
      c.getItem(0).cast(LongType).as("rideId"),
      isStart.as("isStart"),
      when(isStart, t2).otherwise(t3).as("startTime"),
      when(isStart, t3).otherwise(t2).as("endTime"),
      f(4).as("startLon"), f(5).as("startLat"),
      f(6).as("endLon"), f(7).as("endLat"),
      c.getItem(8).cast(ShortType).as("passengerCnt"),
      t2.as("rowtime")) // event time = col3 always (TaxiRide.java:103-116)
  }

  /** Batch read of a reference-format CSV file (optionally gzipped — Spark
    * decompresses by extension, matching TaxiRideSource.java:109-110).
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    parseCsvLines(spark.read.text(path))

  /** Streaming read of a directory of reference-format CSV chunks. The
    * watermark is applied by the consuming query (Spark forbids redefining
    * it); the demo policy is maxOutOfOrder = 60 s -> lag 61 s
    * (TaxiRideQueries.scala:48, TaxiRideSource.java:102,150,210), the
    * default in graft.streaming.StreamingQueries.
    */
  def streamFromCsv(spark: SparkSession, dir: String): DataFrame =
    parseCsvLines(spark.readStream.text(dir))

  // -------------------------------------------------------------------------
  // Deterministic derivation from events.parquet (oracle-friendly)
  // -------------------------------------------------------------------------

  /** DuckDB CTE computing the identical rides table from `events`; every
    * oracle query over rides starts with this. Kept textually next to
    * [[fromEvents]] — the two must stay in lockstep.
    */
  val oracleCte: String =
    """WITH rides AS (
      |  SELECT
      |    event_id AS ride_id,
      |    (event_id % 2 = 0) AS is_start,
      |    CAST(-74.05 + (user_id % 520) * 0.0007 AS REAL) AS start_lon,
      |    CAST(40.5 + (event_id % 540) * 0.001 AS REAL) AS start_lat,
      |    CAST(-74.05 + ((user_id + 131) % 520) * 0.0007 AS REAL) AS end_lon,
      |    CAST(40.5 + ((event_id + 77) % 540) * 0.001 AS REAL) AS end_lat,
      |    CAST(1 + event_id % 4 AS SMALLINT) AS passenger_cnt,
      |    (1 + user_id % 1800) AS dur_s,
      |    ts AS rowtime,
      |    epoch_ms(ts) AS rowtime_ms
      |  FROM events
      |)""".stripMargin

  /** Deterministic rides from `events.parquet`: ride_id = event_id, even ids
    * are START events, coordinates derived from (user_id, event_id) so most
    * fall inside the NYC box with a deliberate out-of-box tail to exercise
    * inNyc; trip duration 1..1800 s. `rowtime` (the event time) is always the
    * event's `ts`; startTime/endTime are placed around it per the event type.
    */
  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val isStart = (col("event_id") % 2) === 0
    val durUs = (lit(1L) + col("user_id") % 1800) * 1000000L
    def shifted(sign: Int) = timestamp_micros(unix_micros(col("ts")) + lit(sign) * durUs)
    ev.select(
        col("event_id").as("rideId"),
        isStart.as("isStart"),
        when(isStart, col("ts")).otherwise(shifted(-1)).as("startTime"),
        when(isStart, shifted(1)).otherwise(col("ts")).as("endTime"),
        (lit(-74.05) + (col("user_id") % 520) * 0.0007).cast(FloatType).as("startLon"),
        (lit(40.5) + (col("event_id") % 540) * 0.001).cast(FloatType).as("startLat"),
        (lit(-74.05) + ((col("user_id") + 131) % 520) * 0.0007).cast(FloatType).as("endLon"),
        (lit(40.5) + ((col("event_id") + 77) % 540) * 0.001).cast(FloatType).as("endLat"),
        (lit(1) + col("event_id") % 4).cast(ShortType).as("passengerCnt"))
      .transform(withRowtime)
  }
}
