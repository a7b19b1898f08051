package graft.functions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._

/** NYC grid constants.
  *
  * Same values as the reference's `NycConstants`
  * (/root/reference/src/main/scala/com/dataartisans/table/demo/TaxiFunctions.scala:25-37).
  * Note the reference declares these as `Double` (no `f` suffix), so all its
  * "Float" UDF arithmetic actually runs in Double after JVM numeric promotion —
  * we reproduce exactly that: promote Float inputs to Double, compute in Double,
  * truncate to Float/Int only where the reference does.
  */
object Nyc {
  val LonEast: Double = -73.7
  val LonWest: Double = -74.05
  val LatNorth: Double = 41.0
  val LatSouth: Double = 40.5
  val DeltaLon: Double = 0.0014
  val DeltaLat: Double = 0.00125
  val GridX: Int = 250
}

/** Geo point; `toString` renders "lat,lon" (reference
  * ElasticUpsertTableSink.scala:156-158 uses this rendering as the ES geo_point
  * wire format).
  */
case class GeoPoint(lon: Float, lat: Float) {
  override def toString: String = s"$lat,$lon"
}

/** The six scalar functions of the reference
  * (TaxiFunctions.scala:39-90, ElasticUpsertTableSink.scala:150-154), each as a
  * native codegen-friendly `Column` expression (preferred: stays inside
  * WholeStageCodegen, pushdown-eligible) plus a by-name UDF registration for
  * SQL parity with the reference's `tEnv.registerFunction` surface
  * (TaxiRideQueries.scala:39-43).
  */
object Taxi {

  // ---- native Column implementations (codegen'd, no UDF overhead) ----

  /** Bounding-box test (reference TaxiFunctions.scala:39-45). */
  def inNyc(lon: Column, lat: Column): Column = {
    val lonD = lon.cast("double")
    val latD = lat.cast("double")
    !(lonD > Nyc.LonEast || lonD < Nyc.LonWest) &&
      !(latD > Nyc.LatNorth || latD < Nyc.LatSouth)
  }

  /** (lon, lat) -> grid cell id (reference TaxiFunctions.scala:47-57).
    * floor((|LON_WEST| - |lon|)/DELTA_LON) + floor((LAT_NORTH - lat)/DELTA_LAT)*250,
    * computed in Double exactly like the reference (Float args promote).
    */
  def toCellId(lon: Column, lat: Column): Column = {
    val x = floor((lit(math.abs(Nyc.LonWest)) - abs(lon.cast("double"))) / Nyc.DeltaLon).cast("int")
    val y = floor((lit(Nyc.LatNorth) - lat.cast("double")) / Nyc.DeltaLat).cast("int")
    (x + y * Nyc.GridX).as("cell")
  }

  /** cell id -> cell-center longitude, Float (reference TaxiFunctions.scala:59-76). */
  def cellLon(cell: Column): Column = {
    val xIdx = cell % Nyc.GridX
    ((lit(math.abs(Nyc.LonWest)) - xIdx * Nyc.DeltaLon - lit(Nyc.DeltaLon) / 2) * -1.0)
      .cast("float")
  }

  /** cell id -> cell-center latitude, Float (reference TaxiFunctions.scala:72-75). */
  def cellLat(cell: Column): Column = {
    val yIdx = floor(cell / Nyc.GridX).cast("int")
    (lit(Nyc.LatNorth) - yIdx * Nyc.DeltaLat - lit(Nyc.DeltaLat) / 2).cast("float")
  }

  /** cell id -> (lon, lat) struct, mirroring the reference's (Float, Float)
    * tuple result with fields _1/_2 (TaxiFunctions.scala:59-80).
    */
  def toCoords(cell: Column): Column =
    struct(cellLon(cell).as("_1"), cellLat(cell).as("_2"))

  /** coords struct -> GeoPoint struct (lon, lat). Reference toGeoPoint
    * (ElasticUpsertTableSink.scala:150-154); the tuple-input overload is the
    * one the queries use.
    */
  def toGeoPoint(coords: Column): Column =
    struct(coords.getField("_1").as("lon"), coords.getField("_2").as("lat"))

  /** (lon, lat) column pair -> GeoPoint struct — the reference's
    * (Float, Float) / (Double, Double) scalar overloads
    * (ElasticUpsertTableSink.scala:151-153). Inputs compute in Double and
    * truncate to Float exactly like the reference's promotion semantics.
    */
  def toGeoPoint(lon: Column, lat: Column): Column =
    struct(lon.cast("double").cast("float").as("lon"),
      lat.cast("double").cast("float").as("lat"))

  /** GeoPoint rendered as the "lat,lon" string the reference sink emits
    * (ElasticUpsertTableSink.scala:156-158).
    */
  def geoPointString(coords: Column): Column =
    concat_ws(",", coords.getField("_2").cast("string"), coords.getField("_1").cast("string"))

  /** millis-since-midnight, name notwithstanding (reference TaxiFunctions.scala:82-85). */
  def hourOfDay(tsMillis: Column): Column = tsMillis % (24L * 60 * 60 * 1000)

  /** Timestamp -> epoch millis (reference TaxiFunctions.scala:87-90). Flink's
    * cast(timestamp AS LONG) is also millis; Spark's cast is SECONDS, so all
    * engine code must use this (unix_millis) — see SURVEY §7.4.
    */
  def toLong(ts: Column): Column = unix_millis(ts)

  // ---- scalar (driver-side / test) versions, exact reference semantics ----

  def inNycScalar(lon: Float, lat: Float): Boolean =
    !(lon > Nyc.LonEast || lon < Nyc.LonWest) && !(lat > Nyc.LatNorth || lat < Nyc.LatSouth)

  def toCellIdScalar(lon: Float, lat: Float): Int = {
    val x = math.floor((math.abs(Nyc.LonWest) - math.abs(lon)) / Nyc.DeltaLon).toInt
    val y = math.floor((Nyc.LatNorth - lat) / Nyc.DeltaLat).toInt
    x + y * Nyc.GridX
  }

  def toCoordsScalar(cellId: Int): (Float, Float) = {
    val xIndex = cellId % Nyc.GridX
    val yIndex = (cellId - xIndex) / Nyc.GridX
    val lon = (math.abs(Nyc.LonWest) - xIndex * Nyc.DeltaLon - Nyc.DeltaLon / 2) * -1.0
    val lat = Nyc.LatNorth - yIndex * Nyc.DeltaLat - Nyc.DeltaLat / 2
    (lon.toFloat, lat.toFloat)
  }

  /** Scalar forms of the reference's toGeoPoint overloads
    * (ElasticUpsertTableSink.scala:151-153).
    */
  def toGeoPointScalar(lon: Float, lat: Float): GeoPoint = GeoPoint(lon, lat)
  def toGeoPointScalar(lon: Double, lat: Double): GeoPoint =
    GeoPoint(lon.toFloat, lat.toFloat)

  // ---- SQL registration (reference TaxiRideQueries.scala:39-43 parity) ----

  // one registration per live session: registerAll is reached from both
  // EngineSession and the SQL query paths, and a blind re-register makes
  // SimpleFunctionRegistry warn "function X replaced" on every bench run.
  // Weak keys so a dropped session doesn't pin the guard entry.
  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Registers inNyc/toCellId/toCoords/toGeoPoint/toLong/hourOfDay by name for
    * `spark.sql` use. Idempotent per session. The whole check-register-mark
    * runs under one lock and the session is marked only AFTER registration
    * succeeds: marking first would let a concurrent caller proceed against
    * still-missing functions, and a registration failure would poison the
    * guard for the session's lifetime.
    */
  def registerAll(spark: SparkSession): Unit = registeredSessions.synchronized {
    if (!registeredSessions.contains(spark)) {
      spark.udf.register("inNyc", (lon: Float, lat: Float) => inNycScalar(lon, lat))
      spark.udf.register("toCellId", (lon: Float, lat: Float) => toCellIdScalar(lon, lat))
      spark.udf.register("toCoords", (cellId: Int) => toCoordsScalar(cellId))
      spark.udf.register("toGeoPoint", (r: Row) => GeoPoint(r.getFloat(0), r.getFloat(1)))
      spark.udf.register("toLong", (ts: java.sql.Timestamp) => ts.getTime)
      spark.udf.register("hourOfDay", (ts: Long) => ts % (24L * 60 * 60 * 1000))
      registeredSessions.add(spark)
      ()
    }
  }
}
