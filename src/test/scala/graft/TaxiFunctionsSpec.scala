package graft

import org.apache.spark.sql.functions._
import graft.functions.{Nyc, Taxi}

/** Property tests for the six reference scalar functions
  * (reference semantics: TaxiFunctions.scala:25-90).
  */
class TaxiFunctionsSpec extends SparkSpec {

  test("inNyc boundary semantics match reference (closed box, float-promotion edges)") {
    // Exactly-representable floats on the lat edges are inside:
    assert(Taxi.inNycScalar(-74.0f, 40.5f))
    assert(Taxi.inNycScalar(-74.0f, 41.0f))
    // The lon corners are NOT representable as floats: -74.05f rounds below
    // the double constant -74.05 and -73.7f rounds above -73.7, so both
    // literal corners are excluded — the reference (Float args vs Double
    // NycConstants, TaxiFunctions.scala:25-44) behaves identically.
    assert(!Taxi.inNycScalar(-74.05f, 40.7f))
    assert(!Taxi.inNycScalar(-73.7f, 40.7f))
    assert(!Taxi.inNycScalar(-73.69f, 40.7f)) // east of box
    assert(!Taxi.inNycScalar(-74.06f, 40.7f)) // west
    assert(!Taxi.inNycScalar(-74.0f, 40.49f)) // south
    assert(!Taxi.inNycScalar(-74.0f, 41.01f)) // north
  }

  test("toCellId -> toCoords round trip: center lands in the same cell") {
    val rnd = new scala.util.Random(7452) // seeded like the reference's disorder sim
    (0 until 5000).foreach { _ =>
      val lon = (Nyc.LonWest + rnd.nextDouble() * (Nyc.LonEast - Nyc.LonWest)).toFloat
      val lat = (Nyc.LatSouth + rnd.nextDouble() * (Nyc.LatNorth - Nyc.LatSouth)).toFloat
      if (Taxi.inNycScalar(lon, lat)) {
        val cell = Taxi.toCellIdScalar(lon, lat)
        val (cLon, cLat) = Taxi.toCoordsScalar(cell)
        assert(Taxi.toCellIdScalar(cLon, cLat) === cell,
          s"center ($cLon,$cLat) of cell $cell of ($lon,$lat) maps elsewhere")
      }
    }
  }

  test("native Column implementations match scalar reference semantics") {
    import spark.implicits._
    val pts = (for (i <- 0 until 200) yield {
      val lon = (-74.05 + (i % 25) * 0.015).toFloat
      val lat = (40.5 + (i / 25) * 0.07).toFloat
      (lon, lat)
    }).toDF("lon", "lat")
    val rows = pts.select(
      col("lon"), col("lat"),
      Taxi.inNyc(col("lon"), col("lat")).as("in"),
      Taxi.toCellId(col("lon"), col("lat")).as("cell")).collect()
    rows.foreach { r =>
      val (lon, lat) = (r.getFloat(0), r.getFloat(1))
      assert(r.getBoolean(2) === Taxi.inNycScalar(lon, lat))
      assert(r.getInt(3) === Taxi.toCellIdScalar(lon, lat))
    }
  }

  test("cell center columns match scalar toCoords") {
    import spark.implicits._
    val cells = (0 until 250 * 400 by 997).toDF("cell")
    cells.select(col("cell"), Taxi.cellLon(col("cell")), Taxi.cellLat(col("cell")))
      .collect().foreach { r =>
        val (lon, lat) = Taxi.toCoordsScalar(r.getInt(0))
        assert(r.getFloat(1) === lon)
        assert(r.getFloat(2) === lat)
      }
  }

  test("toLong is epoch millis (Flink cast semantics), not seconds") {
    import spark.implicits._
    val df = Seq("2013-01-01 00:00:01").toDF("s")
      .select(Taxi.toLong(to_timestamp(col("s"))).as("ms"))
    assert(df.head().getLong(0) === 1356998401000L)
  }

  test("hourOfDay is millis-since-midnight (reference name notwithstanding)") {
    import spark.implicits._
    val df = Seq(86400000L + 3723004L).toDF("ms")
      .select(Taxi.hourOfDay(col("ms")).as("h"))
    assert(df.head().getLong(0) === 3723004L)
  }

  test("toGeoPoint overloads: struct, (lon,lat) column pair, and scalars agree") {
    import spark.implicits._
    // reference overload set: Tuple2 (the one the queries use) plus
    // (Float,Float)/(Double,Double) (ElasticUpsertTableSink.scala:150-154)
    val cells = Seq(0, 1234, 250 * 400 - 1).toDF("cell")
    cells.select(
        Taxi.toGeoPoint(Taxi.toCoords(col("cell"))).as("fromStruct"),
        Taxi.toGeoPoint(Taxi.cellLon(col("cell")), Taxi.cellLat(col("cell"))).as("fromPair"),
        col("cell"))
      .collect().foreach { r =>
        assert(r.getStruct(0) === r.getStruct(1))
        val (lon, lat) = Taxi.toCoordsScalar(r.getInt(2))
        val gp = Taxi.toGeoPointScalar(lon, lat)
        assert(r.getStruct(0).getFloat(0) === gp.lon && r.getStruct(0).getFloat(1) === gp.lat)
        // Double overload truncates to Float exactly like the reference
        assert(Taxi.toGeoPointScalar(lon.toDouble, lat.toDouble) === gp)
        // "lat,lon" wire rendering (ElasticUpsertTableSink.scala:156-158)
        assert(gp.toString === s"$lat,$lon")
      }
  }

  test("SQL-registered UDFs agree with native columns") {
    Taxi.registerAll(spark)
    val r = spark.sql(
      """SELECT inNyc(CAST(-74.0 AS FLOAT), CAST(40.75 AS FLOAT)) AS a,
        |  toCellId(CAST(-74.0 AS FLOAT), CAST(40.75 AS FLOAT)) AS b,
        |  toCoords(toCellId(CAST(-74.0 AS FLOAT), CAST(40.75 AS FLOAT)))._1 AS c""".stripMargin).head()
    assert(r.getBoolean(0) === Taxi.inNycScalar(-74.0f, 40.75f))
    assert(r.getInt(1) === Taxi.toCellIdScalar(-74.0f, 40.75f))
    assert(r.getFloat(2) === Taxi.toCoordsScalar(Taxi.toCellIdScalar(-74.0f, 40.75f))._1)
  }
}
