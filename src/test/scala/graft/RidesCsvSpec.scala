package graft

import java.nio.file.Files
import graft.sources.Rides

/** CSV wire-format parser contract (reference TaxiRide.java:91-129):
  * event-time-first column order (START rows carry (startTime, endTime) in
  * cols 3-4, END rows the reverse), empty coords -> 0.0f, 9 fields.
  */
class RidesCsvSpec extends SparkSpec {

  private def parse(lines: String*) = {
    val dir = Files.createTempDirectory("rides-csv")
    Files.writeString(dir.resolve("rides.csv"), lines.mkString("\n"))
    Rides.fromCsv(spark, dir.toString).collect().sortBy(_.getLong(0))
  }

  test("START/END time-column swap and rowtime derivation") {
    val rows = parse(
      "1,START,2013-01-01 00:00:00,2013-01-01 00:09:12,-73.99,40.75,-73.98,40.73,2",
      "1,END,2013-01-01 00:09:12,2013-01-01 00:00:00,-73.99,40.75,-73.98,40.73,2")
    assert(rows.length === 2)
    val start = rows.find(_.getBoolean(1)).get
    val end = rows.find(!_.getBoolean(1)).get
    // both events describe the same ride interval
    assert(start.getTimestamp(2) === end.getTimestamp(2)) // startTime
    assert(start.getTimestamp(3) === end.getTimestamp(3)) // endTime
    // event time: startTime for START, endTime for END
    assert(start.getAs[java.sql.Timestamp]("rowtime") === start.getTimestamp(2))
    assert(end.getAs[java.sql.Timestamp]("rowtime") === end.getTimestamp(3))
    assert(start.getTimestamp(2).getTime === 1356998400000L) // UTC parse
  }

  test("empty coordinate fields parse to 0.0f (TaxiRide.java:118-121)") {
    val rows = parse("7,START,2013-01-01 01:00:00,2013-01-01 01:05:00,,,,,1")
    assert(rows.head.getFloat(4) === 0.0f)
    assert(rows.head.getFloat(5) === 0.0f)
    assert(rows.head.getFloat(6) === 0.0f)
    assert(rows.head.getFloat(7) === 0.0f)
    assert(rows.head.getShort(8) === 1.toShort)
  }

  test("gzipped CSV reads transparently (the reference's wire format, TaxiRideSource.java:109-110)") {
    val dir = Files.createTempDirectory("rides-gz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("rides.csv.gz")))
    try out.write(
      ("1,START,2013-01-01 00:00:00,2013-01-01 00:09:12,-73.99,40.75,-73.98,40.73,2\n" +
       "1,END,2013-01-01 00:09:12,2013-01-01 00:00:00,-73.99,40.75,-73.98,40.73,2\n").getBytes)
    finally out.close()
    val rows = Rides.fromCsv(spark, dir.toString).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getBoolean(1)).toSet === Set(true, false))
    assert(rows.head.getLong(0) === 1L)
  }

  test("typed Dataset[TaxiRide] surface round-trips the derived rides") {
    val ds = graft.sources.Rides.typed(spark, Sf0001)
    val first = ds.filter(_.isStart).head()
    assert(first.rowtime === first.startTime) // event time of a START event
    assert(ds.count() === 1000) // one ride event per source event row
  }

  test("schema matches the reference POJO layout") {
    val rows = parse("1,START,2013-01-01 00:00:00,2013-01-01 00:09:12,-73.99,40.75,-73.98,40.73,2")
    val schema = Rides.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("rideId") === "bigint")
    assert(schema("isStart") === "boolean")
    assert(schema("startLon") === "float")
    assert(schema("passengerCnt") === "smallint")
    assert(rows.head.schema.fieldNames.take(9) === Rides.schema.fieldNames)
  }
}
