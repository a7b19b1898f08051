package graft

import graft.core.Tables
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the events.parquet physical-encoding drift
  * (round 12: testdata regenerated from INT64 TIMESTAMP(NANOS) to plain
  * timestamp[us], which the old unconditional nanos workaround turned into
  * an analysis error on every events-derived query). `Tables.events` must
  * read BOTH encodings to the same TimestampType column with identical
  * instants — fixtures under src/test/resources/graft/testdata hold one
  * file per encoding with the same logical rows.
  */
class TablesEncodingSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/graft/testdata/$name")
    assert(url != null, s"missing fixture dir $name")
    url.getPath
  }

  test("events loader reads plain timestamp[us] (current testdata encoding)") {
    val df = Tables.events(spark, fixture("enc_us"))
    assert(df.schema("ts").dataType === TimestampType)
    val rows = df.orderBy("event_id").collect()
    assert(rows.length === 5)
    // 1700000000000000 us = 2023-11-14T22:13:20Z; session TZ is UTC.
    assert(rows.head.getTimestamp(rows.head.fieldIndex("ts")).toInstant.toString
      === "2023-11-14T22:13:20Z")
  }

  test("events loader reads legacy INT64 TIMESTAMP(NANOS) via div-1000 path") {
    val df = Tables.events(spark, fixture("enc_nanos"))
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() === 5)
  }

  test("both encodings yield identical instants (ns fixture has +123ns, floored away)") {
    val us = Tables.events(spark, fixture("enc_us"))
      .orderBy("event_id").collect().map(_.getTimestamp(0).getTime)
    val ns = Tables.events(spark, fixture("enc_nanos"))
      .orderBy("event_id").collect().map(_.getTimestamp(0).getTime)
    assert(us.toSeq === ns.toSeq)
  }

  test("reading current encoding never touches the nanosAsLong session conf") {
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    Tables.events(spark, fixture("enc_us")).count()
    assert(!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
  }

  test("a raw-INT64 ts file is refused loudly, never silently div-1000'd") {
    // a future testdata generation storing ts as a PLAIN int64 column
    // (raw micros, say) also reads as LongType — but WITHOUT the
    // TIMESTAMP(NANOS) fallback firing. Guessing a divisor would corrupt
    // every instant 1000x with no error; the loader must refuse instead.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val dir = java.nio.file.Files.createTempDirectory("enc_raw").toString
    spark.range(5)
      .selectExpr("id AS event_id", "1700000000000000 + id AS ts",
        "id AS user_id", "'click' AS event_type", "CAST(id AS DOUBLE) AS value")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("refusing to guess"), e.getMessage)
    // the refusal is PER-FILE (parquet footer), not session-conf state:
    // even after a legacy NANOS read has set nanosAsLong (under which a
    // raw-INT64 file reads as LongType with no exception — the old
    // heuristic's documented hole), the footer says there is no timestamp
    // annotation and the loader still refuses
    Tables.events(spark, fixture("enc_nanos")).count() // sets the conf
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
    val e2 = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e2.getMessage.contains("refusing to guess"), e2.getMessage)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }

  test("live testdata events reads clean at sf0.001") {
    val df = Tables.events(spark, Sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("schema preflight is clean on live testdata and names drifted columns") {
    assert(Tables.preflight(spark, Sf0001) === Nil)
    // a dir where `events` has the wrong shape: point at the fixture dir
    // (its events.parquet lacks user_id/event_type/value) — every problem
    // line is named table.column, not an opaque analysis error
    val problems = Tables.preflight(spark, fixture("enc_us"))
    assert(problems.exists(_.contains("events.user_id missing")), problems.mkString("; "))
    assert(problems.exists(_.startsWith("preflight: region failed to load")))
  }
}
