package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Rides
import graft.streaming.StreamingQueries

/** End-to-end replay: seeded disordered CSV fixture -> file-stream source
  * -> watermarked windowed aggregation, compared against the batch engine
  * over the same rows (the goldens contract of FIXTURES.md §A.3).
  */
class ReplaySpec extends SparkSpec {

  import spark.implicits._

  test("disordered file-stream replay: streaming windowed agg == batch recompute") {
    val evs = FixtureGen.events(nRides = 300)
    val dir = Files.createTempDirectory("replay")
    FixtureGen.writeChunks(dir, evs, chunks = 5)

    // batch truth over the identical rows
    val batchDf = StreamingQueries.q1Tumble(Rides.fromCsv(spark, dir.toString))
      .select("cell", "dept_time", "dept_cnt").as[(Int, Long, Long)].collect().toSet

    val q = StreamingQueries.q1Tumble(Rides.streamFromCsv(spark, dir.toString))
      .writeStream.format("memory").queryName("replay_q1")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", Files.createTempDirectory("replayck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("replay_q1")
      .select("cell", "dept_time", "dept_cnt").as[(Int, Long, Long)].collect().toSet

    // append mode withholds windows the watermark hasn't closed; everything
    // emitted must match batch exactly, and only trailing windows may be open
    assert(streamed.subsetOf(batchDf), s"streamed-only rows: ${streamed -- batchDf}")
    val missing = batchDf -- streamed
    val maxEvent = evs.map(_.eventMs).max
    assert(missing.forall { case (_, deptTime, _) => deptTime > maxEvent - 61000 - 600000 },
      s"non-trailing windows missing from stream: $missing")
    assert(streamed.nonEmpty)
  }

  test("fixture disorder is bounded by maxDelayMs (reference contract)") {
    val evs = FixtureGen.events(nRides = 200, maxDelayMs = 60000)
    var maxSeen = Long.MinValue
    var worstLag = 0L
    evs.foreach { e =>
      if (e.eventMs < maxSeen) worstLag = math.max(worstLag, maxSeen - e.eventMs)
      maxSeen = math.max(maxSeen, e.eventMs)
    }
    assert(worstLag > 0, "fixture should actually be out of order")
    assert(worstLag <= 2 * 60000, s"disorder $worstLag exceeds the bounded-delay model")
  }
}
