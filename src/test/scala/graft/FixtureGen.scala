package graft

import java.nio.file.{Files, Path}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.util.Random

/** Seeded taxi-ride CSV fixture generator reproducing the reference
  * source's input contract and disorder model (SURVEY §2.1 S1/S7,
  * FIXTURES.md §A):
  *  - wire format `rideId,START|END,eventTime,otherTime,lon,lat,lon,lat,cnt`
  *    with event-time-first column order (TaxiRide.java:91-129);
  *  - emit order perturbed by a seeded Gaussian delay bounded by
  *    maxDelayMs, the reference's out-of-order simulation
  *    (TaxiRideSource.java:126-134,230-237, seed 7452);
  *  - optionally time-sliced into chunk files for file-stream replay (the
  *    batch-file analogue of the reference's proportional replay clock S8).
  */
object FixtureGen {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  case class Event(rideId: Long, isStart: Boolean, startMs: Long, endMs: Long,
                   lon: Float, lat: Float, cnt: Int) {
    def eventMs: Long = if (isStart) startMs else endMs
    def csv: String = {
      val (t1, t2) = if (isStart) (startMs, endMs) else (endMs, startMs)
      s"$rideId,${if (isStart) "START" else "END"},${fmt.format(Instant.ofEpochMilli(t1))}," +
        s"${fmt.format(Instant.ofEpochMilli(t2))},$lon,$lat,$lon,$lat,$cnt"
    }
  }

  /** Gaussian delay in [0, maxDelayMs] (reference getNormalDelayMsecs). */
  private def delay(rand: Random, maxDelayMs: Long): Long = {
    var d = -1L
    val x = maxDelayMs / 2
    while (d < 0 || d > maxDelayMs) {
      d = (rand.nextGaussian() * x).toLong + x
    }
    d
  }

  /** nRides rides starting at baseMs, one START + one END event each, in
    * event-time order perturbed by the seeded bounded delay.
    */
  def events(nRides: Int, baseMs: Long = 1356998400000L, // 2013-01-01 UTC
             maxDelayMs: Long = 60000L, seed: Long = 7452L): Seq[Event] = {
    val rand = new Random(seed)
    val evs = (1 to nRides).flatMap { i =>
      val start = baseMs + i * 15000L
      val dur = 60000L + rand.nextInt(600) * 1000L
      val lon = (-74.04 + rand.nextDouble() * 0.3).toFloat
      val lat = (40.55 + rand.nextDouble() * 0.4).toFloat
      val cnt = 1 + rand.nextInt(4)
      Seq(Event(i.toLong, isStart = true, start, start + dur, lon, lat, cnt),
        Event(i.toLong, isStart = false, start, start + dur, lon, lat, cnt))
    }
    // schedule by (eventTime + delay): the reference's priority-queue emit order
    evs.map(e => (e.eventMs + delay(rand, maxDelayMs), e))
      .sortBy(_._1).map(_._2)
  }

  /** Write the perturbed stream as `chunks` sequential files for
    * file-stream replay.
    */
  def writeChunks(dir: Path, evs: Seq[Event], chunks: Int): Unit = {
    val per = math.max(1, math.ceil(evs.size.toDouble / chunks).toInt)
    evs.grouped(per).zipWithIndex.foreach { case (group, i) =>
      Files.writeString(dir.resolve(f"chunk-$i%04d.csv"), group.map(_.csv).mkString("\n"))
    }
  }
}
