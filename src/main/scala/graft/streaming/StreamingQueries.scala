package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.functions.Taxi
import graft.sinks.{MemoryUpsertSink, UpsertKeys}
import scala.collection.concurrent.TrieMap

/** Structured-Streaming forms of the reference's queries. The reference is
  * a pure streaming app (dynamic tables over an unbounded taxi-ride stream,
  * TaxiRideQueries.scala:33-37); these are the Spark-native equivalents:
  *
  *  - Q1/Q2 (tumbling-window agg): watermarked streaming aggregation —
  *    append mode emits finalized windows, update mode mirrors Flink's
  *    eagerly-updating dynamic table.
  *  - Q4 (cascaded agg): Spark forbids chained streaming aggregations; the
  *    level-1 agg runs in update mode and [[CascadeQ4]] replays its
  *    changelog into the level-2 histogram inside foreachBatch — the
  *    decrement of a cell's old count bucket IS the Flink retraction
  *    (ElasticUpsertTableSink.scala:144-146), the increment the add.
  *  - Q3 (event-time OVER window): no streaming OVER in Spark;
  *    [[OverWindowState]] keeps a per-cell time-ordered buffer in
  *    flatMapGroupsWithState, pruned below the watermark horizon.
  */
object StreamingQueries {

  /** Q1 streaming: departures per (cell, 10-min tumbling window).
    * Watermark 61 s = the demo's maxOutOfOrder 60 s + 1 ms rounded up
    * (TaxiRideSource.java:102,150,210).
    */
  def q1Tumble(rides: DataFrame, watermark: String = "61 seconds"): DataFrame =
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .select(col("rideId"), Taxi.toCellId(col("startLon"), col("startLat")).as("cell"), col("rowtime"))
      .withWatermark("rowtime", watermark)
      .groupBy(col("cell"), window(col("rowtime"), "10 minutes").as("w"))
      .agg(count(col("rideId")).as("dept_cnt"))
      .select(col("cell"),
        Taxi.cellLon(col("cell")).as("cell_lon"),
        Taxi.cellLat(col("cell")).as("cell_lat"),
        unix_millis(col("w.end")).as("dept_time"),
        col("dept_cnt"))

  /** Q7 streaming: per-cell session windows (30-min gap). Spark's native
    * streaming session_window merges partial sessions across micro-batches
    * and emits a session once the watermark passes its close — the
    * streaming twin of the batch TaxiQueries.q7Session.
    */
  def q7Session(rides: DataFrame, watermark: String = "61 seconds"): DataFrame =
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .select(col("rideId"), Taxi.toCellId(col("startLon"), col("startLat")).as("cell"), col("rowtime"))
      .withWatermark("rowtime", watermark)
      .groupBy(col("cell"), session_window(col("rowtime"), "30 minutes").as("w"))
      .agg(count(col("rideId")).as("n_dept"))
      .select(col("cell"),
        unix_millis(col("w.start")).as("sess_start"),
        unix_millis(col("w.end")).as("sess_end"),
        col("n_dept"))

  /** Q8 streaming: watermarked stream-stream inner join pairing START and
    * END events of the same ride (pair key rideId div 2 in the synthetic
    * derivation; the reference shares rideId, TaxiRide.java:24-38). The
    * time-range condition bounds both join-state buffers: an unmatched
    * START is dropped once the watermark passes start + maxRide, an END
    * once it passes end + maxRide — without it, state grows forever.
    */
  def pairStartEnd(rides: DataFrame, watermark: String = "61 seconds",
                   maxRideMs: Long = 2L * 3600 * 1000): DataFrame = {
    val starts = rides.filter(col("isStart"))
      .select(expr("rideId div 2").as("pair_id"), col("rowtime").as("start_rt"))
      .withWatermark("start_rt", watermark)
    val ends = rides.filter(!col("isStart"))
      .select(expr("rideId div 2").as("end_pair_id"), col("rowtime").as("end_rt"))
      .withWatermark("end_rt", watermark)
    starts.join(ends,
        col("pair_id") === col("end_pair_id") &&
          col("end_rt") >= col("start_rt") - expr(s"INTERVAL ${maxRideMs / 1000} SECONDS") &&
          col("end_rt") <= col("start_rt") + expr(s"INTERVAL ${maxRideMs / 1000} SECONDS"))
      .select(col("pair_id"),
        unix_millis(col("start_rt")).as("start_ms"),
        unix_millis(col("end_rt")).as("end_ms"),
        (unix_millis(col("end_rt")) - unix_millis(col("start_rt"))).as("gap_ms"))
  }

  /** Streaming exact dedup: drop replayed/duplicate events by event key,
    * keeping state only within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — unbounded-state dedup is the
    * classic streaming-pipeline leak; bounding it by the disorder window is
    * what a replayed-at-least-once event source (like the reference's,
    * TaxiRideSource.java:162-213) actually needs. The key is
    * (rideId, isStart), NOT rideId alone: the reference data model shares
    * one rideId between a ride's START and END events (TaxiRide.java:24-38),
    * so keying on rideId would silently swallow the END of any ride shorter
    * than the watermark as a "duplicate".
    */
  def dedupEvents(rides: DataFrame, watermark: String = "61 seconds"): DataFrame =
    rides.withWatermark("rowtime", watermark)
      .dropDuplicatesWithinWatermark("rideId", "isStart")

  /** Level-1 of Q4: continuous per-cell departure count (unbounded keyed
    * agg; update-mode changelog = Flink's upsert stream on key `cell`).
    */
  def q4Level1(rides: DataFrame): DataFrame =
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .select(col("rideId"), Taxi.toCellId(col("startLon"), col("startLat")).as("cell"))
      .groupBy("cell")
      .agg(count(col("rideId")).as("dept_cnt"))
}

/** Spark analogue of Flink's `toRetractStream[Row]`
  * (TaxiRideQueries.scala:89,158): converts an update-mode keyed changelog
  * into explicit (isAdd, row) retract records — every update of a key
  * first retracts the previously-emitted row (false, old), then adds the
  * new one (true, new); first sight of a key emits only the add. This is
  * the changelog encoding the reference sink consumes
  * (Tuple2[JBool, Row], ElasticUpsertTableSink.scala:65,144-146).
  *
  * State is the last-emitted row per key. Per-batch volume is bounded by
  * the number of CHANGED keys (update mode only emits those); the state
  * map is bounded by live keys, the same footprint the in-memory sink
  * already carries — for cluster-scale state, compose with
  * [[graft.sinks.ParquetUpsertSink]] instead of a driver map.
  */
class RetractStream(keyFields: Seq[String]) extends Serializable {
  import org.apache.spark.sql.Row
  private val last = TrieMap.empty[String, Row]

  private def keyOf(row: Row): String =
    graft.sinks.KeyCodec.render(row, keyFields)

  /** Replay one update-mode micro-batch into retract records, in key order
    * for determinism. Returns the (isAdd, row) sequence it emitted.
    */
  def onBatch(batch: org.apache.spark.sql.DataFrame): Seq[(Boolean, Row)] = {
    val rows = batch.collect().sortBy(keyOf)
    rows.flatMap { row =>
      val k = keyOf(row)
      val retract = last.put(k, row).map((false, _))
      retract.toSeq :+ ((true, row))
    }.toSeq
  }
}

/** Stateful two-level cascade for Q4 (TaxiRideQueries.scala:148-167).
  *
  * Maintains the level-1 materialization (cell -> dept_cnt) and the level-2
  * histogram (dept_cnt -> cnt_freq). Each update-mode micro-batch delivers
  * the changed (cell, dept_cnt) pairs; for each, the old count's bucket is
  * decremented (retraction) and the new count's bucket incremented (add) —
  * exactly the changelog the Flink planner feeds the second aggregation.
  * Deleted buckets (freq 0) are removed from the sink, exercising the
  * (false, row) delete path of the reference sink contract.
  */
object CascadeQ4 {

  private val histSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dept_cnt", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("cnt_freq", org.apache.spark.sql.types.LongType)))

  private def histRow(bucket: Long, freq: Long): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array(bucket, freq), histSchema)

  /** Correct single-update merge, exposed for testing. */
  def applyUpdate(cellCounts: TrieMap[Int, Long], histogram: TrieMap[Long, Long],
                  cell: Int, newCnt: Long): Unit = {
    val old = cellCounts.put(cell, newCnt)
    if (old.contains(newCnt)) return // no-op update
    old.foreach { o =>
      val dec = histogram.getOrElse(o, 0L) - 1
      if (dec <= 0L) histogram.remove(o) else histogram.put(o, dec)
    }
    histogram.put(newCnt, histogram.getOrElse(newCnt, 0L) + 1L)
  }

  // --- level-2 state snapshots (restart recovery) -------------------------
  // The level-1 streaming agg recovers from the Spark checkpoint, but the
  // level-2 materialization (cellCounts) lives in driver memory. Without a
  // snapshot, a restarted query resumes level 1 mid-stream against EMPTY
  // maps, so the first post-restart update of a cell cannot retract its old
  // histogram bucket and the sink silently diverges from the batch truth.
  // We persist cellCounts after every batch BEFORE foreachBatch returns —
  // i.e. before Spark commits the batch — so on restart the snapshot is
  // always >= the committed offset; replaying the in-flight batch on top is
  // safe because applyUpdate is idempotent for repeated (cell, cnt) pairs.
  // The histogram is derivable (values grouped by count), so only cellCounts
  // is written. Hadoop FS API so checkpoint may be hdfs:// / s3a:// at scale;
  // state size is bounded by distinct cells (the 250x400 NYC grid), not data.

  private def snapDir(checkpoint: String) =
    new org.apache.hadoop.fs.Path(checkpoint, "graft-cascade-state")

  private def saveSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path,
                           batchId: Long, cells: TrieMap[Int, Long]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir, s"$batchId.tmp")
    val fin = new org.apache.hadoop.fs.Path(dir, s"$batchId.snap")
    val out = fs.create(tmp, true)
    try cells.foreach { case (c, n) => out.writeBytes(s"$c,$n\n") } finally out.close()
    // atomic publish on HDFS/local. rename can return false WITHOUT
    // throwing (dst exists, transient FS error) — failing the batch is
    // mandatory then, because a silently-stale snapshot is exactly the
    // restart divergence this machinery exists to prevent.
    if (fs.exists(fin)) fs.delete(fin, false) // batch replay republishes
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"cascade snapshot publish failed: $tmp -> $fin")
    // keep the latest two snapshots (previous one covers a torn in-flight
    // write); clear any orphaned tmp files from crashed attempts
    listSnapshots(fs, dir).dropRight(2)
      .foreach { case (id, p) => fs.delete(p, false); val _ = id }
    fs.listStatus(dir).foreach { st =>
      if (st.getPath.getName.endsWith(".tmp") && st.getPath != tmp) fs.delete(st.getPath, false)
    }
  }

  private def listSnapshots(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.endsWith(".snap")) Some((n.stripSuffix(".snap").toLong, st.getPath)) else None
      }
      .sortBy(_._1)

  private def loadLatest(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): Map[Int, Long] =
    listSnapshots(fs, dir).lastOption match {
      case None => Map.empty
      case Some((_, p)) =>
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p)))
        try Iterator.continually(in.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty)
          .map { l => val Array(c, n) = l.split(','); c.toInt -> n.toLong }
          .toMap
        finally in.close()
    }

  /** Cascade end-to-end into the file-backed sink: the histogram lands in
    * a hash-bucketed parquet lake (the production analogue of the
    * reference's Elasticsearch index), with per-batch upserts and deletes
    * going through [[graft.sinks.ParquetUpsertSink]]'s touched-bucket
    * merge. Same recovery contract as the memory-sink form.
    */
  def startToParquet(rides: DataFrame, sink: graft.sinks.ParquetUpsertSink,
                     checkpoint: String): StreamingQuery = {
    val spark = rides.sparkSession
    // reuse the memory-sink cascade and flush its per-batch effects to
    // parquet: CascadeQ4.start invokes sink.upsert/delete inside
    // foreachBatch and flush() at batch end, so wrapping those calls
    // yields exact per-batch deltas for the touched-bucket merge
    val flushing = new MemoryUpsertSink(Seq("dept_cnt")) {
      private val ups = scala.collection.mutable.Map.empty[Long, Long]
      private val dels = scala.collection.mutable.Set.empty[Long]
      override def upsert(row: org.apache.spark.sql.Row): Unit = {
        super.upsert(row); ups(row.getLong(0)) = row.getLong(1); dels -= row.getLong(0)
      }
      override def delete(row: org.apache.spark.sql.Row): Unit = {
        super.delete(row); dels += row.getLong(0); ups -= row.getLong(0)
      }
      override def flush(): Unit = {
        import spark.implicits._
        if (ups.nonEmpty || dels.nonEmpty) {
          val upDf = ups.toSeq.toDF("dept_cnt", "cnt_freq")
          val delDf = if (dels.isEmpty) null
            else dels.toSeq.map((_, 0L)).toDF("dept_cnt", "cnt_freq")
          sink.upsert(upDf, delDf)
          ups.clear(); dels.clear()
        }
      }
    }
    start(rides, flushing, checkpoint)
  }

  /** Start the full streaming cascade: level-1 update-mode agg ->
    * foreachBatch changelog replay -> histogram upserted into `sink`
    * (keyed by dept_cnt, the terminal groupBy column, as the reference's
    * key inference would derive). Restart-safe: the level-2 state is
    * recovered from the checkpoint-dir snapshot and the recovered histogram
    * re-upserted so the sink converges even after a driver restart.
    */
  def start(rides: DataFrame, sink: MemoryUpsertSink,
            checkpoint: String): StreamingQuery = {
    val spark = rides.sparkSession
    val dir = snapDir(checkpoint)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellCounts = TrieMap.empty[Int, Long] ++ loadLatest(fs, dir)
    val histogram = TrieMap.empty[Long, Long]
    cellCounts.values.groupBy(identity).foreach { case (b, v) => histogram.put(b, v.size.toLong) }
    histogram.foreach { case (b, f) => sink.upsert(histRow(b, f)) }
    sink.flush()
    StreamingQueries.q4Level1(rides)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val updates = batch.select(col("cell").cast("int"), col("dept_cnt").cast("long")).collect()
        val touched = scala.collection.mutable.Set.empty[Long]
        updates.foreach { r =>
          val oldBucket = cellCounts.get(r.getInt(0))
          applyUpdate(cellCounts, histogram, r.getInt(0), r.getLong(1))
          oldBucket.foreach(touched += _)
          touched += r.getLong(1)
        }
        // upsert touched buckets; delete emptied ones (the (false,row) path)
        touched.foreach { bucket =>
          histogram.get(bucket) match {
            case Some(freq) => sink.upsert(histRow(bucket, freq))
            case None => sink.delete(histRow(bucket, 0L))
          }
        }
        sink.flush() // external effects land before the snapshot publishes
        saveSnapshot(fs, dir, batchId, cellCounts) // before the batch commits
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

/** Continuous keyed count with idle-state TTL — the reference's
  * `withIdleStateRetentionTime(Time.hours(1), Time.hours(2))` query config
  * (TaxiRideQueries.scala:97-99, SURVEY A6): keys receiving no events for
  * the retention period are evicted from state (their count restarts from
  * zero if they reappear — exactly Flink's idle-state cleanup contract).
  *
  * Implemented with flatMapGroupsWithState + EventTimeTimeout: eviction is
  * driven by the watermark, so behavior is deterministic and testable
  * (processing-time TTL would be wall-clock-dependent).
  */
object TtlContinuousCount {

  // carries the watermarked timestamp column itself: EventTimeTimeout
  // requires the event-time attribute to reach the stateful operator
  case class Keyed(cell: Int, rowtime: java.sql.Timestamp)
  case class CountState(cnt: Long, maxRowtimeMs: Long)
  case class CellCount(cell: Int, dept_cnt: Long)

  def count(ttlMs: Long)(key: Int, rows: Iterator[Keyed],
                         state: GroupState[CountState]): Iterator[CellCount] = {
    if (state.hasTimedOut) { // watermark passed last activity + TTL: evict
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(CountState(0L, Long.MinValue))
      val batch = rows.toSeq
      val cnt = prev.cnt + batch.size
      val maxRowtimeMs = (prev.maxRowtimeMs +: batch.map(_.rowtime.getTime)).max
      state.update(CountState(cnt, maxRowtimeMs))
      // TTL is measured from THIS KEY's latest event time (Flink's idle-state
      // contract: retention is per-key activity, not global progress). Arming
      // from the watermark instead would evict keys seen in the first batch
      // (watermark 0 -> timeout ~epoch) and generally measure idleness from
      // the lagging watermark. Clamp above the current watermark because
      // setTimeoutTimestamp rejects timestamps the watermark already passed
      // (a very-late straggler's rowtime + TTL can be in the past).
      state.setTimeoutTimestamp(math.max(maxRowtimeMs + ttlMs, state.getCurrentWatermarkMs() + 1))
      Iterator.single(CellCount(key, cnt))
    }
  }

  /** rides stream -> per-cell running departure counts with idle TTL
    * (update-style changelog, one row per touched key per batch).
    */
  def query(rides: DataFrame, ttlMs: Long = 60L * 60 * 1000,
            watermark: String = "61 seconds"): Dataset[CellCount] = {
    val spark = rides.sparkSession
    import spark.implicits._
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .withWatermark("rowtime", watermark)
      .select(Taxi.toCellId(col("startLon"), col("startLat")).as("cell"), col("rowtime"))
      .as[Keyed]
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(count(ttlMs))
  }
}

/** The same idle-state-TTL continuous count as [[TtlContinuousCount]], on
  * Spark 4's `transformWithState` — the modern arbitrary-state API
  * (typed ValueState handles, explicit event-time timers, RocksDB-backed
  * state at scale). Kept alongside the flatMapGroupsWithState form to
  * cover both stateful seams the engine exposes; semantics are identical:
  * eviction fires when the watermark passes the key's last activity + TTL.
  */
object TtlContinuousCountV2 {
  import TtlContinuousCount.{Keyed, CountState, CellCount}
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}

  class Processor(ttlMs: Long) extends StatefulProcessor[Int, Keyed, CellCount] {
    @transient private var state: ValueState[CountState] = _
    @transient private var armed: ValueState[Long] = _ // exact armed-timer ts

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CountState]("cnt", Encoders.product[CountState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Int, rows: Iterator[Keyed],
                                 timers: TimerValues): Iterator[CellCount] = {
      val prev = if (state.exists()) state.get() else CountState(0L, Long.MinValue)
      val batch = rows.toSeq
      val cnt = prev.cnt + batch.size
      val maxRowtimeMs = (prev.maxRowtimeMs +: batch.map(_.rowtime.getTime)).max
      state.update(CountState(cnt, maxRowtimeMs))
      // re-arm: drop the stale timer (its exact — possibly clamped — ts is
      // tracked in `armed`), set one at last-activity + TTL, clamped above
      // the watermark as in the V1 operator
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      val at = math.max(maxRowtimeMs + ttlMs, timers.getCurrentWatermarkInMs() + 1)
      getHandle.registerTimer(at)
      armed.update(at)
      Iterator.single(CellCount(key, cnt))
    }

    override def handleExpiredTimer(key: Int, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[CellCount] = {
      state.clear()
      armed.clear()
      Iterator.empty
    }
  }

  /** rides stream -> per-cell running counts with idle TTL (update mode).
    * Requires the RocksDB state-store provider (transformWithState's
    * backing store) on the session.
    */
  def query(rides: DataFrame, ttlMs: Long = 60L * 60 * 1000,
            watermark: String = "61 seconds"): Dataset[CellCount] = {
    val spark = rides.sparkSession
    import spark.implicits._
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .withWatermark("rowtime", watermark)
      .select(Taxi.toCellId(col("startLon"), col("startLat")).as("cell"), col("rowtime"))
      .as[Keyed]
      .groupByKey(_.cell)
      .transformWithState(new Processor(ttlMs), TimeMode.EventTime(), OutputMode.Update())
  }
}

/** Streaming OVER-window state for Q3 (TaxiRideQueries.scala:130-146):
  * per cell, a time-ordered buffer of departure timestamps; each arriving
  * departure is annotated with the count of same-cell departures in the
  * trailing 10 minutes of event time. Buffer entries older than
  * (max seen event time - 10 min) can never affect future rows (rows
  * arrive at most `maxOutOfOrder` late) and are pruned — the Spark
  * analogue of Flink's OVER-window state cleanup.
  */
object OverWindowState {

  case class Departure(rideId: Long, cell: Int, deptTimeMs: Long)
  case class Annotated(ride_id: Long, cell: Int, dept_time: Long, dept_cnt: Long)
  case class CellBuffer(times: List[Long], maxSeenMs: Long)

  val WindowMs: Long = 10 * 60 * 1000
  val MaxLatenessMs: Long = 61 * 1000 // demo maxOutOfOrder 60 s + 1

  /** Counts are over data seen so far (rows sorted by event time within a
    * batch); a straggler crossing a batch boundary gets a correct count for
    * its own timestamp but already-emitted rows are not retro-updated —
    * the same emit-once contract as Flink's append OVER output.
    */
  def annotate(key: Int, rows: Iterator[Departure],
               state: GroupState[CellBuffer]): Iterator[Annotated] = {
    val buf = state.getOption.getOrElse(CellBuffer(Nil, Long.MinValue))
    var times = buf.times
    var maxSeen = buf.maxSeenMs
    // process per distinct timestamp: equal-timestamp rows are RANGE-frame
    // peers and must count each other (adding one-at-a-time undercounted
    // the earlier-sorted peer vs the batch q3OverWindow / Flink semantics)
    val out = rows.toSeq.sortBy(d => (d.deptTimeMs, d.rideId))
      .groupBy(_.deptTimeMs).toSeq.sortBy(_._1)
      .flatMap { case (ts, peers) =>
        peers.foreach { _ => times = ts :: times }
        maxSeen = math.max(maxSeen, ts)
        val cnt = times.count(t => t >= ts - WindowMs && t <= ts)
        peers.sortBy(_.rideId).map(d => Annotated(d.rideId, key, ts, cnt))
      }
    // prune entries invisible to any future row: the earliest timestamp a
    // future row can carry is maxSeen - MaxLatenessMs, and it looks back
    // WindowMs further
    val horizon = maxSeen - WindowMs - MaxLatenessMs
    state.update(CellBuffer(times.filter(_ >= horizon), maxSeen))
    out.iterator
  }

  /** rides stream -> per-departure trailing-10-min counts (append stream,
    * one row per input row — the reference's Q3 output contract).
    */
  def q3Streaming(rides: DataFrame): Dataset[Annotated] = {
    val spark = rides.sparkSession
    import spark.implicits._
    rides
      .filter(col("isStart") && Taxi.inNyc(col("startLon"), col("startLat")))
      .select(col("rideId").as("rideId"),
        Taxi.toCellId(col("startLon"), col("startLat")).as("cell"),
        unix_millis(col("rowtime")).as("deptTimeMs"))
      .as[Departure]
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(annotate)
  }
}
