package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Pins the live-feed race that made `stream_temporal_join_live` flake:
  * copying a chunk file into a directory a RUNNING FileStreamSource is
  * watching, then setting its mtime backwards after the copy, lets a
  * trigger list the file at wall-clock time first. FileStreamSource's
  * seen-map then purges with `lastPurgeTimestamp = newestSeen − maxFileAge
  * (7 d)`, so every later chunk (mtime ≈ epoch+minutes) is SILENTLY
  * ignored — whole micro-batches of input vanish with no error.
  *
  * The first test reproduces that loss deterministically by forcing the
  * losing interleaving (file visible at wall-clock mtime before the
  * backdate): it FAILS on the unfenced feed discipline, proving the spec
  * exercises the race. The second test runs the exact same backdated-mtime
  * schedule through the fixed discipline (hidden dot-file copy → set mtime
  * → ATOMIC_MOVE, the gate's `atomicFeed`) and loses nothing. The third
  * runs the full two-query live gate repeatedly against the batch as-of
  * join — the end-to-end determinism claim the driver hash-checks.
  */
class LiveFeedRaceSpec extends SparkSpec {
  import spark.implicits._

  /** One single-file parquet chunk holding exactly the longs in `vs`. */
  private def stageChunk(vs: Seq[Long]): Path = {
    val tmp = Files.createTempDirectory("chunk_stage")
    vs.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    part.toPath
  }

  /** The gate's fixed feed discipline: never visible partial, never
    * visible with the wrong mtime.
    */
  private def atomicFeed(src: Path, dstDir: Path, mtimeMs: Long): Unit = {
    val tmp = dstDir.resolve(s".tmp-${src.getFileName}")
    Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    assert(tmp.toFile.setLastModified(mtimeMs))
    Files.move(tmp, dstDir.resolve(src.getFileName), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** The racy discipline's LOSING interleaving, made deterministic: the
    * file becomes visible at wall-clock mtime, the source lists it, and
    * only then does the backdate land (too late).
    */
  private def racyFeedLosing(src: Path, dstDir: Path, mtimeMs: Long,
      processNow: () => Unit): Unit = {
    val dst = dstDir.resolve(src.getFileName)
    Files.copy(src, dst) // visible with current wall-clock mtime
    processNow()         // the trigger that wins the race
    assert(dst.toFile.setLastModified(mtimeMs))
  }

  private def withCountingStream(watched: Path)(body: (String, () => Unit) => Unit): Unit = {
    val name = s"live_feed_race_${System.nanoTime()}"
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(watched.toString)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try body(name, () => q.processAllAvailable())
    finally { q.stop(); spark.catalog.dropTempView(name); () }
  }

  test("unfenced copy-then-backdate loses every later backdated chunk (the race, forced)") {
    val watched = Files.createTempDirectory("race_watch")
    val Seq(c0, c1, c2) =
      Seq(Seq(1L, 2L), Seq(10L, 11L), Seq(100L, 101L)).map(stageChunk)
    withCountingStream(watched) { (name, process) =>
      atomicFeed(c0, watched, 60000L)
      process()
      assert(spark.table(name).count() === 2)
      // chunk 1 arrives through the racy discipline and the source lists
      // it at wall-clock time before the backdate lands
      racyFeedLosing(c1, watched, 120000L, process)
      assert(spark.table(name).count() === 4)
      // chunk 2 is now older than newest-seen minus maxFileAge: DROPPED
      atomicFeed(c2, watched, 180000L)
      process()
      assert(spark.table(name).count() === 4,
        "maxFileAge purge should silently ignore the backdated chunk — " +
          "if this count is 6, Spark's FileStreamSource purge semantics changed")
      assert(!spark.table(name).as[Long].collect().contains(100L))
    }
  }

  test("atomic feed delivers the same backdated-mtime schedule losslessly") {
    val watched = Files.createTempDirectory("race_watch_ok")
    val Seq(c0, c1, c2) =
      Seq(Seq(1L, 2L), Seq(10L, 11L), Seq(100L, 101L)).map(stageChunk)
    withCountingStream(watched) { (name, process) =>
      Seq(c0 -> 60000L, c1 -> 120000L, c2 -> 180000L).foreach { case (f, t) =>
        atomicFeed(f, watched, t)
        process()
      }
      assert(spark.table(name).count() === 6)
      assert(spark.table(name).as[Long].collect().sorted
        === Array(1L, 2L, 10L, 11L, 100L, 101L))
    }
  }

  test("live temporal join gate is deterministic across repeated runs and equals the batch as-of join") {
    val expect = graft.operators.Relational.temporalJoin(spark, Sf0001)
      .collect().map(_.toString).sorted
    (1 to 2).foreach { run =>
      val got = graft.streaming.StreamGate.temporalJoinLive(spark, Sf0001)
        .collect().map(_.toString).sorted
      assert(got.length === expect.length, s"run $run row count")
      assert(got.sameElements(expect), s"run $run rows differ from batch as-of join")
    }
  }
}
