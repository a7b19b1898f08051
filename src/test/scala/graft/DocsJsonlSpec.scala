package graft

import org.apache.spark.sql.functions._
import graft.sources.DocsJsonl
import graft.core.Tables

/** JSONL ingest: exact round trip for good lines, per-line quarantine for
  * bad ones (the PERMISSIVE/_corrupt_record policy a 100 TB ingest needs —
  * one malformed line must cost one row, not the job).
  */
class DocsJsonlSpec extends SparkSpec {

  test("JSONL round trip is exact and corrupt lines quarantine individually") {
    val parsed = DocsJsonl.srcDocsJsonl(spark, Sf0001)
    val orig = Tables.load(spark, Sf0001, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")

    // exact round trip: parquet -> JSONL -> parsed has no diff either way
    assert(parsed.exceptAll(orig).count() === 0L)
    assert(orig.exceptAll(parsed).count() === 0L)

    // every injected corrupt line surfaces as exactly one quarantined row,
    // and quarantine carries the raw line for replay/debugging. Spark only
    // exposes _corrupt_record after materialization (persist here; a real
    // pipeline would foreachBatch-write the quarantine table).
    val all = DocsJsonl.parsedWithCorrupt(spark, Sf0001).persist()
    try {
      val corrupt = all.filter(col("_corrupt_record").isNotNull)
      assert(corrupt.count() ===
        (DocsJsonl.CorruptLines + DocsJsonl.PartialLines).toLong)
      assert(corrupt.filter(col("_corrupt_record").contains("truncated-mid-record"))
        .count() === DocsJsonl.CorruptLines.toLong)
      // the partial-parse class: Spark 4 fills fields parsed before the
      // error, so these rows have a NON-NULL doc_id and must still be
      // quarantined — an id-presence-only clean predicate leaks them
      val partial = corrupt.filter(col("doc_id").isNotNull)
      assert(partial.count() === DocsJsonl.PartialLines.toLong)
      assert(parsed.filter(col("doc_id") >= 90000000L).count() === 0L)
    } finally { all.unpersist(); () }
  }

  test("streaming JSONL ingest equals the batch read (availableNow drain)") {
    val staged = DocsJsonl.stage(spark, Sf0001)
    val q = DocsJsonl.streamFromJsonl(spark, staged, maxFilesPerTrigger = 2)
      .writeStream
      .format("memory")
      .queryName("jsonl_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(60000), "stream did not drain within 60s")
    finally q.stop()
    val streamed = spark.table("jsonl_stream")
    val batch = DocsJsonl.srcDocsJsonl(spark, Sf0001)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }
}
