package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** JSONL ingest for the `documents` corpus — the wire format a real
  * training-data pipeline receives (one JSON object per line), exercised
  * end-to-end: the corpus is serialized to JSONL (with deliberately corrupt
  * lines injected), then read back through the declared-schema reader.
  *
  * Scale/robustness design:
  *  - **Schema is declared, never inferred**: inference costs a full extra
  *    pass over 100 TB before the first real task can run.
  *  - **PERMISSIVE + `_corrupt_record`**: one malformed line in a
  *    trillion-line corpus must quarantine that LINE, not kill the job
  *    (FAILFAST) or silently null a column (DROPMALFORMED would hide the
  *    loss). Corrupt rows are counted and excluded explicitly, so the drop
  *    is observable.
  *  - JSON string escaping is lossless, so the parquet -> JSONL -> parsed
  *    round trip is exact and the parsed output has a plain parquet oracle.
  */
object DocsJsonl {

  /** Number of deliberately malformed lines injected next to the data. */
  val CorruptLines = 7

  /** Injected lines of the nastier class: the line is valid JSON until a
    * late field fails to parse (here `n_chars` as a string). Spark 4's
    * partial-results parsing keeps the fields it already parsed — so the
    * row has a non-null `doc_id` AND `_corrupt_record` set, and a
    * quarantine predicate on id-presence alone would leak it as clean.
    */
  val PartialLines = 3

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Deterministic staging dir per input dir (bench/verify call repeatedly;
    * overwrite keeps runs independent).
    */
  private def stagingDir(dir: String): String =
    "/tmp/graft_jsonl_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Serialize `documents` to JSONL and drop [[CorruptLines]] malformed
    * lines into the same directory (a separate part file — exactly how bad
    * records arrive in practice: interleaved with good files, not
    * pre-sorted into a quarantine).
    */
  /** One staging write per (JVM, input dir): bench and verify call the
    * source repeatedly, and re-serializing the corpus each call would bill
    * the harness's own setup write to the operator under test. Content is
    * deterministic, so reuse within a JVM is safe.
    */
  private val stagedOnce = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def stage(spark: SparkSession, dir: String): String =
    stagedOnce.computeIfAbsent(dir, { _ =>
      val out = stagingDir(dir)
      Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").json(out)
      // truncated lines: the whole record is unparseable, every field nulls
      val bad = (1 to CorruptLines)
        .map(i => s"""{"doc_id": $i, "text": truncated-mid-record""")
      // partial-parse lines: doc_id parses fine, a later field errors.
      // Ids far outside the corpus range so a leak would also break the
      // round-trip diff, not just the quarantine count.
      val partial = (1 to PartialLines)
        .map(i => s"""{"doc_id": ${90000000L + i}, "text": "partial row", "lang": "xx", "source": "probe", "n_chars": "not-a-number"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "part-zz-corrupt.json"),
        (bad ++ partial).mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out
    })

  /** Clean-row predicate, shared by the batch and streaming readers.
    * `_corrupt_record IS NULL` catches token-level corruption; requiring
    * every declared field NON-NULL catches the partial-parse class
    * (Spark 4 keeps fields parsed before the error, so such a line has a
    * non-null doc_id) — and does so under ANY column pruning: Spark
    * populates `_corrupt_record` only for fields the query actually
    * converts, so a pruned read (e.g. a bare count referencing two
    * columns) would otherwise judge a partial row clean. Referencing all
    * fields here pins them all in the scan's required schema, making the
    * quarantine decision schema-stable. Every field is required in this
    * corpus (no nulls at any SF); an ingest with optional fields would
    * list only its required ones.
    */
  private val cleanPred =
    col("_corrupt_record").isNull &&
      col("doc_id").isNotNull && col("text").isNotNull &&
      col("lang").isNotNull && col("source").isNotNull &&
      col("n_chars").isNotNull

  /** Parsed documents from the staged JSONL, corrupt lines excluded.
    * The oracle is the original parquet table — the round trip must be
    * exact. (Spark only refuses raw-scan queries whose ONLY referenced
    * column is the corrupt one; filtering it alongside data columns is
    * fine.)
    */
  def srcDocsJsonl(spark: SparkSession, dir: String): DataFrame =
    parsedWithCorrupt(spark, dir)
      .filter(cleanPred)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Full PERMISSIVE read including the `_corrupt_record` column. */
  private[graft] def parsedWithCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val staged = stage(spark, dir)
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(staged)
  }

  /** Streaming ingest of a directory JSONL files land in — the continuous
    * form of [[srcDocsJsonl]] (same declared schema, same PERMISSIVE
    * policy, same clean-row predicate). `maxFilesPerTrigger` is the
    * backpressure knob a real landing zone needs; file-source streaming
    * tracks processed files in the checkpoint, so a crashed ingest resumes
    * without re-reading or skipping a file.
    */
  def streamFromJsonl(spark: SparkSession, stagedDir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(stagedDir)
      .filter(cleanPred)
      .select("doc_id", "text", "lang", "source", "n_chars")

  val srcDocsJsonlOracle: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin
}
