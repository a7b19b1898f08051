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
  private[graft] def stage(spark: SparkSession, dir: String): String = {
    val out = stagingDir(dir)
    Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").json(out)
    val bad = (1 to CorruptLines)
      .map(i => s"""{"doc_id": $i, "text": truncated-mid-record""")
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-zz-corrupt.json"),
      bad.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out
  }

  /** Parsed documents from the staged JSONL, corrupt lines excluded.
    * The oracle is the original parquet table — the round trip must be
    * exact. The clean-row predicate is `doc_id IS NOT NULL`, NOT a check
    * on `_corrupt_record`: Spark refuses to evaluate the corrupt column
    * straight off a raw-file scan (it would need a second parse), and a
    * record without its primary id is quarantine material anyway. The
    * quarantine view ([[parsedWithCorrupt]]) is for the materialize-then-
    * inspect path — at scale, a foreachBatch write of corrupt rows to a
    * quarantine table.
    */
  def srcDocsJsonl(spark: SparkSession, dir: String): DataFrame =
    parsedWithCorrupt(spark, dir)
      .filter(col("doc_id").isNotNull)
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
      .filter(col("doc_id").isNotNull)
      .select("doc_id", "text", "lang", "source", "n_chars")

  val srcDocsJsonlOracle: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin
}
