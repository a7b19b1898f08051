package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** End-to-end corpus-curation queries: the composition layer that turns the
  * individual operators (quality metrics, dedup, hashing) into the actual
  * product of a training-data pipeline — a cleaned, sampled, split corpus.
  *
  * Everything is a single declarative plan (scan -> project -> joins on
  * doc_id), so Catalyst fuses the metric computations; at 100 TB each query
  * is one pass over the corpus plus the dedup shuffle it already pays.
  */
object Pipeline {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** 60-bit md5 hash used for all routing decisions (sampling, splits) —
    * deterministic, key-stable across runs and engines, the property
    * random() sampling can't give a reproducible pipeline.
    */
  private val docHash = "CAST(conv(substr(md5(text), 1, 15), 16, 10) AS LONG)"
  private val duckDocHash = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"

  // -------------------------------------------------------------------------
  // Quality + dedup corpus filter
  // -------------------------------------------------------------------------

  /** The cleaned corpus: exact-dedup keepers that pass quality gates
    * (length band, type-token ratio, stopword evidence). Output is the
    * kept doc ids + the metrics that justified keeping them (the audit
    * trail a curation run must ship).
    */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    val metrics = docs(spark, dir)
      .selectExpr("doc_id", "lang", "n_chars", "text", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "lang", "n_chars", "text",
        "CAST(size(toks) AS BIGINT) AS n_tokens",
        "CAST(size(array_distinct(toks)) AS BIGINT) AS n_distinct",
        "CAST(size(filter(toks, t -> t IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS n_stop")
    val keepers = docs(spark, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    metrics.join(keepers, "doc_id")
      .filter(col("n_chars").between(100, 480) &&
        (col("n_distinct").cast("double") / col("n_tokens") >= 0.3) &&
        col("n_stop") >= 1)
      .selectExpr("doc_id", "lang", "n_chars", "n_tokens",
        "CAST(n_distinct AS DOUBLE) / n_tokens AS ttr")
      .orderBy("doc_id")
  }

  val corpusFilterOracle: String =
    """WITH metrics AS (
      |  SELECT doc_id, lang, n_chars,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','a','and','of','to','in','is'))) AS n_stop
      |  FROM documents
      |),
      |keepers AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
      |)
      |SELECT m.doc_id, lang, n_chars, n_tokens,
      |  CAST(n_distinct AS DOUBLE) / n_tokens AS ttr
      |FROM metrics m JOIN keepers k ON m.doc_id = k.doc_id
      |WHERE n_chars BETWEEN 100 AND 480
      |  AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
      |  AND n_stop >= 1
      |ORDER BY m.doc_id""".stripMargin

  // -------------------------------------------------------------------------
  // Deterministic stratified sampling + train/eval split
  // -------------------------------------------------------------------------

  /** Hash-routed stratified sample: per-language keep rates (en 80%,
    * others 40%) decided by the doc's content hash, plus a 90/10
    * train/eval split from an independent hash digit. Fully reproducible —
    * re-running on the same corpus yields byte-identical membership,
    * which `sample()`/random() cannot guarantee across retries/partitions.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .selectExpr("doc_id", "lang", s"$docHash AS h")
      .selectExpr("doc_id", "lang", "h % 100 AS bucket", "(h div 100) % 10 AS split_digit")
      .filter("CASE WHEN lang = 'en' THEN bucket < 80 ELSE bucket < 40 END")
      .selectExpr("doc_id", "lang", "bucket",
        "CASE WHEN split_digit < 9 THEN 'train' ELSE 'eval' END AS split")
      .orderBy("doc_id")

  val stratifiedSampleOracle: String =
    s"""SELECT doc_id, lang, bucket,
       |  CASE WHEN split_digit < 9 THEN 'train' ELSE 'eval' END AS split
       |FROM (
       |  SELECT doc_id, lang, $duckDocHash % 100 AS bucket,
       |    ($duckDocHash // 100) % 10 AS split_digit
       |  FROM documents
       |)
       |WHERE CASE WHEN lang = 'en' THEN bucket < 80 ELSE bucket < 40 END
       |ORDER BY doc_id""".stripMargin
}
