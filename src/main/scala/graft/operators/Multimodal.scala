package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** A media record: opaque bytes + typed metadata, the schema shape a
  * 100 TB multimodal corpus uses (payload as parquet binary, metadata as
  * queryable columns so pruning/filtering never touches the bytes).
  */
case class MediaRecord(doc_id: Long, kind: String, n_bytes: Long, payload: Array[Byte])

/** Decoded features (what an image/audio decoder would emit). */
case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int, checksum: Long)

/** Pluggable decoder seam: a real deployment binds an image/audio decoder
  * here; this container has no media libs, so the default is a
  * DETERMINISTIC FAKE that derives "decoded" dimensions from the payload
  * bytes. The Spark-side plumbing (typed Dataset, mapPartitions batching,
  * partition-local decoder init) is real and tested.
  */
trait MediaDecoder extends Serializable {
  def decode(r: MediaRecord): MediaFeatures
}

/** Stand-in decoder: width/height/frames are pure functions of the payload
  * so results are oracle-checkable. A real decoder replaces exactly this
  * class and nothing else.
  */
object DeterministicFakeDecoder extends MediaDecoder {
  def decode(r: MediaRecord): MediaFeatures = {
    val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
    val b1 = if (r.payload.length > 1) r.payload(1) & 0xff else 0
    // rolling checksum, same recurrence as TextAnalysis.fingerprint
    var h = 0L
    var i = 0
    while (i < r.payload.length) { h = (h * 31 + (r.payload(i) & 0xff)) % 1000000007L; i += 1 }
    MediaFeatures(r.doc_id, r.kind, r.n_bytes,
      width = 16 * (1 + b0 % 64), height = 16 * (1 + b1 % 64),
      n_frames = 1 + (r.n_bytes / 64).toInt, checksum = h)
  }
}

/** Multimodal-column plumbing over synthesized binary payloads (the
  * testdata has no real media, so payloads are the UTF-8 document bytes —
  * the plumbing doesn't care what the bytes mean).
  */
object Multimodal {

  /** Ingest a directory of raw media files as binary records via Spark's
    * `binaryFile` source — the real on-ramp for an image/audio corpus
    * (payload bytes + path/size metadata, no decoding at scan time; the
    * `pathGlobFilter` option restricts by extension). Kind is the
    * lowercased file extension, so `photo.JPG` and `photo.jpg` both land
    * in kind `jpg` and downstream `kind === ...` filters see one spelling.
    * NOTE: `pathGlobFilter` itself stays case-sensitive (Hadoop glob
    * semantics) — pass a class glob like `*.{jpg,JPG}` when the corpus
    * mixes cases, or leave the default `*` and filter on `kind`. The
    * decode seam is the same [[MediaDecoder]].
    */
  def fromBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // a stable id from the file path (no global counter to coordinate)
        expr("CAST(conv(substr(md5(path), 1, 15), 16, 10) AS LONG)").as("doc_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("kind"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
      .as[MediaRecord]
  }

  /** documents -> typed media records (binary payload + metadata). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind"),
        length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Decode via mapPartitions: the decoder is resolved once per partition
    * (the pattern that amortizes native-lib init over a whole parquet row
    * group at scale), rows stream through without materializing the
    * partition.
    */
  def decodeFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val d = decoder // partition-local handle; real impl would init native libs here
      it.map(d.decode)
    }
  }

  /** End-to-end: records -> mapPartitions decode -> DataFrame, ordered. */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaRecords(spark, dir)).toDF().orderBy("doc_id")

  /** Deterministic frame sampling over video records: every 8th frame
    * index, each tagged with a per-frame signature derived from the decoded
    * checksum (stand-in for a real frame-extract; a real decoder would
    * emit frame bytes from exactly this (payload, frame_idx) seam). The
    * explode happens AFTER metadata-only decode — the payload bytes are
    * never duplicated per frame, which is what keeps a 100 TB video corpus
    * from exploding 8x through the shuffle.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaRecords(spark, dir)).toDF()
      .filter(col("kind") === "video")
      .selectExpr("doc_id", "checksum", "explode(sequence(0, n_frames - 1, 8)) AS frame_idx")
      .selectExpr("doc_id", "frame_idx", "(checksum * 31 + frame_idx) % 1000000007 AS frame_sig")
      .orderBy("doc_id", "frame_idx")

  val frameSampleOracle: String =
    """WITH feat AS (
      |  SELECT doc_id,
      |    CAST(1 + length(text) // 64 AS INT) AS n_frames,
      |    CASE WHEN length(text) = 0 THEN 0 ELSE
      |      list_reduce(list_transform(range(1, length(text) + 1),
      |          i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
      |        (h, c) -> (h * 31 + c) % 1000000007) END AS checksum
      |  FROM documents WHERE doc_id % 3 = 2
      |)
      |SELECT doc_id, frame_idx, (checksum * 31 + frame_idx) % 1000000007 AS frame_sig
      |FROM (SELECT doc_id, checksum, unnest(range(0, n_frames, 8)) AS frame_idx FROM feat)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** EXACT payload dedup over the binary column: identical media bytes
    * collapse to one canonical record (min doc_id), keyed on
    * (kind, n_bytes, checksum) — the media twin of text dedup_exact,
    * computed WITHOUT ever shuffling the payload bytes: the decode seam
    * emits the fixed-width content key per partition, and only
    * (doc_id, key) tuples move through the one hash shuffle. At 100 TB
    * of video that byte-free shuffle is the whole point; a stronger
    * content hash (the real decoder's md5/sha) swaps into exactly the
    * checksum slot.
    */
  def payloadDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("kind", "n_bytes", "checksum")
    decodeFeatures(mediaRecords(spark, dir)).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("checksum"))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .select("doc_id", "kind", "canonical_id", "is_canonical")
      .orderBy("doc_id")
  }

  val payloadDedupOracle: String =
    """WITH feat AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(length(text) AS BIGINT) AS n_bytes,
      |    CASE WHEN length(text) = 0 THEN 0 ELSE
      |      list_reduce(list_transform(range(1, length(text) + 1),
      |          i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
      |        (h, c) -> (h * 31 + c) % 1000000007) END AS checksum
      |  FROM documents
      |)
      |SELECT doc_id, kind,
      |  min(doc_id) OVER (PARTITION BY kind, n_bytes, checksum) AS canonical_id,
      |  doc_id = min(doc_id) OVER (PARTITION BY kind, n_bytes, checksum) AS is_canonical
      |FROM feat
      |ORDER BY doc_id""".stripMargin

  /** The fake decode arithmetic, replayed relationally over the original
    * text (payload bytes are ASCII here, so ascii()/length() line up with
    * the byte math).
    */
  val featuresOracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(16 * (1 + CASE WHEN length(text) >= 1 THEN ascii(substr(text, 1, 1)) ELSE 0 END % 64) AS INT) AS width,
      |  CAST(16 * (1 + CASE WHEN length(text) >= 2 THEN ascii(substr(text, 2, 1)) ELSE 0 END % 64) AS INT) AS height,
      |  CAST(1 + length(text) // 64 AS INT) AS n_frames,
      |  CASE WHEN length(text) = 0 THEN 0 ELSE
      |    list_reduce(list_transform(range(1, length(text) + 1),
      |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
      |      (h, c) -> (h * 31 + c) % 1000000007) END AS checksum
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
