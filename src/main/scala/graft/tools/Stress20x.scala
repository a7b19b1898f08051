package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 20x scale probe for the documents/events/embeddings operators (dedup,
  * text, similarity, training-pipeline, taxi/event queries): replicates
  * those sf0.1 tables 20-fold into /tmp/graft20x (ids offset per replica,
  * event times shifted so the stream stays dense, not 20 copies of the
  * same hour). The fact-fact pair orders/lineitem is ALSO replicated
  * (join keys strided by the actual key range, so each replica's lineitem
  * joins its own replica's orders) for rel_bucketed_join; the remaining
  * star dims (customer/part/supplier/...) are out of scope. Superlinear
  * growth between sf0.1 and 20x is the smoke we're hunting: a query that
  * is 20x data should be ~20x cost, never 400x.
  */
object Stress20x {
  val K = 20

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft20x"
    val reps = spark.range(K).withColumnRenamed("id", "rep")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    docs.crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("rep") * nDocs)
      // vary the text per replica so dedup/minhash don't see 20 exact
      // copies of every doc (that would be a duplicate-factor probe, not a
      // scale probe): prefix a replica token
      .withColumn("text", concat(lit("r"), col("rep"), lit(" "), col("text")))
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val ev = graft.core.Tables.events(spark, src)
    val nEv = ev.count()
    // offset user ids by the ACTUAL id range: a fixed stride smaller than
    // max(user_id) would alias users across replicas and distort the
    // per-user cardinality/skew profile the probe exists to measure
    val userStride = ev.agg(max("user_id")).head().getLong(0) + 1
    val spanMs = 100L * 24 * 3600 * 1000 // shift each replica by 100 days
    ev.crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("rep") * nEv)
      .withColumn("user_id", col("user_id") + col("rep") * userStride)
      // write timestamp[us] like the CURRENT testdata generation (the
      // loader refuses a plain INT64 ts since it can't know the epoch
      // unit; the legacy TIMESTAMP(NANOS) path is pinned by committed
      // fixtures in TablesEncodingSpec, not by this probe corpus)
      .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + col("rep") * spanMs * 1000))
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = emb.count()
    emb.crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("rep") * nEmb)
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // the fact-fact join pair, for rel_bucketed_join: BOTH sides shift
    // their join key by the same stride (actual key range, not row count —
    // lineitem repeats orderkeys) so every replica's lineitem still joins
    // its own replica's orders and the per-key fanout profile is preserved
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val nOrd = ord.count()
    val keyStride = ord.agg(max("o_orderkey")).head().getLong(0) + 1
    ord.crossJoin(broadcast(reps))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * keyStride)
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val nLi = li.count()
    li.crossJoin(broadcast(reps))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keyStride)
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    println(s"20x written to $out: docs=${nDocs * K} events=${nEv * K} " +
      s"vecs=${nEmb * K} orders=${nOrd * K} lineitem=${nLi * K}")
    spark.stop()
  }
}
