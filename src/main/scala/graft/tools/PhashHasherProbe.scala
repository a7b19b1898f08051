package graft.tools

import org.apache.spark.sql.functions._

/** 20x probe for the perceptual-hash seam: times the decode-stage hash
  * pass (records -> 60-bit phash, the map-only stage every phash verb
  * starts with) over an N-times-replicated media set, for the md5
  * stand-in vs the rolling-mix production hasher. The claim under test:
  * the rolling hasher removes the O(payload) MessageDigest cost from the
  * decode stage. Usage: runMain graft.tools.PhashHasherProbe [sfDir] [mult] [reps]
  */
object PhashHasherProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 20
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Multimodal, MediaRecord}
    val base = Multimodal.mediaRecords(spark, dir).toDF()
    val big = (0 until mult).map(k => base.withColumn("doc_id",
        col("doc_id") + lit(k.toLong * 1000000000L)))
      .reduce(_ unionByName _).as[MediaRecord].cache()
    val n = big.count()
    println(s"[probe] $n records (${mult}x $dir)")
    for (rep <- 1 to reps; (name, h) <- Seq(
        "md5-standin" -> Multimodal.ByteSimHashHasher,
        "rolling-mix" -> Multimodal.RollingMixHasher)) {
      val t0 = System.nanoTime()
      Multimodal.phashes(big, h).selectExpr("bit_xor(phash)").collect()
      println(f"[probe] $name rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
