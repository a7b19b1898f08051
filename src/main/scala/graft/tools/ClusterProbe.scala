package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev probe: where does dedup_cluster's bench time go at sf0.1? */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = time("minhashLsh pairs materialize") {
      val p = Dedup.minhashLsh(spark, dir)
        .filter(col("est_sim") >= Dedup.ClusterMinSim)
        .select("doc_a", "doc_b").persist()
      println(s"[probe] n_pairs=${p.count()}")
      p
    }
    time("full cluster()") {
      val n = Dedup.cluster(spark, dir).count()
      println(s"[probe] cluster rows=$n")
    }
    time("full cluster() again (warm)") {
      Dedup.cluster(spark, dir).count()
    }
    spark.stop()
  }
}
