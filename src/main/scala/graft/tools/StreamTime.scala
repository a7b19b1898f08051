package graft.tools
import org.apache.spark.sql.functions._
object StreamTime {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.EngineSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[batch] id=${p.batchId} rows=${p.numInputRows} " +
          s"total=${p.batchDuration}ms addBatch=${p.durationMs.get("addBatch")}ms " +
          s"getBatch=${p.durationMs.get("getBatch")} latestOffset=${p.durationMs.get("latestOffset")} " +
          s"queryPlanning=${p.durationMs.get("queryPlanning")} walCommit=${p.durationMs.get("commitOffsets")} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"stateMemory=${p.stateOperators.map(_.memoryUsedBytes).mkString(",")}")
      }
    })
    for (p <- Seq("32", "8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val i = p
      val t0 = System.nanoTime()
      graft.streaming.StreamGate.q8Pair(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[gate] q8Pair run $i total ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
