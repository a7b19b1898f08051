package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints the formatted physical plan of each (or one named) query — the
  * scale audit loop: check PushedFilters/ReadSchema on scans, broadcast vs
  * shuffle join choices, and WholeStageCodegen span coverage.
  *
  * Usage: runMain graft.tools.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // the full engine session (not a bare builder): plans under audit must
    // resolve the extension-registered functions (bloom_agg/bloom_contains,
    // float_dot, rolling_hash) exactly as Verify/Bench sessions do
    val spark = graft.core.EngineSession.create("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // stream_* gates EXECUTE a full streaming pipeline inside the query
    // function and return a scan of the materialized result — running them
    // here costs minutes and prints no auditable plan. Skip them in the
    // enumerate-all mode; an explicit name still runs whatever was asked.
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.filterNot(_.startsWith("stream_")).sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
