package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import scala.collection.concurrent.TrieMap

/** Upsert-sink layer reproducing the contract of the reference's
  * ElasticUpsertTableSink (ElasticUpsertTableSink.scala:38-148):
  *  - the planner infers the result table's unique key and hands it to the
  *    sink (`setKeyFields`, :51-55) — Spark has no such inference, so
  *    [[UpsertKeys.derive]] walks the analyzed plan to the terminal
  *    Aggregate's grouping columns;
  *  - upserts are keyed by the ":"-joined key-field values (:125,144-147);
  *  - (true, row) -> upsert, (false, row) -> delete. Spark update-mode
  *    streaming aggregations never emit deletes (keys don't disappear), so
  *    the delete path only arises from the cascade's synthetic retractions
  *    (see graft.streaming.CascadeQ4).
  */
object UpsertKeys {

  /** Infer upsert key columns: the grouping columns of the topmost Aggregate
    * in the analyzed plan (the reference's "unique key of a groupBy result"
    * rule), traced through any projections above it. Returns Nil when the
    * plan has no aggregation (append-only result — reference
    * setIsAppendOnly, :86).
    */
  def derive(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.analyzed
    plan.collectFirst { case a: Aggregate => a } match {
      case None => Nil
      case Some(a) =>
        // key columns = aggregate-output expressions that ARE grouping
        // expressions (directly or via alias)
        val keyCols = a.aggregateExpressions.collect {
          case al: Alias if a.groupingExpressions.exists(_.semanticEquals(al.child)) =>
            (al.exprId, al.name)
          case att: AttributeReference if a.groupingExpressions.exists(_.semanticEquals(att)) =>
            (att.exprId, att.name)
        }
        val ids = keyCols.map(_._1).toSet
        val byId = plan.output.filter(o => ids.contains(o.exprId)).map(_.name)
        if (byId.nonEmpty) byId
        else { // re-aliased above the Aggregate: match by name
          val names = keyCols.map(_._2).toSet
          plan.output.map(_.name).filter(names.contains)
        }
    }
  }
}

/** In-memory keyed upsert store standing in for the external KV/search
  * store (Elasticsearch in the reference). Thread-safe; used by streaming
  * tests and the foreachBatch writers.
  */
class MemoryUpsertSink(val keyFields: Seq[String]) extends Serializable {
  private val store = TrieMap.empty[String, Row]

  /** Reference doc-id scheme: key-field values joined with ":" (:125). */
  def keyOf(row: Row): String =
    keyFields.map(f => String.valueOf(row.getAs[Any](f))).mkString(":")

  def upsert(row: Row): Unit = store.put(keyOf(row), row)
  def delete(row: Row): Unit = store.remove(keyOf(row))
  def upsertBatch(df: DataFrame): Unit = df.collect().foreach(upsert)
  def snapshot: Map[String, Row] = store.toMap
  def size: Int = store.size
  def clear(): Unit = store.clear()
}
