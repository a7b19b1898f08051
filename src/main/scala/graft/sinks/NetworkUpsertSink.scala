package graft.sinks

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap

/** Network document-store writer contract — the production shape of the
  * reference's Elasticsearch sink (ElasticUpsertTableSink.scala:116-148):
  * per-document keyed upsert (`UpdateRequest.doc(json).upsert(idxReq)`,
  * :129-139) and keyed delete (`DeleteRequest(index, tpe, key)`, :142-144),
  * shipped through a batching indexer (the `RequestIndexer` the Flink
  * Elasticsearch connector flushes in bulk with retries).
  *
  * Spark-first re-expression: the cluster-side unit is a per-partition
  * [[BulkWriter]] driven from `foreachPartition` (batch) or a
  * [[ForeachWriter]] / `foreachBatch` (streaming). No real network client
  * exists in this sandbox, so the transport is behind
  * [[DocumentStoreClient]]; [[MemoryDocStore]] supplies an in-JVM
  * implementation with injectable fault schedules so the retry/ordering/
  * idempotence contract is TESTED, not asserted. A real deployment
  * implements one `bulk()` method over its HTTP/RPC client.
  *
  * Delivery contract (what makes this safe on a 1000-executor cluster):
  *  - At-least-once: Spark retries failed tasks and replays micro-batches;
  *    every request is a FULL-document keyed write (never an increment),
  *    so replays converge instead of double-counting.
  *  - Per-key coalescing: within one bulk flush the writer keeps only the
  *    LAST request per key (changelog semantics — later writes supersede
  *    earlier ones), so a bulk never contains two ops for one key and
  *    per-item retry cannot reorder a key against itself.
  *  - Cross-flush order: `flush()` only returns once every item of the
  *    current bulk is acknowledged (or the task fails), so a key's
  *    requests hit the store in emission order.
  *  - Key ownership: callers route a key's changelog through one partition
  *    (Spark's hash shuffle on the grouping key already does this for
  *    aggregation output), so no two writers race on a key within a batch.
  */
sealed trait DocRequest { def key: String }
final case class DocUpsert(key: String, doc: Map[String, Any]) extends DocRequest
final case class DocDelete(key: String) extends DocRequest

/** Per-item outcome of a bulk call, mirroring a bulk HTTP response:
  * item-level success, a transient condition worth retrying (429/503,
  * connection reset), or a permanent rejection (mapping conflict, 4xx).
  */
sealed trait BulkItemResult
case object BulkOk extends BulkItemResult
final case class BulkRetryable(reason: String) extends BulkItemResult
final case class BulkFatal(reason: String) extends BulkItemResult

/** One round-trip to the external store: apply `requests` (at most one per
  * key — [[BulkWriter]] guarantees that) and return one result per request
  * IN ORDER. Implementations are created per partition-task via
  * [[DocumentStoreClientFactory]] and closed when the task ends.
  */
trait DocumentStoreClient extends AutoCloseable {
  def bulk(requests: Seq[DocRequest]): Seq[BulkItemResult]
  override def close(): Unit = ()
}

/** Serializable factory shipped inside the `foreachPartition` closure;
  * the client itself (sockets, connection pools) is built executor-side.
  */
trait DocumentStoreClientFactory extends Serializable {
  def open(): DocumentStoreClient
}

/** Buffering, coalescing, retrying bulk writer — the Spark-side equivalent
  * of the Flink connector's BulkProcessor configuration
  * (`bulk.flush.max.actions`, backoff retries) the reference relies on.
  *
  * Not thread-safe: one instance per partition task.
  *
  * @param maxActions  flush threshold (distinct keys buffered)
  * @param maxRetries  attempts per bulk for retryable failures before the
  *                    task is failed (letting Spark's task retry take over)
  * @param backoffMs   base of the exponential backoff between attempts
  * @param sleeper     injection seam for tests (defaults to Thread.sleep)
  */
final class BulkWriter(client: DocumentStoreClient,
                       maxActions: Int = 512,
                       maxRetries: Int = 5,
                       backoffMs: Long = 50L,
                       sleeper: Long => Unit = Thread.sleep(_)) {
  require(maxActions > 0, s"maxActions must be positive: $maxActions")

  // insertion-ordered, coalesced per key: a re-add replaces the pending op
  // for that key in place (order among DISTINCT keys is preserved; for one
  // key only the last op matters — full-document changelog semantics)
  private val buffer = new java.util.LinkedHashMap[String, DocRequest]()
  private var bulksSent0 = 0
  private var itemsSent0 = 0
  private var retries0 = 0

  def bulksSent: Int = bulksSent0
  def itemsSent: Int = itemsSent0
  def retries: Int = retries0
  def pending: Int = buffer.size

  def add(req: DocRequest): Unit = {
    buffer.put(req.key, req)
    if (buffer.size >= maxActions) flush()
  }

  /** Ship the buffered bulk; retry retryable items with exponential
    * backoff. Returns only when every buffered item is acknowledged —
    * any other outcome is an exception that fails the Spark task.
    */
  def flush(): Unit = {
    if (buffer.isEmpty) return
    import scala.jdk.CollectionConverters._
    var remaining: Seq[DocRequest] = buffer.values.asScala.toSeq
    buffer.clear()
    var attempt = 0
    while (remaining.nonEmpty) {
      val results = client.bulk(remaining)
      require(results.length == remaining.length,
        s"store returned ${results.length} results for ${remaining.length} requests")
      bulksSent0 += 1
      val fatal = remaining.zip(results).collectFirst {
        case (r, BulkFatal(reason)) => s"fatal store rejection for key ${r.key}: $reason"
      }
      fatal.foreach(msg => throw new IllegalStateException(msg))
      val failed = remaining.zip(results).collect { case (r, BulkRetryable(_)) => r }
      itemsSent0 += remaining.length - failed.length
      if (failed.nonEmpty) {
        attempt += 1
        retries0 += 1
        if (attempt > maxRetries)
          throw new IllegalStateException(
            s"bulk write failed after $maxRetries retries (${failed.length} items, " +
              s"first key ${failed.head.key})")
        sleeper(backoffMs << (attempt - 1).min(6))
      }
      remaining = failed
    }
  }

  def close(): Unit =
    try flush() finally client.close()

  /** Tear down without flushing — the error path for a partition the
    * engine is about to retry (flushing a partial epoch would be wasted
    * work the replay overwrites anyway).
    */
  def abort(): Unit = client.close()
}

/** Keyed upsert/delete sink against an external document store — the
  * reference's `ElasticUpsertTableSink` emitting `(true, row) -> upsert,
  * (false, row) -> delete` (ElasticUpsertTableSink.scala:146-147), as a
  * distributed Spark writer. Documents are the row's fields by name
  * (RowUpsertElasticSinkFunction's json map, :127-131); keys render via
  * [[KeyCodec]] (collision-safe vs the reference's ":"-join, :125).
  */
final class NetworkUpsertSink(factory: DocumentStoreClientFactory,
                              val keyFields: Seq[String],
                              maxActions: Int = 512,
                              maxRetries: Int = 5,
                              backoffMs: Long = 50L) extends Serializable {

  private def doc(row: Row): Map[String, Any] =
    row.schema.fieldNames.iterator.map(f => f -> row.getAs[Any](f)).toMap

  private def writeRequests(df: DataFrame, toReq: Row => DocRequest): Unit = {
    val f = factory; val (ma, mr, bo) = (maxActions, maxRetries, backoffMs)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val w = new BulkWriter(f.open(), ma, mr, bo)
        try { it.foreach(r => w.add(toReq(r))); w.close() }
        catch { case e: Throwable => w.abort(); throw e }
      }
    }
  }

  /** Batch/foreachBatch path: ship `upserts` then `deletes` (each keyed,
    * full-document). Matches [[ParquetUpsertSink.upsert]]'s signature so
    * the cascade can mirror its level-2 changelog here.
    */
  def applyChangelog(upserts: DataFrame, deletes: DataFrame = null): Unit = {
    val keys = keyFields
    writeRequests(upserts, r => DocUpsert(KeyCodec.render(r, keys), doc(r)))
    if (deletes != null)
      writeRequests(deletes, r => DocDelete(KeyCodec.render(r, keys)))
  }

  /** Append-mode streaming path (the reference's append branch,
    * ElasticUpsertTableSink.scala:97-115): one buffered writer per
    * partition epoch via the foreach sink.
    */
  def foreachWriter: ForeachWriter[Row] = {
    val f = factory; val (ma, mr, bo, keys) = (maxActions, maxRetries, backoffMs, keyFields)
    new ForeachWriter[Row] {
      @transient private var w: BulkWriter = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        w = new BulkWriter(f.open(), ma, mr, bo); true
      }
      override def process(row: Row): Unit =
        w.add(DocUpsert(KeyCodec.render(row, keys),
          row.schema.fieldNames.iterator.map(fn => fn -> row.getAs[Any](fn)).toMap))
      override def close(errorOrNull: Throwable): Unit =
        if (w != null) { if (errorOrNull == null) w.close() else w.abort() }
    }
  }
}

/** In-JVM document store with injectable fault schedules — the test double
  * that makes the network contract verifiable in this sandbox. Stores are
  * registered by id in a JVM-global registry so executor threads in local
  * mode and the driver-side assertions see the same map (documented local-
  * mode-only seam; a real deployment replaces the factory wholesale).
  */
object MemoryDocStore {
  private val stores = TrieMap.empty[String, TrieMap[String, Map[String, Any]]]
  private val bulkCalls = TrieMap.empty[String, AtomicInteger]

  def store(id: String): TrieMap[String, Map[String, Any]] =
    stores.getOrElseUpdate(id, TrieMap.empty)
  def calls(id: String): AtomicInteger =
    bulkCalls.getOrElseUpdate(id, new AtomicInteger(0))
  def clear(id: String): Unit = { stores.remove(id); bulkCalls.remove(id); () }

  /** Fault schedule: the first `failFirstN` bulk calls against the store id
    * return all-retryable (a store-wide brownout); keys in `fatalKeys` are
    * permanently rejected (a poison document).
    */
  final case class Factory(id: String, failFirstN: Int = 0,
                           fatalKeys: Set[String] = Set.empty)
      extends DocumentStoreClientFactory {
    override def open(): DocumentStoreClient = new DocumentStoreClient {
      override def bulk(requests: Seq[DocRequest]): Seq[BulkItemResult] = {
        val n = calls(id).incrementAndGet()
        if (n <= failFirstN) return requests.map(_ => BulkRetryable(s"brownout $n"))
        val s = store(id)
        requests.map {
          case r if fatalKeys.contains(r.key) => BulkFatal("poison document")
          case DocUpsert(k, d) => s.put(k, d); BulkOk
          case DocDelete(k) => s.remove(k); BulkOk
        }
      }
    }
  }
}
