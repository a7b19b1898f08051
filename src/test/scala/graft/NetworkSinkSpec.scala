package graft

import scala.collection.mutable.ArrayBuffer

import graft.sinks._

/** The network document-store writer contract (the reference's
  * Elasticsearch sink shape, ElasticUpsertTableSink.scala:116-148):
  * batching, per-key coalescing, retry-with-backoff, fatal rejection,
  * ordering, and the distributed foreachPartition path against a store
  * with injected faults.
  */
class NetworkSinkSpec extends SparkSpec {

  /** Scripted client: applies requests to an in-memory map, recording
    * every bulk's size; a queue of per-call overrides injects failures.
    */
  private class ScriptedClient extends DocumentStoreClient {
    val state = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    val bulkSizes = ArrayBuffer.empty[Int]
    // each entry: a partial function overriding results for one call
    val script = scala.collection.mutable.Queue.empty[Seq[DocRequest] => Option[Seq[BulkItemResult]]]
    var closed = false

    override def bulk(reqs: Seq[DocRequest]): Seq[BulkItemResult] = {
      bulkSizes += reqs.length
      val overridden = if (script.nonEmpty) script.dequeue()(reqs) else None
      overridden.getOrElse {
        reqs.map {
          case DocUpsert(k, d) => state.put(k, d); BulkOk
          case DocDelete(k) => state.remove(k); BulkOk
        }
      }
    }
    override def close(): Unit = { closed = true }
  }

  private def up(k: String, v: Int): DocUpsert = DocUpsert(k, Map("v" -> v))

  test("writer flushes at maxActions and coalesces per key (last write wins)") {
    val c = new ScriptedClient
    val w = new BulkWriter(c, maxActions = 3, sleeper = _ => ())
    w.add(up("a", 1)); w.add(up("b", 1))
    assert(c.bulkSizes.isEmpty) // below threshold: nothing shipped yet
    w.add(up("a", 2)) // coalesces onto pending a — still 2 distinct keys
    assert(c.bulkSizes.isEmpty && w.pending === 2)
    w.add(up("c", 1)) // 3 distinct keys -> flush
    assert(c.bulkSizes.toSeq === Seq(3))
    assert(c.state("a") === Map("v" -> 2)) // the coalesced LAST value
    w.close()
    assert(c.closed && w.pending === 0)
  }

  test("upsert then delete of one key coalesces to the delete; reverse order survives") {
    val c = new ScriptedClient
    val w = new BulkWriter(c, maxActions = 100, sleeper = _ => ())
    w.add(up("gone", 1)); w.add(DocDelete("gone"))
    w.add(DocDelete("back")); w.add(up("back", 7))
    w.close()
    assert(c.bulkSizes.toSeq === Seq(2)) // one op per key per bulk
    assert(!c.state.contains("gone"))
    assert(c.state("back") === Map("v" -> 7))
  }

  test("retryable failures back off, retry only the failed items, and succeed") {
    val c = new ScriptedClient
    val slept = ArrayBuffer.empty[Long]
    // call 1: item for key "b" is throttled; call 2 (the retry): throttled
    // again; call 3: default success
    def throttleB(reqs: Seq[DocRequest]): Option[Seq[BulkItemResult]] =
      Some(reqs.map {
        case DocUpsert("b", _) => BulkRetryable("429")
        case DocUpsert(k, d) => c.state.put(k, d); BulkOk
        case DocDelete(k) => c.state.remove(k); BulkOk
      })
    c.script += throttleB _
    c.script += throttleB _
    val w = new BulkWriter(c, maxActions = 10, maxRetries = 5, backoffMs = 4L,
      sleeper = slept += _)
    w.add(up("a", 1)); w.add(up("b", 2)); w.add(up("c", 3))
    w.close()
    assert(c.bulkSizes.toSeq === Seq(3, 1, 1)) // only the failed item retries
    assert(slept.toSeq === Seq(4L, 8L)) // exponential backoff
    assert(w.retries === 2 && w.itemsSent === 3)
    assert(c.state.keySet === Set("a", "b", "c"))
  }

  test("retry exhaustion and fatal rejections fail the writer (task retry takes over)") {
    val always = (reqs: Seq[DocRequest]) =>
      Some(reqs.map(_ => BulkRetryable("503"): BulkItemResult))
    val c1 = new ScriptedClient
    (1 to 10).foreach(_ => c1.script += always)
    val w1 = new BulkWriter(c1, maxActions = 10, maxRetries = 2, sleeper = _ => ())
    w1.add(up("a", 1))
    val e1 = intercept[IllegalStateException](w1.flush())
    assert(e1.getMessage.contains("after 2 retries"))

    val c2 = new ScriptedClient
    c2.script += ((reqs: Seq[DocRequest]) =>
      Some(reqs.map(_ => BulkFatal("mapping conflict"): BulkItemResult)))
    val w2 = new BulkWriter(c2, maxActions = 10, sleeper = _ => ())
    w2.add(up("a", 1))
    val e2 = intercept[IllegalStateException](w2.flush())
    assert(e2.getMessage.contains("fatal store rejection"))
  }

  test("cross-flush per-key order is preserved (no stale value resurrection)") {
    val c = new ScriptedClient
    val w = new BulkWriter(c, maxActions = 1, sleeper = _ => ()) // flush every add
    w.add(up("k", 1)); w.add(up("k", 2)); w.add(DocDelete("k")); w.add(up("k", 3))
    w.close()
    assert(c.bulkSizes.toSeq === Seq(1, 1, 1, 1))
    assert(c.state("k") === Map("v" -> 3))
  }

  test("distributed foreachPartition path delivers through a brownout; deletes apply") {
    import spark.implicits._
    val storeId = "spec-net-sink"
    MemoryDocStore.clear(storeId)
    val sink = new NetworkUpsertSink(
      MemoryDocStore.Factory(storeId, failFirstN = 3),
      Seq("k"), maxActions = 2, maxRetries = 8, backoffMs = 1L)
    val ups = (1 to 20).map(i => (i.toLong, s"doc$i")).toDF("k", "payload")
      .repartition(4)
    val dels = Seq(3L, 7L).map(k => (k, "")).toDF("k", "payload")
    sink.applyChangelog(ups, dels)
    val store = MemoryDocStore.store(storeId)
    assert(store.size === 18)
    assert(MemoryDocStore.calls(storeId).get() > 3) // the brownout really fired
    // spot-check a surviving doc and both deletions by rendered key
    val keys = store.keySet
    assert(keys.exists(_.contains("v1:5")))
    assert(!keys.exists(_.contains("v1:3")) && !keys.exists(_.contains("v1:7")))
    MemoryDocStore.clear(storeId)
  }
}
