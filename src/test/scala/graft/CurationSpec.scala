package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Relational, Similarity, TaxiQueries, Training}

/** Round-16 curation/serving operators: fuzzy decontamination, hard-
  * negative mining, salted skew join, payload dedup, and the outer pair
  * join — each pinned against an in-repo reference formulation (the
  * sf0.01 DuckDB oracles hold the cross-engine equalities; these specs
  * hold the cross-OPERATOR ones).
  */
class CurationSpec extends SparkSpec {

  test("fuzzy decontamination equals the cross-side slice of the verified LSH pairs") {
    // minhashLsh is the oracle-verified pair generator; the fuzzy
    // decontamination result must be exactly its (train, bench) slice at
    // the contamination threshold
    val lsh = Dedup.minhashLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val m = Training.FuzzyBenchMod
    val expected = lsh.flatMap { case (a, b, s) =>
      val (aB, bB) = (a % m == 0, b % m == 0)
      if (s >= Training.FuzzyContamSim && aB != bB)
        Some(if (bB) (a, b, s) else (b, a, s)) // (train, bench)
      else None
    }.sorted.toSeq
    val got = Training.contaminationFuzzy(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got === expected)
    got.foreach { case (t, b, s) =>
      assert(t % m != 0 && b % m == 0, s"($t,$b) is not a (train,bench) pair")
      assert(s >= Training.FuzzyContamSim)
      assert((s * Dedup.NumPerms) == math.rint(s * Dedup.NumPerms), "est_sim must be k/16")
    }
  }

  test("salted join equals the plain join row for row") {
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("long") * 7 + 3)
    val plain = ev.join(dim, "event_type")
      .groupBy("user_id")
      .agg(sum("weight").as("w_sum"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = Relational.saltedEventJoin(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("payload dedup: canonical is the min id of its identical-payload group") {
    val feats = Multimodal.payloadDedup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // every doc exactly once
    assert(feats.map(_._1).distinct.length === feats.length)
    val byCanon = feats.groupBy(_._3)
    byCanon.foreach { case (canon, members) =>
      // the canonical member exists, is flagged, and is the group min
      assert(members.map(_._1).min === canon)
      assert(members.count(_._4) === 1)
      assert(members.find(_._4).get._1 === canon)
    }
    // the duplicate count equals a direct text-level recount (payload ==
    // UTF-8 text bytes in this fixture); sf0.001 may contain zero exact
    // duplicates — the sf0.01 oracle covers the collapsing corpus
    val expectedDups = spark.read.parquet(s"$Sf0001/documents.parquet")
      .groupBy((col("doc_id") % 3).as("k"), col("text")).count()
      .filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
    assert(feats.count(f => !f._4).toLong === expectedDups)
  }

  test("hard negatives: foreign-label only, dense ranks, non-increasing cosine") {
    val hn = Similarity.hardNegatives(spark, Sf0001)
    val labels = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    // no neighbor shares its query's label
    val sameLabel = hn
      .join(labels.withColumnRenamed("vec_id", "q_id").withColumnRenamed("label", "q_label"), "q_id")
      .join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .filter(col("label") === col("q_label"))
      .count()
    assert(sameLabel === 0L)
    val rows = hn.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq, s"ranks not dense for $q")
      sorted.sliding(2).foreach {
        case Array((_, _, c1), (_, _, c2)) => assert(c1 >= c2, s"cosine increases for $q")
        case _ => ()
      }
    }
  }

  test("length buckets: monotone in length, near-balanced, length-deterministic") {
    val rows = graft.operators.Pipeline.lengthBuckets(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = rows.length
    val k = graft.operators.Pipeline.LengthBuckets
    // same length -> same bucket (partition-independent determinism)
    rows.groupBy(_._2).foreach { case (len, rs) =>
      assert(rs.map(_._3).distinct.length === 1, s"length $len split across buckets")
    }
    // bucket is monotone non-decreasing in length
    val byLen = rows.groupBy(_._2).map { case (len, rs) => (len, rs.head._3) }.toSeq.sortBy(_._1)
    byLen.sliding(2).foreach {
      case Seq((_, b1), (_, b2)) => assert(b1 <= b2)
      case _ => ()
    }
    // buckets cover [0, k) and are balanced up to tie-granularity: each
    // bucket holds <= n/k + (largest tie group) docs
    assert(rows.map(_._3).min >= 0 && rows.map(_._3).max < k)
    val maxTie = rows.groupBy(_._2).values.map(_.size).max
    rows.groupBy(_._3).values.foreach { b =>
      assert(b.size <= n / k + maxTie, s"bucket of ${b.size} exceeds balance bound")
    }
  }

  test("outer pair join: matched rows equal the inner join, unmatched are the dropped ends plus over-long rides") {
    val outer = TaxiQueries.q8PairOuter(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val inner = TaxiQueries.q8PairJoin(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val keptInner = inner.filter(_._1 % TaxiQueries.PairEndDropMod != TaxiQueries.PairEndDropRem)
    assert(outer.filter(_._5).map(t => (t._1, t._2, t._3, t._4)).sorted.toSeq
      === keptInner.sorted.toSeq)
    // the UNMATCHED population under the shared MaxRideMs bound (the bound
    // the streaming twin needs for state eviction, stated by all three
    // formulations): a START is unmatched iff its END was dropped OR the
    // ride is over-long. sf0.001 carries 36 over-long pairs (max gap
    // ~4.9 h > 2 h) while sf0.01 carries none — this spec fixture is the
    // only place the bound's effect is visible, which is exactly why the
    // batch form must state it: an unbounded batch query would silently
    // answer a wider question than its stream twin on data like this.
    val raw = {
      val rides = graft.sources.Rides.fromEvents(spark, Sf0001)
      import org.apache.spark.sql.functions._
      val s = rides.filter(col("isStart"))
        .select(expr("rideId div 2").as("pid"), unix_millis(col("rowtime")).as("sm"))
      val e = rides.filter(!col("isStart"))
        .select(expr("rideId div 2").as("pid"), unix_millis(col("rowtime")).as("em"))
      s.join(e, "pid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    val overlong = raw.filter(t => math.abs(t._3 - t._2) > TaxiQueries.MaxRideMs)
      .map(_._1).toSet
    assert(overlong.nonEmpty, "fixture must carry over-long rides or the bound is untested")
    val dropped = (pid: Long) =>
      pid % TaxiQueries.PairEndDropMod == TaxiQueries.PairEndDropRem
    val unmatched = outer.filter(!_._5)
    assert(unmatched.nonEmpty, "the END-drop must make the outer join non-vacuous")
    assert(unmatched.forall(u => (dropped(u._1) || overlong.contains(u._1))
      && u._3 == -1L && u._4 == -1L))
    // and completeness: every over-long, non-dropped pair IS unmatched
    val unmatchedIds = unmatched.map(_._1).toSet
    assert(overlong.filterNot(dropped).subsetOf(unmatchedIds))
  }

  test("token budget: bucketed three-phase plan equals the single-window spec") {
    import org.apache.spark.sql.expressions.Window
    val Pipeline = graft.operators.Pipeline
    // the straight formulation the oracle runs in DuckDB, here in Spark:
    // one running token sum per source in (hash, doc_id) order
    val d = spark.read.parquet(s"$Sf0001/documents.parquet").selectExpr(
      "doc_id", "source",
      "CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS BIGINT) AS n_tokens",
      "CAST(conv(substr(md5(concat('tb:', CAST(doc_id AS STRING))), 1, 12), 16, 10) AS BIGINT) AS h")
    val budgets = d.groupBy("source").agg(
      expr(s"(sum(n_tokens) * ${Pipeline.TokenBudgetNum}) DIV ${Pipeline.TokenBudgetDen}")
        .as("budget"))
    val expected = d
      .withColumn("cum", sum("n_tokens").over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(budgets, "source")
      .select(col("doc_id"), (col("cum") <= col("budget")).as("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    val got = Pipeline.tokenBudget(spark, Sf0001)
      .select("doc_id", "keep")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(got === expected)
    // non-vacuous: both verdicts occur, and every source keeps something
    val bySource = Pipeline.tokenBudget(spark, Sf0001)
      .groupBy("source").agg(
        sum(when(col("keep"), 1).otherwise(0)).as("kept"),
        sum(when(col("keep"), 0).otherwise(1)).as("dropped"))
      .collect()
    assert(bySource.forall(r => r.getLong(1) > 0), "every source must keep inside its budget")
    assert(bySource.exists(r => r.getLong(2) > 0), "the budget must actually cut something")
  }

  test("phash near-dup: banded equi-join equals brute-force pairing (pigeonhole exactness)") {
    // the pigeonhole claim is the load-bearing scale argument: at Hamming
    // <= bands-1, band pruning loses NOTHING vs all-pairs
    val ph = Multimodal.phashes(Multimodal.mediaRecords(spark, Sf0001)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = ph.map { case (id, kind, h) =>
      val cands = ph.filter { case (id2, kind2, h2) =>
        id2 < id && kind2 == kind &&
          java.lang.Long.bitCount(h ^ h2) <= Multimodal.PhashMaxHamming
      }.map { case (id2, _, h2) => (java.lang.Long.bitCount(h ^ h2).toLong, id2) }
      if (cands.isEmpty) (id, kind, true, -1L, -1L)
      else { val (ham, mid) = cands.min; (id, kind, false, mid, ham) }
    }.sortBy(_._1).toSeq
    val got = Multimodal.phashDedup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === brute)
    // non-vacuous: the fixture's exact-duplicate texts are Hamming-0
    // near-dups, so drops must occur; distinct docs must also survive
    assert(got.exists(!_._3), "no near-dup found — the radius/banding is vacuous")
    assert(got.exists(_._3), "everything matched — the radius is degenerate")
    got.filter(!_._3).foreach { case (id, _, _, mid, ham) =>
      assert(mid >= 0 && mid < id && ham >= 0 && ham <= Multimodal.PhashMaxHamming)
    }
  }

  test("streaming token budget: prefix cutoff carries across batches, dropped docs still spend") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Pipeline
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // n words of plain letters = n tokens under the budget regex
      def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
      val budgets = Map("a" -> 10L, "b" -> 3L) // "c" absent => budget 0
      val input = MemoryStream[(Long, String, String)](spark)
      val docs = input.toDF().toDF("doc_id", "source", "text")
      val q = Pipeline.TokenBudgetStream.query(docs, budgets).toDF()
        .writeStream.format("memory").queryName("tok_budget_v")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tokbudck").toString)
        .start()
      // batch 1: a consumes 4 + 3 = 7 of 10
      input.addData((1L, "a", words(4)), (2L, "a", words(3)))
      q.processAllAvailable()
      // batch 2, deliberately added out of doc_id order: verdicts must
      // follow doc_id order. doc 3 (5 tokens) crosses: 7+5=12 > 10, drop;
      // doc 4 (2 tokens) would fit the REMAINDER (7+2=9) but the cutoff
      // is a prefix of the order, so the spent sum is 14 and it drops.
      // Source b lands exactly on its boundary (cum 3 <= 3, keep); c has
      // no budget entry and drops at cum 1 > 0.
      input.addData((4L, "a", words(2)), (3L, "a", words(5)),
        (5L, "b", words(3)), (6L, "c", words(1)))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tok_budget_v")
        .select("doc_id", "n_tokens", "keep")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toList
      assert(got === List((1L, 4L, true), (2L, 3L, true), (3L, 5L, false),
        (4L, 2L, false), (5L, 3L, true), (6L, 1L, false)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
