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
}
