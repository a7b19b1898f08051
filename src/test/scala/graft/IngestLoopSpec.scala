package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.DocsJsonl

/** The full round-trip a production ingest runs continuously, as ONE test:
  * JSONL files land in a directory -> the declared-schema stream parses and
  * quarantines them -> each micro-batch is judged against the persisted
  * corpus band table -> keepers are admitted -> the query is STOPPED and
  * RESTARTED from its checkpoint with a new file in the landing zone.
  * The restart must (a) not re-emit batch-1 verdicts (file-source offsets
  * live in the checkpoint) and (b) see batch-1's admissions as corpus —
  * the two durability claims the loop's pieces make individually.
  */
class IngestLoopSpec extends SparkSpec {

  /** Serialize rows as a single JSONL file dropped into the landing dir —
    * how files arrive in practice: atomically, one at a time.
    */
  private def land(df: org.apache.spark.sql.DataFrame, landing: String, name: String): Unit = {
    val tmp = Files.createTempDirectory("land_stage").toString
    df.coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
    Files.move(part.toPath, Paths.get(landing, name), StandardCopyOption.ATOMIC_MOVE); ()
  }

  test("landing zone to corpus: stream admits, checkpoint restart resumes without re-emitting") {
    import spark.implicits._
    val s2 = spark.newSession()
    Dedup.persistCorpusBands(s2, Sf0001, "corpus_loop_t", buckets = 4)
    val landing = Files.createTempDirectory("landing").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    try {
      val docs = s2.read.parquet(s"$Sf0001/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
      land(docs.filter(col("doc_id") % 10 === 8), landing, "batch1.json")

      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long, Double)]
      def run(): Unit = {
        val q = Dedup.incrementalStreamAdmitting(
          DocsJsonl.streamFromJsonl(s2, landing), "corpus_loop_t", Some(ckpt)) { v =>
          got ++= v.select("doc_id", "keep", "match_doc", "match_sim")
            .as[(Long, Boolean, Long, Double)].collect(); ()
        }
        try q.processAllAvailable() finally q.stop()
      }

      run()
      val batch1Ids = docs.filter(col("doc_id") % 10 === 8)
        .select("doc_id").as[Long].collect().toSet
      assert(got.map(_._1).toSet === batch1Ids)
      val keeper = got.filter(_._2).map(_._1).min
      val keeperText = docs.filter(col("doc_id") === keeper)
        .select("text").as[String].head()
      got.clear()

      // second landing-zone file arrives while the query is DOWN: the
      // restarted query must pick up exactly this file, and its clone of a
      // batch-1 keeper is only flaggable if batch 1's admissions persisted
      val clone = Seq((88000002L, keeperText, "xx", "probe", keeperText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      land(docs.filter(col("doc_id") % 10 === 9).unionByName(clone),
        landing, "batch2.json")

      run()
      val batch2Ids = docs.filter(col("doc_id") % 10 === 9)
        .select("doc_id").as[Long].collect().toSet + 88000002L
      assert(got.map(_._1).toSet === batch2Ids,
        "restart must emit exactly the new file's verdicts — no batch-1 replay")
      val cloneV = got.find(_._1 === 88000002L).get
      assert(!cloneV._2, "clone of an admitted batch-1 keeper must be flagged dup")
      assert(cloneV._3 === keeper)
      assert(cloneV._4 === 1.0)
    } finally {
      s2.sql("DROP TABLE IF EXISTS corpus_loop_t"); ()
    }
  }

  test("compaction trigger: skips at the sealed floor, fires past the threshold, folds back") {
    val s2 = spark.newSession()
    Dedup.persistCorpusBands(s2, Sf0001, "corpus_cpol_t", buckets = 4)
    try {
      Dedup.compactCorpusBands(s2, "corpus_cpol_t")
      val rows0 = s2.table("corpus_cpol_t").count()
      val (r0, f0) = Dedup.compactIfFragmented(s2, "corpus_cpol_t", "band_key")
      assert(!f0 && r0 <= Dedup.CompactMaxFilesPerBucket,
        s"the sealed layout must be below the trigger: $r0")
      // replay-style appends: re-append the table's own rows (worst-case
      // residue — every row a duplicate) until fragmentation crosses the
      // threshold; pre-fire decisions must be consistent with the measured
      // ratio in BOTH directions
      def append(): Unit = s2.table("corpus_cpol_t")
        .write.mode("append").bucketBy(4, "band_key").saveAsTable("corpus_cpol_t")
      var fired = false
      var rounds = 0
      while (!fired && rounds < 5) {
        append()
        val (r, f) = Dedup.compactIfFragmented(s2, "corpus_cpol_t", "band_key")
        assert(f === (r > Dedup.CompactMaxFilesPerBucket),
          s"decision must follow the measured ratio: ($r, $f)")
        fired = f
        rounds += 1
      }
      assert(fired, "appends must eventually cross the threshold")
      // the fold lands back at the one-file-per-bucket floor and DISTINCT
      // drops the duplicate rows the appends (= replay residue) left
      val (r2, f2) = Dedup.compactIfFragmented(s2, "corpus_cpol_t", "band_key")
      assert(!f2 && r2 <= 1.0, s"post-fold layout must sit at the floor: $r2")
      assert(s2.table("corpus_cpol_t").count() === rows0,
        "the fold must restore the distinct row set")
    } finally {
      s2.sql("DROP TABLE IF EXISTS corpus_cpol_t"); ()
    }
  }

  test("the fragmentation trigger is family-generic: IVF fires its distinct rewrite, content-invariant") {
    import graft.operators.Similarity
    val s2 = spark.newSession()
    s2.sql("DROP TABLE IF EXISTS cpol_ivf_t")
    try {
      Similarity.persistIvfIndex(s2, Sf0001, "cpol_ivf_t")
      Similarity.compactIvfIndex(s2, "cpol_ivf_t")
      val rows0 = s2.table("cpol_ivf_t").count()
      var fires = 0
      def trigger() = Dedup.compactIfFragmentedWith(s2, "cpol_ivf_t")(
        () => { fires += 1; Similarity.compactIvfIndex(s2, "cpol_ivf_t"); () })
      val (r0, f0) = trigger()
      assert(!f0 && fires === 0 && r0 <= Dedup.CompactMaxFilesPerBucket,
        s"the sealed layout must skip: $r0")
      def append(): Unit = s2.table("cpol_ivf_t")
        .write.mode("append").bucketBy(8, "label").saveAsTable("cpol_ivf_t")
      var fired = false
      var rounds = 0
      while (!fired && rounds < 5) {
        append()
        val (r, f) = trigger()
        assert(f === (r > Dedup.CompactMaxFilesPerBucket),
          s"decision must follow the measured ratio: ($r, $f)")
        fired = f
        rounds += 1
      }
      assert(fired && fires === 1, "appends must eventually cross the threshold")
      assert(s2.table("cpol_ivf_t").count() === rows0,
        "the fired fold must restore the distinct row set")
    } finally { s2.sql("DROP TABLE IF EXISTS cpol_ivf_t"); () }
  }

  test("the fragmentation trigger fires BM25's marker-fenced compaction, search-invariant") {
    import graft.operators.TextAnalysis
    val s2 = spark.newSession()
    val (p, f, st) = ("cpol_bm_post", "cpol_bm_df", "cpol_bm_stats")
    Seq(p, f, st).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      TextAnalysis.bm25IndexWrites(s2, Sf0001, p, f, st).foreach(_._2())
      TextAnalysis.compactBm25Index(s2, p, f, st) // seal at the floor
      val queries = TextAnalysis.bm25QueriesOf(TextAnalysis.bm25Corpus(s2, Sf0001))
      val want = TextAnalysis.bm25SearchAgainst(s2, queries, p, f, st)
        .collect().map(_.toString).toSeq
      var fires = 0
      def trigger() = Dedup.compactIfFragmentedWith(s2, p)(
        () => { fires += 1; TextAnalysis.compactBm25Index(s2, p, f, st); () })
      // sealed = at most one file per bucket (a bucket with no rows at
      // this SF writes no file, so the ratio can sit just under 1.0)
      val (rSealed, fSealed) = trigger()
      assert(!fSealed && rSealed <= 1.0, s"sealed postings must skip at <=1.0: $rSealed")
      // replay residue: re-admit the same batch (exact duplicate partials)
      val batch = graft.core.Tables.load(s2, Sf0001, "documents")
        .select("doc_id", "text").limit(50)
      var fired = false
      var rounds = 0
      while (!fired && rounds < 8) {
        TextAnalysis.bm25AdmitDocs(batch, p, f, st)
        val (r, fl) = trigger()
        assert(fl === (r > Dedup.CompactMaxFilesPerBucket),
          s"decision must follow the measured ratio: ($r, $fl)")
        fired = fl
        rounds += 1
      }
      assert(fired && fires === 1, "admissions must eventually cross the threshold")
      // the fired marker-fenced fold dropped the duplicate partials:
      // search scores exactly as before the residue
      val got = TextAnalysis.bm25SearchAgainst(s2, queries, p, f, st)
        .collect().map(_.toString).toSeq
      assert(got === want, "post-fire search differs from the sealed index")
    } finally { Seq(p, f, st).foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t")); () }
  }

  test("the maintenance scheduler serializes two families' triggers against one live ingest") {
    import graft.operators.TextAnalysis
    import graft.streaming.MaintenanceScheduler
    import org.apache.spark.sql.Row
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val root = Files.createTempDirectory("graft-sched-spec")
    def atomicCopy(src: java.nio.file.Path, dstDir: java.nio.file.Path): Unit = {
      val tmp = dstDir.resolve(s".tmp-${src.getFileName}")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dstDir.resolve(src.getFileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
    }
    // stage the arrival chunks once (same thirds for both runs)
    val arrivals = Dedup.ingestArrivals(s2, Sf0001)
    val Array(mn, mx) = arrivals.agg(min("doc_id"), max("doc_id"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val span = math.max(1L, mx - mn + 1)
    val chunkFiles = (0 until 3).map { k =>
      val d = root.resolve(s"chunk$k")
      arrivals.filter(((col("doc_id") - mn) * 3 / span).cast("int") === k)
        .repartition(1).write.parquet(d.toString)
      import scala.jdk.CollectionConverters._
      val ls = Files.list(d)
      try ls.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    }
    // one run = one live ingest (two streams over one watched dir: BM25
    // admission + dedup band admission), with `window` called after every
    // chunk. The scheduler path registers both triggers; the control path
    // registers none — verdicts must agree (schedule independence).
    def run(tag: String, sched: Option[MaintenanceScheduler => Unit]): (Seq[String], Seq[String]) = {
      val (p, f, st, bands) = (s"sched_${tag}_post", s"sched_${tag}_df",
        s"sched_${tag}_stats", s"sched_${tag}_bands")
      dropTables(p, f, st, bands)
      val watched = root.resolve(s"watched_$tag")
      Files.createDirectories(watched)
      try {
        Dedup.persistCorpusBands(s2, Sf0001, bands)
        Dedup.compactCorpusBands(s2, bands) // seal the dedup floor
        val scheduler = new MaintenanceScheduler
        sched.foreach(register => register(scheduler))
        val verdicts = scala.collection.mutable.ArrayBuffer.empty[Row]
        def stream() = s2.readStream.schema(arrivals.schema)
          .option("maxFilesPerTrigger", "1").parquet(watched.toString)
        val qBm = TextAnalysis.bm25IngestStream(
          stream().select("doc_id", "text"), p, f, st)()
        val qDd = Dedup.incrementalStreamAdmitting(stream(), bands,
          Some(root.resolve(s"ck_$tag").toString)) { v =>
          verdicts.synchronized { verdicts ++= v.collect() }; ()
        }
        try chunkFiles.foreach { cf =>
          atomicCopy(cf, watched)
          scheduler.maintenanceWindow(qBm, qDd)
        } finally { qBm.stop(); qDd.stop() }
        sched.foreach { _ =>
          val ds = scheduler.decisions
          assert(ds.map(d => (d.window, d.policy)) ===
            (1 to 3).flatMap(w => Seq((w, "bm25"), (w, "dedup"))),
            "every window must run every policy, in registration order")
          Seq("bm25", "dedup").foreach { fam =>
            val mine = ds.filter(_.policy == fam)
            assert(mine.exists(_.fired) && mine.exists(!_.fired),
              s"$fam needs both outcomes to be non-vacuous: $ds")
          }
        }
        val search = TextAnalysis.bm25SearchAgainst(s2,
            TextAnalysis.bm25QueriesOf(TextAnalysis.bm25Corpus(s2, Sf0001)), p, f, st)
          .collect().map(_.toString).sorted.toSeq
        (search, verdicts.synchronized(verdicts.map(_.toString).sorted.toSeq))
      } finally dropTables(p, f, st, bands)
    }
    try {
      val (searchA, verdictsA) = run("a", Some { s =>
        s.register("bm25")(() => Dedup.compactIfFragmentedWith(s2,
          s"sched_a_post", maxFilesPerBucket = 5.5)(
          () => { TextAnalysis.compactBm25Index(s2,
            "sched_a_post", "sched_a_df", "sched_a_stats"); () }))
          .register("dedup")(() =>
            Dedup.compactIfFragmented(s2, "sched_a_bands", "band_key"))
        ()
      })
      val (searchB, verdictsB) = run("b", None)
      assert(searchA.nonEmpty && searchA === searchB,
        "maintenance schedule changed the BM25 answers")
      assert(verdictsA.nonEmpty && verdictsA === verdictsB,
        "maintenance schedule changed the dedup verdicts")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }
}
