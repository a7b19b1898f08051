package graft

import graft.operators.TextAnalysis

/** PII scrub unit coverage on PII-bearing text — the driver corpus has no
  * email/URL/phone strings, so these probes are the only place the match
  * branches are asserted against hand-computed expectations (the
  * correctness gate additionally unions the same probes into
  * `txt_pii_scrub`, see TextAnalysis.piiProbes).
  */
class TextAnalysisSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val rows: Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    TextAnalysis.piiScrubDf(TextAnalysis.piiProbes.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
  }

  test("piiScrub counts emails, urls, phones on PII-bearing docs") {
    assert(rows(9000001L)._1 === 2L) // two emails
    assert(rows(9000002L)._2 === 2L) // two urls
    assert(rows(9000003L)._3 === 2L) // two phones
    assert((rows(9000001L)._2, rows(9000001L)._3) === ((0L, 0L)))
  }

  test("piiScrub email dot is literal, not a wildcard (round-3 regression)") {
    // bob@example,com / 12-345-6789 / ftp://x.y must all be non-matches;
    // with `\.` unescaped to `.` the comma would match and n_emails would be 1.
    assert(rows(9000004L) ===
      ((0L, 0L, 0L, md5hex("Not an email: bob@example,com plus 12-345-6789 plus ftp://x.y end"))))
  }

  test("piiScrub redaction output is byte-exact") {
    assert(rows(9000001L)._4 === md5hex("Contact <EMAIL> or <EMAIL> today"))
    assert(rows(9000002L)._4 === md5hex("See <URL> and <URL> for details"))
    assert(rows(9000003L)._4 === md5hex("Call <PHONE> or <PHONE> now"))
  }

  test("boilerplate scrub: clean docs survive byte-exact, dirty docs are cut") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val joined = TextAnalysis.boilerplateScrub(spark, sf)
      .join(TextAnalysis.boilerplate(spark, sf), "doc_id")
      .join(graft.core.Tables.load(spark, sf, "documents").select("doc_id", "text"), "doc_id")
      .select("doc_id", "n_boiler", "n_dropped", "clean_md5", "text")
      .collect()
    assert(joined.nonEmpty)
    // detect→scrub symmetry: a doc the detector calls clean must come out
    // of the scrub byte-identical (md5 of the untouched text)...
    val clean = joined.filter(_.getAs[Long]("n_boiler") == 0L)
    assert(clean.nonEmpty)
    clean.foreach { r =>
      assert(r.getAs[Long]("n_dropped") === 0L, s"doc ${r.getLong(0)} lost tokens")
      assert(r.getAs[String]("clean_md5") === md5hex(r.getAs[String]("text")),
        s"doc ${r.getLong(0)} not byte-exact after scrub")
    }
    // ...and the cut branch must actually fire on the fixture (non-vacuous)
    assert(joined.exists(_.getAs[Long]("n_dropped") > 0L))
  }
}
