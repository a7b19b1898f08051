package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's runtime skew-join splitting handles most
  * cases (enabled in the engine sessions); salting is the explicit fallback
  * when one grouping key dominates — the classic case in LLM-corpus work
  * (an empty-string document, a boilerplate shingle, a null-ish user id).
  */
object Skew {

  /** Two-stage salted aggregation: count per (key, salt) first — spreading
    * one hot key over `salts` reducers — then sum the partials per key.
    * Result is identical to a direct groupBy(key).count(); only the shuffle
    * distribution changes (integer partial sums are associative, so the
    * two-stage split is exact, unlike float sums).
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame = {
    df.select(key.as("k"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy("k", "salt").agg(count(lit(1)).as("partial"))
      .groupBy("k").agg(sum("partial").as("cnt"))
  }

  /** Salted equi-join for a skewed FACT side: each fact row takes one of
    * `salts` pseudo-random salt values, the (small) dimension is
    * replicated once per salt, and the join key becomes (key, salt) — so
    * one hot key's rows spread over `salts` reducers instead of
    * hot-spotting one. Exact for any salt assignment: every fact row
    * still meets exactly its dimension row (each dim key exists at every
    * salt), so the result equals the unsalted join row for row — only
    * the shuffle distribution changes. Cost: dim × salts replication,
    * the standard trade (cheap while salts × |dim| stays dimension-
    * scale). AQE's skew splitting handles sort-merge spills
    * automatically; explicit salting is the form that also fixes
    * skewed HASH joins and composes with bucketed layouts.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val dimX = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(dimX, Seq(key, "graft_salt")).drop("graft_salt")
  }
}
