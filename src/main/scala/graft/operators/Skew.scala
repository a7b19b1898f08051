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
}
