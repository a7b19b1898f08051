package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's runtime skew-join splitting handles most
  * cases (enabled in the engine sessions); salting is the explicit fallback
  * when one grouping key dominates — the classic case in LLM-corpus work
  * (an empty-string document, a boilerplate shingle, a null-ish user id).
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): a content hash over EVERY
    * column of the row, so a recomputed map task assigns the identical
    * salt to the identical row. Salting from spark_partition_id() /
    * monotonically_increasing_id() is the textbook trap this replaces:
    * those are nondeterministic across partial stage recomputation (fetch
    * failure, executor loss after some reducers already pulled map
    * output), so a re-run map task could re-salt the same rows
    * differently and rows would be lost or duplicated across (key, salt)
    * reduce partitions — precisely in the at-scale failure scenario the
    * salt exists for. Content hashing is stable under any replay.
    *
    * INPUT CONTRACT (load-bearing, see [[saltedCount]]/[[saltedJoin]]):
    * byte-identical duplicate rows collapse to ONE salt, so a hot key
    * whose rows are FULL-ROW identical still hot-spots a single
    * (key, salt) reducer — the degeneration this helper exists to
    * prevent. Callers must therefore pass a frame that carries at least
    * one distinguishing column alongside the key (a row id, an event
    * timestamp, any payload column — every fact table here has one);
    * pure-key projections and exact-duplicate-heavy frames are out of
    * contract (exact-duplicate VOLUME is [[Dedup.exact]]'s job,
    * upstream). OperatorsSpec pins the spread on the contract shape.
    *
    * Only hash-supported column types participate: MapType is excluded
    * (Spark's hash expressions reject maps by default —
    * `spark.sql.legacy.allowHashOnMapType`), so a map-carrying frame
    * salts by its remaining columns instead of throwing AnalysisException.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case a: ArrayType => containsMap(a.elementType)
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  private[graft] def contentSalt(df: DataFrame, salts: Int): Column = {
    val hashable = df.schema.fields.filterNot(f => containsMap(f.dataType))
    require(hashable.nonEmpty,
      "contentSalt: no hash-supported columns to derive a salt from")
    pmod(xxhash64(hashable.map(f => col(f.name)).toIndexedSeq: _*),
      lit(salts.toLong)).cast("int")
  }

  /** Two-stage salted aggregation: count per (key, salt) first — spreading
    * one hot key over `salts` reducers — then sum the partials per key.
    * Result is identical to a direct groupBy(key).count(); only the shuffle
    * distribution changes (integer partial sums are associative, so the
    * two-stage split is exact, unlike float sums). The salt hashes the
    * FULL input row (before the key projection) so rows of one hot key
    * spread even when the key itself is the hot value — which is also the
    * input contract: `df` must carry a distinguishing column beyond the
    * key (see [[contentSalt]]); a keys-only projection defeats the spread.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame = {
    df.withColumn("salt", contentSalt(df, salts))
      .select(key.as("k"), col("salt"))
      .groupBy("k", "salt").agg(count(lit(1)).as("partial"))
      .groupBy("k").agg(sum("partial").as("cnt"))
  }

  /** Salted equi-join for a skewed FACT side: each fact row takes one of
    * `salts` content-derived salt values, the (small) dimension is
    * replicated once per salt, and the join key becomes (key, salt) — so
    * one hot key's rows spread over `salts` reducers instead of
    * hot-spotting one. Exact for any salt assignment AND stable under
    * stage recomputation (see [[contentSalt]]): every fact row still
    * meets exactly its dimension row (each dim key exists at every
    * salt), so the result equals the unsalted join row for row — only
    * the shuffle distribution changes. Cost: dim × salts replication,
    * the standard trade (cheap while salts × |dim| stays dimension-
    * scale). AQE's skew splitting handles sort-merge spills
    * automatically; explicit salting is the form that also fixes
    * skewed HASH joins and composes with bucketed layouts.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("graft_salt", contentSalt(fact, salts))
    val dimX = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(dimX, Seq(key, "graft_salt")).drop("graft_salt")
  }
}
