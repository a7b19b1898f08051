package graft.core

import org.apache.spark.sql.SparkSession

/** The FIT/APPLY persistence discipline shared by the trained-model
  * families (BPE merges, Naive-Bayes weights, k-means centroids; the
  * bucketed layouts in Relational/Similarity follow the same contract
  * with their own writers): a model table is keyed on its source dir AND
  * a model fingerprint via the `graft.src` table property, rebuilt only
  * when stale, and re-used by every later apply — training cost is paid
  * once per (source, model) pair, which is the entire point at 100 TB.
  */
object ModelTables {

  /** The stored staleness key: source dir plus the model fingerprint
    * (hyperparameters + learner version). Changing either against an
    * existing warehouse forces a rebuild — a param-only change would
    * otherwise silently reuse the stale table until the oracle gate
    * caught it. The dir is length-prefixed so the encoding is injective:
    * a bare `dir#params` join would let a dir literally containing '#'
    * collide with a different (dir, params) pair and spuriously report
    * the table as current.
    */
  private def srcKey(dir: String, params: String): String =
    s"${dir.length}:$dir#$params"

  /** Managed tables live at <warehouse>/<table>; that equation only holds
    * for simple lowercase names in the default database, so the writers
    * refuse anything else rather than deleting the wrong path.
    */
  private def requireSimpleName(table: String): Unit =
    require(table.matches("[a-z][a-z0-9_]*"),
      s"model table must be a simple lowercase name in the default database, got '$table'")

  /** True when `table` exists and was built from `dir` with the same
    * model fingerprint. The fixture dirs are immutable, so dir identity
    * == data identity.
    */
  def isCurrent(spark: SparkSession, table: String, dir: String,
      params: String = ""): Boolean =
    spark.catalog.tableExists(table) &&
      (try spark.sql(s"SHOW TBLPROPERTIES $table ('graft.src')")
        .collect().headOption.exists(_.getString(1) == srcKey(dir, params))
      catch { case _: Exception => false })

  /** Run `write` (which must saveAsTable `table`) unless the stored model
    * is already current, then stamp the source property. Clears BOTH
    * catalog layers first: a fresh session's in-memory catalog doesn't
    * know a previous session's table, and saveAsTable refuses its
    * orphaned warehouse dir (LOCATION_ALREADY_EXISTS).
    */
  def persistIfStale(spark: SparkSession, dir: String, table: String,
      params: String = "")(write: => Unit): Unit = {
    requireSimpleName(table)
    if (isCurrent(spark, table, dir, params)) return
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    fs.delete(new org.apache.hadoop.fs.Path(wh, table), true)
    write
    // single quotes in dir would break the literal; isCurrent compares the
    // RAW key, so escaping only the write side is safe
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('graft.src' = '${srcKey(dir, params).replace("'", "''")}')")
    ()
  }
}
