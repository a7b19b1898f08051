package graft.core

import org.apache.spark.sql.SparkSession

/** The FIT/APPLY persistence discipline shared by the trained-model
  * families (BPE merges, Naive-Bayes weights; the bucketed layouts in
  * Relational/Similarity follow the same contract with their own
  * writers): a model table is keyed on its source dir via the
  * `graft.src` table property, rebuilt only when stale, and re-used by
  * every later apply — training cost is paid once per (source, model)
  * pair, which is the entire point at 100 TB.
  */
object ModelTables {

  /** True when `table` exists and was built from `dir`. The fixture dirs
    * are immutable, so dir identity == data identity.
    */
  def isCurrent(spark: SparkSession, table: String, dir: String): Boolean =
    spark.catalog.tableExists(table) &&
      (try spark.sql(s"SHOW TBLPROPERTIES $table ('graft.src')")
        .collect().headOption.exists(_.getString(1) == dir)
      catch { case _: Exception => false })

  /** Run `write` (which must saveAsTable `table`) unless the stored model
    * is already current, then stamp the source property. Clears BOTH
    * catalog layers first: a fresh session's in-memory catalog doesn't
    * know a previous session's table, and saveAsTable refuses its
    * orphaned warehouse dir (LOCATION_ALREADY_EXISTS).
    */
  def persistIfStale(spark: SparkSession, dir: String, table: String)(write: => Unit): Unit = {
    if (isCurrent(spark, table, dir)) return
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    fs.delete(new org.apache.hadoop.fs.Path(wh, table), true)
    write
    // single quotes in dir would break the literal; isCurrent compares the
    // RAW dir, so escaping only the write side is safe
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('graft.src' = '${dir.replace("'", "''")}')")
    ()
  }
}
