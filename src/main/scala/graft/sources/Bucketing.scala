package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle data ONCE at write time so repeated
  * equi-joins/aggregations on the bucket key run with NO exchange at read
  * time — the co-location strategy for fact-fact joins too big to
  * broadcast. At 100 TB this is the difference between re-shuffling the
  * fact table per query and never shuffling it again.
  *
  * Spark bucketing requires the table catalog (bucket metadata lives
  * there), so these write managed tables; `spark.sql.warehouse.dir`
  * controls placement.
  */
object Bucketing {

  /** Write `df` as a managed table bucketed (and sorted) by `key` into
    * `buckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * with `spark.sql.sources.bucketing.enabled` (default true) the planner
    * sees compatible output partitionings and elides both exchanges.
    */
  def coLocatedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), key)
}
