package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Bits of each coordinate interleaved into the Z (Morton) key. 21+21
    * bits fit a 42-bit key — key domains beyond 2^21 first rank-bucket to
    * this width (see [[zorderKey]]).
    */
  val ZBits = 21

  /** Morton bit-interleave of two non-negative keys' low [[ZBits]] bits:
    * bit b of x lands at position 2b, bit b of y at 2b+1. Built as a
    * shift-mask-or chain (a flat codegen'd expression — no HOF, no UDF).
    */
  def mortonCol(x: Column, y: Column, bits: Int = ZBits): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** zorder_key — the multi-dimensional clustering key behind
    * OPTIMIZE-ZORDER-style layout: rows sorted (or range-partitioned) by
    * the interleaved key place rows close in BOTH dimensions close in the
    * one-dimensional order, so parquet row-group min/max stats stay tight
    * on BOTH columns and scans filtered on either key prune — the layout
    * answer when bucketing can serve only one join key.
    *
    * Registered over lineitem's (l_partkey, l_suppkey): emits the key and
    * the range-partition id (`zbucket`, the high byte of the used bit
    * range) a writer would `repartitionByRange` on. Pure per-row integer
    * bit math — one codegen'd scan, zero shuffle here; the SORT this key
    * exists for happens once at write time, amortized over every read
    * after (the bucketing trade, one dimension up). Fixture keys fit
    * [[ZBits]] raw; at larger domains the production step rank-buckets
    * each column to 2^21 first (the histogram kernels in
    * `operators.Profile` are that step), which changes no plumbing here.
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    li.withColumn("zkey", mortonCol(col("l_partkey"), col("l_suppkey")))
      .withColumn("zbucket", shiftright(col("zkey"), 2 * ZBits - 8))
  }
}
