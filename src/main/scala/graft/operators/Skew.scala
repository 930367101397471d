package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation building blocks. AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin`) covers most cases automatically; these
  * are for the shapes AQE can't fix — a holistic aggregation over one hot
  * key, or a shuffle join whose hot keys are known up front — and they
  * document the technique the 100 TB design relies on.
  */
object Skew {

  /** Two-phase salted count: rows first group on (keys, salt) — spreading a
    * hot key across `salts` reducers — then partials merge. The salt comes
    * from `monotonically_increasing_id` so identical rows (the actual skew
    * case) still spread; correctness is unaffected because counting is
    * commutative over the partials.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 32,
      out: String = "n"): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(out))

  /** Salted equi-join for known-skewed fact keys: the fact side gets a
    * random salt in [0, salts); the dim side is replicated `salts` times;
    * the join key becomes (key, salt), so one hot key spreads over `salts`
    * reducers instead of melting one. Dim replication costs `salts`x dim
    * size — use only when dim is small-ish but too big (or too skewed) to
    * broadcast outright.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** q18_skew_agg — salted count over lineitem's 3-value return flag (a
    * genuinely hot grouping key): same answer as the plain group-by, which
    * is exactly what the oracle checks.
    */
  def q18SkewAgg(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    saltedCount(graft.sources.Tables.lineitem(s, dir), Seq("l_returnflag"))
}
