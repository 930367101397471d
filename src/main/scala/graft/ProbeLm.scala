package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement probe behind the round-15 lm_score rework (the r14 verdict's
  * task 4 — the last >100 s sf100 entry): times the RETIRED holistic
  * formulation (groupBy + array_sort(collect_list(struct(pos, p))) fold)
  * against the shipped running-window formulation
  * ([[graft.operators.Corpus.lmScore]]), and proves the outputs bit-equal
  * (exact join on every column INCLUDING the IEEE sum_p double — both fold
  * p in pos-ascending order from a 0.0 seed, so the bits must match).
  *
  * The retired shape is reproduced inline so the A/B stays runnable after
  * the operator moved on (the ProbeIvf/ProbeEmbed convention).
  */
object ProbeLm {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: ProbeLm <sfDir> [timings-only]")
    val dir = args(0)
    val timingsOnly = args.length == 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      TransientCache.release(spark)
    }
    // count() alone lets Catalyst PRUNE the fold column out of the plan
    // (the left join on the unique-keyed aggregate preserves row count, so
    // sum_p is dead under count — first probe cut read 5.9 s for what the
    // bench measures at 141): checksum every output column instead.
    def force(df: DataFrame): Long = {
      val r = df.agg(count(lit(1)), sum(col("n_bigrams")),
        sum(col("n_singleton")), sum(col("sum_p"))).head
      r.getLong(0)
    }

    // the retired holistic formulation, verbatim from the pre-r15 operator
    def lmScoreCollect(s: SparkSession, d: String): DataFrame = {
      val toks = sources.Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      val big = TransientCache.cache(
        toks.withColumn("y", lead(col("tok"), 1).over(byDoc))
          .filter(col("y").isNotNull)
          .select(col("doc_id"), col("pos"), col("tok").as("x"), col("y")))
      val cxy = big.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      val cx = cxy.groupBy("x").agg(sum("cxy").as("cx"))
      val scored = big
        .join(cxy, Seq("x", "y"))
        .join(cx, Seq("x"))
        .select(col("doc_id"), col("pos"),
          (col("cxy").cast("double") / col("cx").cast("double")).as("p"),
          when(col("cxy") === 1L, 1L).otherwise(0L).as("singleton"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum("singleton").as("n_singleton"),
          aggregate(
            array_sort(collect_list(struct(col("pos"), col("p")))),
            lit(0.0),
            (acc, x) => acc + x.getField("p")).as("sum_p"))
      sources.Tables.documents(s, d).select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_singleton"), lit(0L)).as("n_singleton"),
          coalesce(col("sum_p"), lit(0.0)).as("sum_p"))
    }

    // component breakdown: is the remaining cost the bigram-stream CACHE
    // (2.66 G-row deserialized MEMORY_AND_DISK at sf100) or the stream
    // computation itself? bigFrame mirrors the operator's `big` exactly.
    def bigFrame(s: SparkSession, d: String): DataFrame = {
      val toks = sources.Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      toks.withColumn("y", lead(col("tok"), 1).over(byDoc))
        .filter(col("y").isNotNull)
        .select(col("doc_id"), col("pos"), col("tok").as("x"), col("y"))
    }
    def forceBig(df: DataFrame): Long =
      // % bounds the addends: a raw xxhash64 sum overflows ANSI long past
      // ~2^32 rows (the Bench calibration probe's lesson)
      df.agg(count(lit(1)), sum(xxhash64(col("x"), col("y")) % 1000000))
        .head.getLong(0)
    time("big_build_nocache") { forceBig(bigFrame(spark, dir)) }
    time("big_build_cached") {
      val b = TransientCache.cache(bigFrame(spark, dir))
      forceBig(b); forceBig(b) // write pass + one re-read, like the operator
    }
    time("big_build_sercache") {
      val b = bigFrame(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      try { forceBig(b); forceBig(b) } finally b.unpersist()
    }

    // intermediate shape (round-15 step 1 of 2): the window-sum fold, but
    // still paying the corpus-sized bigram-stream cache for the count
    // tables — isolates the fold win from the cache-removal win
    def lmScoreWindowCached(s: SparkSession, d: String): DataFrame = {
      val toks = sources.Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      val big = TransientCache.cache(
        toks.withColumn("y", lead(col("tok"), 1).over(byDoc))
          .filter(col("y").isNotNull)
          .select(col("doc_id"), col("pos"), col("tok").as("x"), col("y")))
      val cxy = big.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      val cx = cxy.groupBy("x").agg(sum("cxy").as("cx"))
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = big
        .join(cxy, Seq("x", "y"))
        .join(cx, Seq("x"))
        .select(col("doc_id"), col("pos"),
          (col("cxy").cast("double") / col("cx").cast("double")).as("p"),
          when(col("cxy") === 1L, 1L).otherwise(0L).as("singleton"))
        .withColumn("run_p", sum(col("p")).over(byPos))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("singleton").as("n_singleton"),
          max_by(col("run_p"), col("pos")).as("sum_p"))
      sources.Tables.documents(s, d).select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_singleton"), lit(0L)).as("n_singleton"),
          coalesce(col("sum_p"), lit(0.0)).as("sum_p"))
    }

    time("lm_collect_fold") { force(lmScoreCollect(spark, dir)) }
    time("lm_window_cached") { force(lmScoreWindowCached(spark, dir)) }
    time("lm_shipped") { force(operators.Corpus.lmScore(spark, dir)) }
    // bit-equality fingerprint: identical row multisets, doubles compared
    // at the BIT level (xxhash64 hashes the double's bytes). PROBABILISTIC,
    // not proof — xor aggregation can cancel two compensating row
    // differences — so two independent hash seeds shrink the collision
    // surface to ~2^-128 per differing pair (r15 advice). Computed
    // SEQUENTIALLY — a join of both pipelines co-resident OOM'd the 24 g
    // heap at sf100; two fingerprint passes need nothing but longs.
    if (!timingsOnly) time("equality_fingerprint") {
      def fp(df: DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)), expr(
          "bit_xor(xxhash64(doc_id, n_bigrams, n_singleton, sum_p))"), expr(
          "bit_xor(xxhash64(sum_p, n_singleton, n_bigrams, doc_id, 42L))")).head
        val out = (r.getLong(0), r.getLong(1), r.getLong(2))
        TransientCache.release(spark)
        out
      }
      val fa = fp(lmScoreCollect(spark, dir))
      val fb = fp(operators.Corpus.lmScore(spark, dir))
      require(fa == fb,
        s"lm_score formulations diverge: fingerprint $fa vs $fb")
      fa._1
    }
    spark.stop()
  }
}
