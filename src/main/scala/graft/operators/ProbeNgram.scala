package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed diagnostic main behind the round-13 dedup_ngram sf10 finding:
  * stage-by-stage counts/sizes of the prefix-Jaccard pipeline, so a fan-out
  * blowup is measured, not guessed (SCALE.md round 13 records the numbers —
  * 3,935 distinct token sets, deepest group 24,800 members, 9.67 G output
  * pairs). `runMain graft.operators.ProbeNgram <sfDir> [threshold] [count]`;
  * the optional `count` arg executes the full fan-out end-to-end (minutes at
  * sf10 — it IS the output) and cross-checks the streamed count against the
  * arithmetic cross/within row predictions printed above it.
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val docs = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
    val (gset, verified) = Dedup.jaccardGroups(s, docs, threshold)
    val g = graft.TransientCache.cache(gset)
    t("gset count")(g.count())
    t("gset max |ids|")(g.agg(max(size(col("ids")))).head.getInt(0))
    val v = graft.TransientCache.cache(verified.select(col("g1"), col("g2"),
      size(col("ids1")).as("n1"), size(col("ids2")).as("n2")))
    t("verified count")(v.count())
    t("cross output rows")(
      v.agg(sum(col("n1").cast("long") * col("n2"))).head.get(0))
    t("within output rows")(
      g.filter(size(col("ids")) > 1)
        .agg(sum(expr("CAST(size(ids) AS BIGINT)*(size(ids)-1) DIV 2"))).head.get(0))
    if (args.lift(2).contains("count"))
      t("FULL output count (streams the fan-out)")(
        Dedup.ngramJaccard(s, dir, threshold).count())
    s.stop()
  }
}
