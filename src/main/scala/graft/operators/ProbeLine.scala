package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing diagnostic for line_dedup at the sf100 decade probe
  * (54 s vs 3.3 s at sf10 — 16× for 10× data): isolates the line scan +
  * md5, the first-occurrence election, the election join-back, and the
  * per-document reassembly so the superlinear factor gets a named stage.
  *
  * Usage: runMain graft.operators.ProbeLine <sfDir>
  */
object ProbeLine {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val lines = graft.TransientCache.cache(
      graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) => Curation.docLines(id, text) }
        .toDF("doc_id", "line_no", "line")
        .select(col("doc_id"), col("line_no"), md5(col("line")).as("lmd5")))
    val n = t("line scan + md5 (cache+count)")(lines.count())
    println(s"PROBE lines: $n")
    val firsts = lines.groupBy("lmd5")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("first"))
    val nf = t("first-occurrence election (count)")(firsts.count())
    println(s"PROBE distinct lines: $nf")
    t("election join-back (count)") {
      lines.join(firsts, "lmd5").count()
    }
    t("full line_dedup")(Curation.lineDedup(spark, sfDir)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
