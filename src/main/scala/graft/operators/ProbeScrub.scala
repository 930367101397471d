package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing diagnostic for substring_scrub at the sf100 decade
  * probe (112–123 s after the occ-cache removal): isolates the positional
  * gram emission + md5, the shared-gram aggregate, the flagged-start join +
  * collect, and the rebuild, so the dominant stage gets a named mechanism.
  *
  * Usage: runMain graft.operators.ProbeScrub <sfDir>
  */
object ProbeScrub {
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
    val w = Dedup.SubstringWindow
    def occ = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, txt) =>
        Dedup.windowStarts(txt, w).map { case (st, g) => (id, st, g) } }
      .toDF("doc_id", "start", "gram")
      .select(col("doc_id"), col("start"), unhex(md5(col("gram"))).as("g"))
    val nOcc = t("positional emission + md5 (count)")(occ.count())
    println(s"PROBE occ rows: $nOcc")
    val shared = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, txt) => Dedup.windowGrams(txt, w).map(g => (id, g)) }
      .toDF("doc_id", "gram")
      .select(col("doc_id"), unhex(md5(col("gram"))).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") >= 2)
      .select("g", "keep_id")
    val nShared = t("distinct emission + shared agg (count)")(shared.count())
    println(s"PROBE shared grams: $nShared")
    val flagged = occ.join(shared, "g")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), col("start"))
      .as[(Long, Int)]
      .mapPartitions(Dedup.mergeCoverage(_, w))
      .toDF("doc_id", "iv_s", "iv_e")
    val nIv = t("flagged join + interval merge (count)")(flagged.count())
    println(s"PROBE interval rows: $nIv")
    val agg = flagged
      .groupBy("doc_id")
      .agg(collect_set(struct(col("iv_s").as("_1"), col("iv_e").as("_2"))).as("ivs"))
    t("interval collect_set (count)")(agg.count())
    println("PROBE flagged executed plan:")
    println(flagged.queryExecution.executedPlan.toString.linesIterator
      .take(40).mkString("\n"))
    t("full substring_scrub (noop write)") {
      Dedup.substringScrub(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
