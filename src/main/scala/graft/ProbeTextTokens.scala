package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe behind the text_tokens kernel change (committed diagnostic,
  * like ProbeNgram): times the original declarative formulation
  * (`size(regexp_extract_all)` + interpreted `size(filter(split(trim)))`)
  * against the codegen'd byte-scan kernels on the SAME fixture in the SAME
  * JVM, and cross-checks their sums so the timing compares equal answers.
  *
  * usage: ProbeTextTokens <sfDir>
  */
object ProbeTextTokens {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ProbeTextTokens <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def regexForm = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .as("n_bpe_tokens"),
        size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).as("n_ws_tokens"))
    def kernelForm = graft.operators.TextOps.textTokens(spark, dir)

    // one checksum row per formulation: forces full evaluation, and the
    // sums must agree exactly or the timing is comparing different answers
    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum("n_bpe_tokens"), sum("n_ws_tokens")).head
      (r.getLong(0), r.getLong(1))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    sums(kernelForm) // warm the scan/page cache once, outside both timings
    val (rSum, rSec) = time(sums(regexForm))
    val (kSum, kSec) = time(sums(kernelForm))
    require(rSum == kSum, s"formulations disagree: regex=$rSum kernel=$kSum")
    println(f"""{"probe":"text_tokens","dir":"$dir","regex_sec":$rSec%.2f,"kernel_sec":$kSec%.2f,"sum_bpe":${kSum._1},"sum_ws":${kSum._2}}""")
    spark.stop()
  }
}
