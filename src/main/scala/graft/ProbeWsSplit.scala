package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe behind the ws_split kernel: times the regex tokenization
  * (`split(trim(text), "\s+")`) against the byte-scan kernel on the same
  * fixture in the same JVM, checksummed equal via total token count, total
  * token length, and an XOR-of-fnv64 content fingerprint (XOR, not sum —
  * ANSI mode makes a 270M-term hash sum overflow), so the timing compares
  * identical outputs — not just identical counts.
  *
  * usage: ProbeWsSplit <sfDir>
  */
object ProbeWsSplit {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ProbeWsSplit <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def fingerprint(tokCol: org.apache.spark.sql.Column): (Long, Long, Long) = {
      val r = graft.sources.Tables.documents(spark, dir)
        .select(tokCol.as("toks"))
        .selectExpr("size(toks) AS n",
          "aggregate(toks, CAST(0 AS BIGINT), (acc, t) -> acc ^ fnv64(t)) AS fp",
          "aggregate(toks, CAST(0 AS BIGINT), (acc, t) -> acc + length(t)) AS len")
        .agg(sum("n"), sum("len"), expr("bit_xor(fp)")).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val regexCol = split(trim(col("text")), "\\s+")
    val kernelCol = graft.functions.GraftFunctions.wsSplit(col("text"))
    fingerprint(kernelCol) // warm scan cache outside both timings
    val (rFp, rSec) = time(fingerprint(regexCol))
    val (kFp, kSec) = time(fingerprint(kernelCol))
    require(rFp == kFp, s"tokenizations disagree: regex=$rFp kernel=$kFp")
    println(f"""{"probe":"ws_split","dir":"$dir","regex_sec":$rSec%.2f,"kernel_sec":$kSec%.2f,"n_tokens":${kFp._1},"len_sum":${kFp._2},"fp":${kFp._3}}""")
    spark.stop()
  }
}
