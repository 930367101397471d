package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for skipgram's pair-emission stage: the declarative
  * higher-order `flatten(transform(filter(...)))` form (HOF lambdas are
  * CodegenFallback — interpreted per element, allocating nested struct
  * arrays per row) against a typed flatMap emitting the same (center,
  * context) pairs from one JVM loop. Both sides run the identical terminal
  * count aggregation, and totals must agree exactly.
  *
  * usage: ProbeSkipgram <sfDir>
  */
object ProbeSkipgram {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ProbeSkipgram <sfDir>")
    val dir = args(0)
    val window = graft.operators.Corpus.SkipgramWindow
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the round-13 formulation, inlined (Corpus.skipgram IS the typed form
    // since round 14 — the probe must keep comparing against the HOF plan)
    def hofForm = {
      val offs = (-window to window).filter(_ != 0).mkString("array(", ", ", ")")
      graft.sources.Tables.documents(spark, dir)
        .select(split(trim(col("text")), "\\s+").as("t"))
        .select(explode(expr(
          s"""flatten(transform(t, (c, i) ->
             |  transform(filter($offs, o -> i + o >= 0 AND i + o < size(t)),
             |            o -> struct(c AS center, t[i + o] AS context))))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.center").as("center"), col("p.context").as("context"))
        .agg(count(lit(1)).as("n"))
    }

    def typedForm = graft.operators.Corpus.skipgram(spark, dir)

    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum("n")).head
      (r.getLong(0), r.getLong(1))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    sums(typedForm) // warm the scan cache outside both timings
    val (hSum, hSec) = time(sums(hofForm))
    val (tSum, tSec) = time(sums(typedForm))
    require(hSum == tSum, s"pair streams disagree: hof=$hSum typed=$tSum")
    println(f"""{"probe":"skipgram","dir":"$dir","hof_sec":$hSec%.2f,"typed_sec":$tSec%.2f,"distinct_pairs":${tSum._1},"total_pairs":${tSum._2}}""")
    spark.stop()
  }
}
