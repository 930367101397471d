package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints `explain("formatted")` for selected registered queries — the
  * scale-audit loop: check PushedFilters reach the scan, ReadSchema is
  * pruned, small dims broadcast, WholeStageCodegen spans are wide.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q1_agg", "q2_filter", "q4_join_multi", "wc", "dedup_ngram", "ann_lsh")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
