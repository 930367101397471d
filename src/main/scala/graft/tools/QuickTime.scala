package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times each named query N times in one session (cold vs warm split).
  * Usage: runMain graft.tools.QuickTime <sfDir> <reps> <query ...>
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QT $n: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
