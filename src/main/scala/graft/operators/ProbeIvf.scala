package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._



/** Stage-level timing diagnostic for ann_ivf's sf10 cost (round 14 — the
  * full query measured 25.8 s while ann_brute's EXACT scan is 1.3 s; this
  * isolates train-sample collect, driver k-means, the cell-assignment
  * scan, and the probed scoring so the fix targets the measured stage,
  * not a guess). Committed like ProbeNgram: a diagnostic with a SCALE.md
  * record, not dead weight.
  *
  * Usage: runMain graft.tools.ProbeIvf <sfDir>
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val c = graft.TransientCache.cache(Ann.corpus(spark, sfDir))
    t("corpus cache+count")(c.count())
    val train = t("train TakeOrdered collect") {
      c.orderBy(xxhash64(col("vec_id"))).limit(Ann.IvfTrainCap)
        .select("vec").collect().map(_.getSeq[Double](0).toArray)
    }
    val cents = t("fitCentroids 16x10")(
      Ann.fitCentroids(train, 16, iters = 10))
    t("assignment scan (cellCol sum)") {
      c.withColumn("cell", Ann.cellCol(col("vec"), cents))
        .agg(sum("cell")).collect()
    }
    // scoring-join stages without the top-k window: pins sort-vs-score cost
    val assigned = c.withColumn("cell", Ann.cellCol(col("vec"), cents))
    val centroids = spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) })
      .toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cdist").asc, col("cell").asc)
    val probed = q.join(broadcast(centroids))
      .withColumn("cdist", -graft.functions.GraftFunctions.arrayDot(col("qvec"), col("centroid")) /
        (col("qnrm") * sqrt(graft.functions.GraftFunctions.arrayDot(col("centroid"), col("centroid")))))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= 4)
      .select("query_id", "qvec", "qnrm", "cell")
    println(s"PROBE corpus partitions: ${c.rdd.getNumPartitions}")
    val n = t("join+count (no score)") {
      assigned.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id")).count()
    }
    println(s"PROBE joined rows: $n")
    t("join+score sum (no window)") {
      assigned.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score",
          graft.functions.GraftFunctions.arrayDot(col("qvec"), col("vec")) / (col("qnrm") * col("nrm")))
        .agg(sum("score")).collect()
    }
    t("join+score+window replica") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("vec_id").asc)
      assigned.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score",
          graft.functions.GraftFunctions.arrayDot(col("qvec"), col("vec")) /
            (col("qnrm") * col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
        .write.mode("overwrite").format("noop").save()
    }
    def windowed() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("vec_id").asc)
      assigned.join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score",
          graft.functions.GraftFunctions.arrayDot(col("qvec"), col("vec")) /
            (col("qnrm") * col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.set("spark.sql.window.group.limit.threshold", "-1")
    t("window, WindowGroupLimit DISABLED")(windowed())
    spark.conf.set("spark.sql.window.group.limit.threshold", "1000")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("window, wholeStageCodegen OFF")(windowed())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    t("full ivfTopK")(Ann.ivfTopK(spark, sfDir).write
      .mode("overwrite").format("noop").save())
    spark.stop()
  }
}
