package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeEmbed {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ProbeEmbed <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"""PROBE $tag n=$n sec=${(System.nanoTime()-t0)/1e9}%.2f""")
    }
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
    time("scan_only") { raw.count() }
    val cast = raw.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    time("cast_hof") { cast.count() }
    time("cast_hof_touch") {
      cast.select(element_at(col("vec"), 1).as("v0"))
        .filter(col("v0").isNotNull).count()
    }
    val withNrm = cast.withColumn("nrm", sqrt(graft.functions.GraftFunctions.arrayDot(col("vec"), col("vec"))))
    time("nrm") { withNrm.filter(col("nrm") >= 0).count() }
    time("collapse_vec_key") {
      withNrm.groupBy(col("vec")).agg(min(col("vec_id")).as("gid"),
        collect_list(col("vec_id")).as("ids"), first(col("nrm")).as("n2"),
        count(lit(1)).as("n")).count()
    }
    time("collapse_digest_key") {
      withNrm
        .withColumn("d1", xxhash64(col("vec")))
        .withColumn("d2", xxhash64(lit(17), col("vec")))
        .groupBy(col("d1"), col("d2")).agg(min(col("vec_id")).as("gid"),
          collect_list(col("vec_id")).as("ids"), first(col("vec")).as("vec"),
          first(col("nrm")).as("n2"), count(lit(1)).as("n")).count()
    }
    time("full_query_rows") {
      graft.operators.Ann.embedNearDup(spark, dir, threshold = 0.4).count()
    }
    spark.stop()
  }
}
