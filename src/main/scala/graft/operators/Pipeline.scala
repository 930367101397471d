package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, as one declarative plan: a document is KEPT iff it passes
  * the [[TextOps.textQuality]] gate AND it is the surviving representative
  * (cluster minimum) of its [[Dedup.clusters]] near-duplicate component.
  *
  * Everything upstream is the already-verified operators; this layer is pure
  * composition (filter + equi-join on doc_id), so at 100 TB it adds one
  * broadcast/shuffle join to the dedup cost and nothing else.
  */
object Pipeline {

  /** pipeline_keep — the curated keep-set with its audit columns. */
  def keep(s: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textQuality(s, dir)
      .select(col("doc_id"), col("keep").as("quality_ok"))
    val survivors = Dedup.clusters(s, dir)
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("is_survivor"))
    quality.join(survivors, "doc_id")
      .withColumn("keep", col("quality_ok") && col("is_survivor"))
      .select("doc_id", "cluster_id", "quality_ok", "is_survivor", "keep")
  }
}
