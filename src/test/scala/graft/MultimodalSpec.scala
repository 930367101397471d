package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal plumbing: schema, determinism, batch decode shape, resize
  * math, frame sampling. The decode itself is a documented stub; what's
  * under test is everything around it.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("assets: binary payload + typed metadata struct, one row per doc") {
    val df = Multimodal.assets(spark, Sf0001)
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(df.count() == graft.sources.Tables.documents(spark, Sf0001).count())
    val types = df.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("metadata-only queries prune the payload column from the scan") {
    val metaOnly = Multimodal.assets(spark, Sf0001)
      .select("asset_id", "media_type")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(!scan.contains("text"),
      s"payload source column still read for a metadata-only query:\n$scan")
  }

  test("decode is deterministic and pixel count == width*height") {
    val a = Multimodal.features(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Int]("n_pixels"), r.getAs[Double]("mean_px"))).toMap
    val b = Multimodal.features(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Int]("n_pixels"), r.getAs[Double]("mean_px"))).toMap
    assert(a == b) // same stub decode across runs
    Multimodal.decode(spark, Sf0001).collect().foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("pixels")).size ==
        r.getAs[Int]("width") * r.getAs[Int]("height"))
    }
  }

  test("resizePixels: average pool preserves global mean on exact divisors") {
    val px = Array.tabulate(16 * 8)(i => i.toFloat)
    val out = Multimodal.resizePixels(px, 16, 8, 4, 4)
    assert(out.length == 16)
    val meanIn = px.sum / px.length
    val meanOut = out.sum / out.length
    assert(math.abs(meanIn - meanOut) < 1e-3)
  }

  test("thumbnails are fixed-size") {
    Multimodal.thumbnails(spark, Sf0001).collect().foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("thumb")).size == 64)
    }
  }

  test("frameSample: stride-5 indices within range, video only") {
    val rows = Multimodal.frameSample(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_frames")
      val idx = r.getAs[Int]("frame_idx")
      assert(idx >= 0 && idx < n && idx % 5 == 0)
      assert(r.getAs[Long]("asset_id") % 3 == 2) // video assets
    }
  }
}
