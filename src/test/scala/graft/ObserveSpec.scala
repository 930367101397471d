package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline accounting via `Dataset.observe` (CollectMetrics): the metrics a
  * 100 TB curation run publishes per drop (rows kept, tokens shipped) must
  * ride the job that produces the data — a separate accounting scan doubles
  * the I/O bill. `observe` attaches aggregates to the plan and collects them
  * DURING the consuming action; this spec pins that the observed values
  * equal a recomputed aggregate, so the idiom is safe to rely on for the
  * corpus_report-style summaries.
  */
class ObserveSpec extends AnyFunSuite {
  import TestSpark._

  test("observed metrics equal a recomputed aggregate — accounting rides the action") {
    val obs = Observation("token_accounting")
    val df = graft.operators.TextOps.textTokens(spark, Sf0001)
      .observe(obs, count(lit(1)).as("rows"),
        sum("n_ws_tokens").as("ws_tokens"),
        sum("n_bpe_tokens").as("bpe_tokens"))
    // the consuming action (a count here; a parquet write in production)
    val consumed = df.count()
    val m = obs.get
    assert(m("rows") == consumed)
    val exact = graft.operators.TextOps.textTokens(spark, Sf0001)
      .agg(sum("n_ws_tokens"), sum("n_bpe_tokens")).collect()(0)
    assert(m("ws_tokens") == exact.getLong(0))
    assert(m("bpe_tokens") == exact.getLong(1))
  }
}
