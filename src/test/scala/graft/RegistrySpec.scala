package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must at least EXECUTE on the smallest fixture —
  * this catches runtime breakage in queries the DuckDB oracle can't verify
  * (rows-only set) before the driver's gate does, and pins the
  * queries/oracleSql contract invariants.
  */
class RegistrySpec extends AnyFunSuite {
  import TestSpark._

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("rows-only (no-oracle) set is exactly the documented one") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 8 moved the wraparound-int64 hash queries (text_fingerprint_poly,
    // dedup_simhash, dedup_simhash_pairs) OUT of this set: their oracles now
    // recompute the hashes in DuckDB HUGEINT mod-2^64 arithmetic
    // mm_features gained an oracle too (the stub LCG replayed in a recursive
    // CTE); mm_thumbs stays rows-only — its average-pooling accumulates in
    // FLOAT precision with data-dependent pool shapes, and MultimodalSpec
    // pins that path instead
    // dedup_minhash, ann_lsh and dedup_embed left this set in round 8:
    // their oracles now replay the whole pipeline (splitmix64 hyperplanes/
    // signatures, banding or buckets, ordered-IEEE float scoring) in DuckDB
    // HUGEINT arithmetic — see SparkEntry.minhashPairsSql / annLshSql /
    // embedNearDupSql
    // q36_stream_neardup also gained an oracle: on a bounded AvailableNow
    // pass the streaming near-dup reproduces the batch minhash pairs
    // bit-for-bit, so it shares minhashPairsSql
    val documented = Set("ann_ivf", "mm_thumbs", "q19_approx")
    assert(rowsOnly == documented,
      s"oracle coverage drifted: extra=${rowsOnly -- documented} missing=${documented -- rowsOnly}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, Sf0001)
      assert(df.columns.nonEmpty)
      // count() forces full execution; no array-typed output columns — the
      // driver's canonicalization cannot hash them (ADVICE round 2)
      df.count()
      df.schema.fields.foreach { f =>
        assert(!f.dataType.typeName.startsWith("array"),
          s"$name emits array column ${f.name} — driver canonicalization cannot hash it")
      }
    }
  }
}
