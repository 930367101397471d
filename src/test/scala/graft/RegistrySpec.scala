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
    // round 8 shrank this set to ONE: the hash/float/iterative family
    // (text_fingerprint_poly, dedup_simhash(_pairs), mm_features,
    // mm_thumbs, dedup_minhash, q36_stream_neardup, ann_lsh, dedup_embed,
    // ann_ivf) all gained oracles that replay the full pipeline —
    // wraparound hashes in HUGEINT mod-2^64, splitmix64 hyperplanes/
    // signatures, Spark's xxhash64 sample order, the LCG stub decode,
    // single/double-precision float math in the exact IEEE operation order
    // of the Scala side, and the 10-round Lloyd loop as a recursive CTE —
    // see SparkEntry.minhashPairsSql / annLshSql / embedNearDupSql /
    // mmThumbsSql / annIvfSql. q19_approx alone remains: Spark's HLL++
    // estimate is defined by its own sketch internals, not by the data;
    // ApproxSpec bounds its error against the exact answer.
    val documented = Set("q19_approx")
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
