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

  test("every registered query carries an oracle (rows-only set is empty)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Round 8 shrank this set to one (q19_approx — raw sketch estimates are
    // engine-defined); round 9 closed it: q19_approx now registers a
    // deterministic bound report (exact counts + 0/1 sketch-contract
    // flags), so every query in the registry is DuckDB-oracled. The
    // hash/float/iterative family is replayed bit-exactly — see
    // SparkEntry.minhashPairsSql / annLshSql / embedNearDupSql /
    // mmThumbsSql / annIvfSql.
    assert(rowsOnly.isEmpty, s"oracle coverage drifted: $rowsOnly")
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
