package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[ProbeData.replicate]]'s contract after the round-15 rewrite from
  * a factor-way union to one crossJoin against a broadcast replica range
  * (the union plan was O(factor) nodes — analysis poison at the sf1000
  * probe's factor 10,000):
  *
  *   - every key column shifts by replica · ReplicaShift,
  *   - replica 0 is verbatim (eval-set rows included),
  *   - replicas ≥ 1 drop the replicaFilter rows (the fixed-size-eval-set
  *     discipline: a benchmark side must not grow with the corpus),
  *   - payload columns repeat verbatim across replicas.
  */
class ProbeDataSpec extends AnyFunSuite {
  import TestSpark._

  test("replicate: key shifts, verbatim replica 0, filtered replicas") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (50L, "b"), (2L, "c")).toDF("doc_id", "text")
    val out = ProbeData.replicate(df, Seq("doc_id"), 3,
      Some(col("doc_id") % 50 =!= 0)).collect()
    // replica 0 keeps all 3 rows; replicas 1 and 2 drop the eval row (50)
    assert(out.length == 7)
    val ids = out.map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 50L,
      1000000001L, 1000000002L, 2000000001L, 2000000002L))
    // payloads repeat verbatim (replica-planted exact-duplicate groups)
    assert(out.count(_.getString(1) == "a") == 3)
    assert(out.count(_.getString(1) == "b") == 1)
  }

  test("replicate without filter: exact factor multiplication") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, 1.5), (8L, 2.5)).toDF("event_id", "value")
    val out = ProbeData.replicate(df, Seq("event_id"), 4, None)
    assert(out.count() == 8)
    assert(out.agg(countDistinct(col("event_id"))).head.getLong(0) == 8)
  }
}
