package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's declared-but-unimplemented KV surface (SURVEY.md §2.3:
  * `Get(key)→value`, `Put(key,value)`, `Append(key,value)` with the
  * porcupine model's semantics — get returns current state, put replaces,
  * append concatenates; reference `src/kvraft/common.go:11-33`,
  * `src/models/kv.go:40-56`). Stretch surface per SURVEY §7.2 step 7.
  *
  * Spark-first shape: an operation log is a Dataset ordered by a sequence
  * number; applying it is ONE `groupByKey(key).flatMapGroups` — each key's
  * ops replay independently (the sharding the reference's `key2shard`
  * intended, supplied by the shuffle), so state never concentrates. Gets
  * are answered at their sequence point during the same replay, which is
  * exactly the linearizability contract of the single-log model.
  */
object KvStore {

  /** One log entry. `op` ∈ {"put", "append", "get"}. */
  case class KvOp(seq: Long, op: String, key: String, value: String)

  /** Replay result row: `kind` = "state" (final value per key) or "get"
    * (the value observed by a get at its sequence point; "" for a missing
    * key, matching the reference client's `""` default).
    */
  case class KvResult(kind: String, seq: Long, key: String, value: String)

  /** Replay an op log: returns tagged state+get rows in one pass. */
  def replay(ops: Dataset[KvOp]): Dataset[KvResult] = {
    val s = ops.sparkSession
    import s.implicits._
    ops.groupByKey(_.key).flatMapGroups { (key, it) =>
      val sorted = it.toSeq.sortBy(_.seq)
      var state = ""
      var exists = false
      val out = Seq.newBuilder[KvResult]
      sorted.foreach { o =>
        o.op match {
          case "put" => state = o.value; exists = true
          case "append" => state = state + o.value; exists = true
          case "get" => out += KvResult("get", o.seq, key, if (exists) state else "")
          case other => throw new IllegalArgumentException(s"unknown op: $other")
        }
      }
      if (exists) out += KvResult("state", Long.MaxValue, key, state)
      out.result().iterator
    }
  }

  /** Final state table after replaying the log. */
  def stateOf(ops: Dataset[KvOp]): DataFrame = {
    val s = ops.sparkSession
    import s.implicits._
    replay(ops).filter(_.kind == "state").select("key", "value")
  }

  /** Get results (seq, key, value) in log order. */
  def getsOf(ops: Dataset[KvOp]): DataFrame = {
    val s = ops.sparkSession
    import s.implicits._
    replay(ops).filter(_.kind == "get").select("seq", "key", "value")
  }

  /** kv_replay — the KV surface as a registered, oracle-checkable query:
    * derive a deterministic op log from the orders fixture (one `append`
    * of "<orderkey>;" to the customer's key, sequenced by orderkey) and
    * replay it; the final state per key is the orderkey concatenation in
    * sequence order, which ANSI SQL reproduces with an ordered string_agg.
    */
  def ordersReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ops = graft.sources.Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)]
      .map { case (okey, ckey) => KvOp(okey, "append", ckey.toString, s"$okey;") }
    stateOf(ops)
  }

  /** Convenience: build an op log Dataset from tuples. */
  def log(s: SparkSession, entries: Seq[(Long, String, String, String)]): Dataset[KvOp] = {
    import s.implicits._
    s.createDataset(entries.map { case (q, o, k, v) => KvOp(q, o, k, v) })
  }
}
