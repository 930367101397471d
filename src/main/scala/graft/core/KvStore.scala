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

  /** Replay an op log: returns tagged state+get rows in one pass.
    *
    * Secondary-sort formulation: repartition on `key`, sort each partition
    * by (key, seq), then stream a single fold over the partition iterator.
    * A key's ops arrive contiguous and in sequence order, so replay holds
    * O(1) rows in memory regardless of how many ops one key has — the
    * hot-key-safe shape at 100 TB, where `groupByKey` + sort-in-memory
    * would buffer a hot key's entire history in one task (a key with 10⁸
    * appends is an OOM, not a slowdown). The shuffle cost is identical
    * (same hash exchange); the sort rides the shuffle spill machinery.
    */
  def replay(ops: Dataset[KvOp]): Dataset[KvResult] = {
    val s = ops.sparkSession
    import s.implicits._
    ops
      .repartition(ops("key"))
      .sortWithinPartitions("key", "seq")
      .mapPartitions { rows =>
        new scala.collection.AbstractIterator[KvResult] {
          // ≤ 2 buffered results at any time (a key's closing state row plus
          // the next key's first get) — never a key's history
          private val buf = scala.collection.mutable.Queue.empty[KvResult]
          private var curKey: String = null
          private var state = ""
          private var exists = false
          private def fill(): Unit = {
            while (buf.isEmpty && rows.hasNext) {
              val o = rows.next()
              if (o.key != curKey) {
                if (curKey != null && exists)
                  buf += KvResult("state", Long.MaxValue, curKey, state)
                curKey = o.key; state = ""; exists = false
              }
              o.op match {
                case "put" => state = o.value; exists = true
                case "append" => state = state + o.value; exists = true
                case "get" =>
                  buf += KvResult("get", o.seq, o.key, if (exists) state else "")
                case other =>
                  throw new IllegalArgumentException(s"unknown op: $other")
              }
            }
            if (buf.isEmpty && curKey != null && exists) {
              buf += KvResult("state", Long.MaxValue, curKey, state)
              curKey = null; exists = false
            }
          }
          def hasNext: Boolean = { fill(); buf.nonEmpty }
          def next(): KvResult = { fill(); buf.dequeue() }
        }
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
  def ordersReplayOps(s: SparkSession, dir: String): Dataset[KvOp] = {
    import s.implicits._
    graft.sources.Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)]
      .map { case (okey, ckey) => KvOp(okey, "append", ckey.toString, s"$okey;") }
  }

  def ordersReplay(s: SparkSession, dir: String): DataFrame =
    stateOf(ordersReplayOps(s, dir))

  /** Convenience: build an op log Dataset from tuples. */
  def log(s: SparkSession, entries: Seq[(Long, String, String, String)]): Dataset[KvOp] = {
    import s.implicits._
    s.createDataset(entries.map { case (q, o, k, v) => KvOp(q, o, k, v) })
  }
}
