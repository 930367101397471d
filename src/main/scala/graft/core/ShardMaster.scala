package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's sharded-KV configuration surface, re-expressed for a
  * batch engine (reference `src/shardmaster/common.go:6-30` — Join/Leave/
  * Move/Query over numbered `Config`s assigning [[NShards]] shards to
  * replica groups; `src/shardkv/client.go:22-29` — `key2shard` routes a key
  * by its first byte). The reference declares this API but ships only
  * skeletons; the semantics implemented here are the declared contract:
  * config #0 assigns every shard to the invalid group 0, Join/Leave
  * rebalance shards as evenly as possible while moving as few as possible,
  * Move reassigns one shard verbatim, Query(n) returns config n (latest for
  * -1).
  *
  * Spark-first split:
  *   - the CONFIG LOG is control-plane metadata — a config is 10 ints and a
  *     tiny group map, and ops arrive as an ordered admin sequence. Replay
  *     is a driver-side fold ([[replay]]), the same way a Spark driver owns
  *     job-level metadata; the reference needs Raft here only because it
  *     has no equivalent of a single job timeline.
  *   - the DATA PLANE is distributed: [[route]] stamps a keyed table with
  *     (shard, gid) via a codegen'd first-byte expression + a broadcast
  *     join against the 10-row config table, and [[reshard]] computes the
  *     migration set between two configs — the rows a 100 TB store would
  *     actually ship — as one filtered broadcast join, never a shuffle of
  *     the full state.
  */
object ShardMaster {

  /** Number of shards (reference `src/shardmaster/common.go:21`). */
  val NShards = 10

  /** shard of a key = first UTF-8 byte (UNSIGNED, as Go's `key[0]` byte is)
    * mod NShards (reference `src/shardkv/client.go:22-29`); empty key →
    * shard 0. The byte — not the code point, not a UTF-16 unit — so this
    * helper, the distributed [[shardCol]], and the reference agree on
    * non-ASCII keys.
    */
  def key2shard(key: String): Int =
    if (key == null || key.isEmpty) 0
    else (key.getBytes(java.nio.charset.StandardCharsets.UTF_8)(0) & 0xFF) % NShards

  /** A numbered shard assignment. `shards(i)` = gid owning shard i; gid 0 is
    * the invalid group (unassigned).
    */
  case class Config(num: Int, shards: IndexedSeq[Int], groups: Map[Int, Seq[String]]) {
    require(shards.length == NShards, s"config needs $NShards shard slots")
  }

  /** Config #0: no groups, every shard on the invalid group. */
  val Initial: Config = Config(0, Vector.fill(NShards)(0), Map.empty)

  sealed trait ConfigOp
  /** Add replica groups (gid → servers). */
  final case class Join(servers: Map[Int, Seq[String]]) extends ConfigOp
  /** Remove replica groups. */
  final case class Leave(gids: Seq[Int]) extends ConfigOp
  /** Hand one shard to a group, verbatim (no rebalance — Move is the
    * administrator overriding the balancer).
    */
  final case class Move(shard: Int, gid: Int) extends ConfigOp

  /** Even-as-possible, minimal-movement, DETERMINISTIC rebalance:
    * 1. shards owned by departed/invalid groups go (in shard order) to the
    *    least-loaded group, ties to the smallest gid;
    * 2. while the spread exceeds 1, the most-loaded group (ties: smallest
    *    gid) donates its smallest-index shard to the least-loaded.
    * Determinism matters: every replica of the control plane must derive
    * bit-identical configs from the same op log.
    */
  private[core] def rebalance(shards: IndexedSeq[Int], gids: Set[Int]): IndexedSeq[Int] = {
    if (gids.isEmpty) return Vector.fill(NShards)(0)
    val cur = shards.toArray
    val counts = scala.collection.mutable.Map.empty[Int, Int]
    gids.foreach(g => counts(g) = 0)
    for (s <- 0 until NShards if gids.contains(cur(s))) counts(cur(s)) += 1
    def least: Int = counts.toSeq.minBy { case (g, n) => (n, g) }._1
    def most: Int = counts.toSeq.minBy { case (g, n) => (-n, g) }._1
    for (s <- 0 until NShards if !gids.contains(cur(s))) {
      val t = least
      cur(s) = t; counts(t) += 1
    }
    while (counts(most) - counts(least) > 1) {
      val (from, to) = (most, least)
      val s = (0 until NShards).find(cur(_) == from).get
      cur(s) = to; counts(from) -= 1; counts(to) += 1
    }
    cur.toVector
  }

  /** One op applied to a config → the next numbered config. */
  def step(c: Config, op: ConfigOp): Config = op match {
    case Join(servers) =>
      val groups = c.groups ++ servers
      Config(c.num + 1, rebalance(c.shards, groups.keySet), groups)
    case Leave(gids) =>
      val groups = c.groups -- gids
      Config(c.num + 1, rebalance(c.shards, groups.keySet), groups)
    case Move(shard, gid) =>
      require(shard >= 0 && shard < NShards, s"shard out of range: $shard")
      require(c.groups.contains(gid), s"Move to unknown gid $gid")
      Config(c.num + 1, c.shards.updated(shard, gid), c.groups)
  }

  /** Replay an admin op log into the full config history (index = Num). */
  def replay(ops: Seq[ConfigOp]): Vector[Config] =
    ops.scanLeft(Initial)(step).toVector

  /** Query(num): config `num`, or the latest for -1 / out-of-range —
    * the reference clerk's contract.
    */
  def query(history: Seq[Config], num: Int): Config =
    if (num < 0 || num >= history.size) history.last else history(num)

  // ---------------------------------------------------------------- data plane

  /** `key2shard` as a codegen'd column: first UTF-8 byte mod NShards.
    * NOT `ascii` — Spark's `ascii` returns the first CODE POINT (233 for
    * 'é'), while the reference routes by the raw first byte of the UTF-8
    * encoding (`key[0]` on a Go string, 0xC3 = 195 for 'é'). Extract the
    * byte itself: encode to UTF-8 binary, take byte 1, read it as an
    * unsigned int via hex. All builtins, whole-stage codegen'd.
    */
  def shardCol(key: Column): Column = {
    val firstByte = conv(hex(substring(encode(key, "UTF-8"), 1, 1)), 16, 10).cast("int")
    pmod(when(length(key) > 0, firstByte).otherwise(lit(0)), lit(NShards))
  }

  /** The 10-row (shard, gid) routing table of a config. */
  def configTable(s: SparkSession, c: Config): DataFrame = {
    import s.implicits._
    c.shards.zipWithIndex.map { case (g, i) => (i, g) }.toDF("shard", "gid")
  }

  /** Stamp a keyed table with (shard, gid) under `c`: one codegen'd
    * expression + one broadcast join against 10 rows. The state table never
    * shuffles — routing is a map-side operation at any scale.
    */
  def route(state: DataFrame, c: Config): DataFrame = {
    val s = state.sparkSession
    state
      .withColumn("shard", shardCol(col("key")))
      .join(broadcast(configTable(s, c)), "shard")
  }

  /** The migration set from config `from` to config `to`: rows whose owning
    * gid changes, tagged (from_gid, to_gid). Only moved rows survive the
    * broadcast-join filter, so at 100 TB this emits exactly the bytes that
    * must travel — the balancer's minimal-movement property bounds it.
    */
  def reshard(state: DataFrame, from: Config, to: Config): DataFrame = {
    val s = state.sparkSession
    import s.implicits._
    val moves = from.shards.zipWithIndex.collect {
      case (g0, i) if to.shards(i) != g0 => (i, g0, to.shards(i))
    }.toSeq.toDF("shard", "from_gid", "to_gid")
    state
      .withColumn("shard", shardCol(col("key")))
      .join(broadcast(moves), "shard")
  }

  /** kv_shards — the registered, oracle-checkable demo: replay a fixed admin
    * log (two Joins, an explicit Move, a Leave), then route the [[KvStore]]
    * orders-replay state table by the final config. The config history is
    * deterministic (hand-derivable; asserted literally in ShardMasterSpec),
    * so the oracle states the final shard→gid map as VALUES and recomputes
    * the shard independently as `ascii(key) % 10` — a formulation that
    * agrees with [[shardCol]]'s first-UTF-8-BYTE routing only because the
    * replayed keys are ASCII custkey digits (code point == first byte).
    * For non-ASCII keys the two diverge by design ('é': ascii()=233 vs
    * first byte 0xC3=195); byte semantics live in [[shardCol]] and are
    * pinned by ShardMasterSpec.
    */
  val DemoOps: Seq[ConfigOp] = Seq(
    Join(Map(1 -> Seq("g1a", "g1b"))),
    Join(Map(2 -> Seq("g2a"), 3 -> Seq("g3a"))),
    Move(7, 2),
    Leave(Seq(1)))

  def ordersShards(s: SparkSession, dir: String): DataFrame = {
    val cfg = replay(DemoOps).last
    route(KvStore.stateOf(KvStore.ordersReplayOps(s, dir)), cfg)
      .select(col("key"), col("shard"), col("gid"))
  }
}
