package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ShardMaster
import graft.core.ShardMaster._

/** Sharded-KV config semantics per the reference's declared contract
  * (`src/shardmaster/common.go:6-30`): numbered configs, Join/Leave
  * rebalance evenly with minimal movement, Move is verbatim, Query(-1) is
  * latest; `key2shard` routes by first byte (`src/shardkv/client.go:22-29`).
  */
class ShardMasterSpec extends AnyFunSuite {
  import TestSpark._

  test("DemoOps config history equals the hand-derived sequence") {
    val h = replay(DemoOps)
    assert(h(0) == Initial)
    // Join(1): the only group takes every shard
    assert(h(1).shards == Vector.fill(10)(1) && h(1).num == 1)
    // Join(2,3): gid 1 donates its smallest-index shards alternately to the
    // least-loaded (ties to smaller gid) until the spread is <= 1
    assert(h(2).shards == Vector(2, 3, 2, 3, 2, 3, 1, 1, 1, 1))
    // Move(7,2): verbatim, no rebalance
    assert(h(3).shards == Vector(2, 3, 2, 3, 2, 3, 1, 2, 1, 1))
    // Leave(1): orphans 6,8,9 go to the least-loaded in shard order
    assert(h(4).shards == Vector(2, 3, 2, 3, 2, 3, 3, 2, 2, 3))
    assert(h(4).groups.keySet == Set(2, 3))
  }

  test("rebalance: spread <= 1 and minimal movement across random op logs") {
    // deterministic pseudo-random walk over Join/Leave; after every step the
    // spread invariant holds and ONLY the theoretical minimum number of
    // shards moved (orphans + donations needed to level)
    var state = 12345L
    def next(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % n) + n).toInt % n
    }
    var c = Initial
    var nextGid = 1
    for (_ <- 0 until 90) {
      val op =
        if (c.groups.isEmpty || next(4) < 2) {
          val g = nextGid; nextGid += 1
          Join(Map(g -> Seq(s"srv$g")))
        } else if (next(4) == 3) {
          // explicit Move: verbatim, no rebalance — invariants differ
          Move(next(10), c.groups.keySet.toSeq.sorted.apply(next(c.groups.size)))
        } else Leave(Seq(c.groups.keySet.toSeq.sorted.apply(next(c.groups.size))))
      val prev = c
      c = step(prev, op)
      op match {
        case Move(shard, gid) =>
          // exactly the moved slot changes; balance is deliberately NOT
          // restored (the administrator overrode the balancer) until the
          // next Join/Leave rebalances
          assert(c.shards(shard) == gid)
          assert((0 until 10).forall(i => i == shard || c.shards(i) == prev.shards(i)))
          assert(c.num == prev.num + 1 && c.groups == prev.groups)
        case _ =>
      }
      if (op.isInstanceOf[Move]) ()
      else if (c.groups.nonEmpty) {
        val counts = c.shards.groupBy(identity).map { case (g, v) => g -> v.size }
        assert(c.shards.forall(c.groups.keySet.contains),
          s"shard on a departed group after $op")
        assert(counts.values.max - counts.values.min <= 1, s"unbalanced after $op")
        // minimal movement: shards moved == orphans + donations required to
        // reach an even split from the surviving groups' previous counts
        val moved = c.shards.zip(prev.shards).count { case (a, b) => a != b }
        val survivors = c.groups.keySet
        val prevCounts = survivors.toSeq.map(g => prev.shards.count(_ == g))
        val orphans = 10 - prevCounts.sum
        val target = 10 / survivors.size
        val extra = 10 % survivors.size
        // after assigning orphans greedily, donors shed down to target+1/target;
        // the minimum total movement is orphans + sum of overflow above the
        // final per-group quota (target+1 for `extra` groups, target else)
        val sortedDesc = prevCounts.sorted(Ordering[Int].reverse)
        val quotas = sortedDesc.indices.map(i => if (i < extra) target + 1 else target)
        val donations = sortedDesc.zip(quotas).map { case (n, q) => math.max(0, n - q) }.sum
        assert(moved <= orphans + donations + extra,
          s"moved $moved > minimal ${orphans + donations} (+$extra tie slack) after $op")
      } else assert(c.shards.forall(_ == 0))
    }
  }

  test("query: historical by number, latest for -1 and out-of-range") {
    val h = replay(DemoOps)
    assert(query(h, -1) == h.last)
    assert(query(h, 2) == h(2))
    assert(query(h, 99) == h.last)
    assert(query(h, 0) == Initial)
  }

  test("route stamps (shard, gid) consistently with key2shard") {
    val s = spark
    import s.implicits._
    val cfg = replay(DemoOps).last
    val state = Seq("15", "42", "901", "7", "88").map(k => (k, s"v$k")).toDF("key", "value")
    val routed = route(state, cfg).collect()
      .map(r => r.getAs[String]("key") -> (r.getAs[Int]("shard"), r.getAs[Int]("gid"))).toMap
    assert(routed.size == 5)
    routed.foreach { case (k, (shard, gid)) =>
      assert(shard == key2shard(k), s"key $k")
      assert(gid == cfg.shards(shard), s"key $k")
    }
  }

  test("non-ASCII keys: helper, column routing, and reference byte agree") {
    val s = spark
    import s.implicits._
    // keys whose first UTF-8 byte differs from both the UTF-16 unit and the
    // code point: é (0xC3), 日 (0xE6), ß (0xC3), Ω (0xCE), an astral emoji
    // (0xF0 — charAt(0) would see a surrogate half), plus ASCII controls
    val keys = Seq("état", "日本語", "ßeta", "Ωmega", "😀grin", "plain", "7up")
    keys.foreach { k =>
      // reference semantics: Go `key[0]` is the first UTF-8 byte, unsigned
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)(0) & 0xFF
      assert(key2shard(k) == b % NShards, s"helper vs reference byte for '$k'")
    }
    val cfg = replay(DemoOps).last
    val routed = route(keys.map((_, "v")).toDF("key", "value"), cfg).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Int]("shard")).toMap
    assert(routed.size == keys.size)
    keys.foreach(k => assert(routed(k) == key2shard(k), s"column vs helper for '$k'"))
  }

  test("reshard emits exactly the moved shards' rows, tagged from/to") {
    val s = spark
    import s.implicits._
    val h = replay(DemoOps)
    val (c3, c4) = (h(3), h(4))
    // keys with first bytes covering every shard 0..9: '0'..'9' hit shards
    // 8,9,0,1..7 (ascii('0')=48)
    val state = (0 to 9).map(d => (d.toString, "v")).toDF("key", "value")
    val moves = reshard(state, c3, c4).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Int]("from_gid"), r.getAs[Int]("to_gid")))
      .toSet
    // c3 -> c4 moved shards: 6 (1->3), 8 (1->2), 9 (1->3); keys '8','0' are
    // shards 8,0... derive expected from key2shard directly
    val expected = (0 to 9).flatMap { d =>
      val sh = key2shard(d.toString)
      if (c3.shards(sh) != c4.shards(sh)) Some((d.toString, c3.shards(sh), c4.shards(sh)))
      else None
    }.toSet
    assert(moves == expected)
    assert(expected.nonEmpty)
    // minimality: only the Leave's orphaned shards moved
    val movedShards = (0 until 10).filter(i => c3.shards(i) != c4.shards(i))
    assert(movedShards == Seq(6, 8, 9))
  }

  test("ordersShards (registered) routes every state key; gids are live") {
    val out = ShardMaster.ordersShards(spark, Sf0001).collect()
    assert(out.nonEmpty)
    val cfg = replay(DemoOps).last
    out.foreach { r =>
      val (k, sh, g) = (r.getAs[String]("key"), r.getAs[Int]("shard"), r.getAs[Int]("gid"))
      assert(sh == key2shard(k) && g == cfg.shards(sh))
      assert(cfg.groups.contains(g))
    }
  }
}
