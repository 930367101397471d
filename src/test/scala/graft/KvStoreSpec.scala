package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.KvStore

/** KV surface semantics per the reference's porcupine model
  * (`src/models/kv.go:40-56`): put replaces, append concatenates, get
  * observes the state at its sequence point; missing keys read as "".
  */
class KvStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("put/append/get replay matches the model") {
    val ops = KvStore.log(spark, Seq(
      (1L, "get", "x", ""),      // before any write -> ""
      (2L, "put", "x", "a"),
      (3L, "append", "x", "b"),
      (4L, "get", "x", ""),      // -> "ab"
      (5L, "put", "x", "z"),
      (6L, "append", "y", "q"),  // append to missing key creates it
      (7L, "get", "y", "")))     // -> "q"
    val gets = KvStore.getsOf(ops).collect()
      .map(r => r.getAs[Long]("seq") -> r.getAs[String]("value")).toMap
    assert(gets == Map(1L -> "", 4L -> "ab", 7L -> "q"))
    val state = KvStore.stateOf(ops).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(state == Map("x" -> "z", "y" -> "q"))
  }

  test("keys replay independently (sharded by the shuffle)") {
    val ops = KvStore.log(spark,
      (1L to 100L).map(i => (i, "append", s"k${i % 10}", i.toString)))
    val state = KvStore.stateOf(ops).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(state.keySet == (0 to 9).map(i => s"k$i").toSet)
    // per-key append order follows seq order
    val k0 = (1L to 100L).filter(_ % 10 == 0).map(_.toString).mkString
    assert(state("k0") == k0)
  }

  test("replay applies seq order even when the input arrives shuffled") {
    // ops supplied in reversed + interleaved order: the secondary sort, not
    // input order, must determine replay order
    val entries = Seq(
      (5L, "append", "x", "c"),
      (2L, "put", "x", "a"),
      (9L, "get", "x", ""),   // -> "abc" (after 2,3,5)
      (3L, "append", "x", "b"),
      (1L, "get", "x", ""))   // -> "" (before any write)
    val ops = KvStore.log(spark, scala.util.Random.shuffle(entries))
    val gets = KvStore.getsOf(ops).collect()
      .map(r => r.getAs[Long]("seq") -> r.getAs[String]("value")).toMap
    assert(gets == Map(1L -> "", 9L -> "abc"))
  }

  test("hot key streams: 100k single-key ops replay with interleaved gets") {
    // one key owns the whole log — the shape that OOMs a per-key
    // materializing replay at scale. The streaming fold holds O(1) rows;
    // here we assert it stays correct under that load (every 1000th op is
    // a get observing exactly the appends with smaller seq).
    val n = 100000L
    val ops = KvStore.log(spark,
      (1L to n).map(i =>
        if (i % 1000L == 0L) (i, "get", "hot", "")
        else (i, "append", "hot", "."))) // 1-char appends keep state small
    val gets = KvStore.getsOf(ops).collect()
      .map(r => r.getAs[Long]("seq") -> r.getAs[String]("value").length).toMap
    assert(gets.size == (n / 1000L).toInt)
    // a get at seq i observes i - 1 - (number of earlier gets) appends
    gets.foreach { case (i, len) =>
      assert(len == (i - 1 - (i - 1) / 1000).toInt, s"get at seq $i")
    }
    val state = KvStore.stateOf(ops).collect()
    assert(state.length == 1 &&
      state(0).getAs[String]("value").length == (n - n / 1000L).toInt)
  }
}
