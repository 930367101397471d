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
}
