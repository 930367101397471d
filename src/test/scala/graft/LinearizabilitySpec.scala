package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.KvStore

/** Porcupine-flavored linearizability checking of CONCURRENT histories —
  * the one piece of the reference's test infrastructure the engine had not
  * mirrored (reference `src/porcupine/checker.go:1-39`, KV model
  * `src/models/kv.go:40-56`). `KvStore.replay` replays a single totally-
  * ordered log (its linearizability contract); this suite checks the other
  * direction: given overlapping client operations with only interval
  * timing, does a valid total order EXIST, and does the engine's replay
  * agree with it?
  *
  * Test-only infra by design, matching the reference's classification of
  * porcupine (SURVEY §0) — the checker is a driver-side DFS over per-key
  * partitions (the reference model partitions by key the same way), not a
  * distributed operator: histories are per-test-run sized, never data-
  * sized.
  */
class LinearizabilitySpec extends AnyFunSuite {
  import TestSpark._

  /** One completed client operation with its real-time interval.
    * `op` ∈ {"get", "put", "append"}; `out` is meaningful for gets.
    */
  case class HOp(client: Int, inv: Long, ret: Long, op: String, key: String,
      arg: String, out: String)

  /** The reference KV model's step (src/models/kv.go:44-56): get observes
    * the state, put replaces, append concatenates; absent keys read "".
    * None = the op's recorded output contradicts the state.
    */
  private def step(state: String, o: HOp): Option[String] = o.op match {
    case "put" => Some(o.arg)
    case "append" => Some(state + o.arg)
    case "get" => if (o.out == state) Some(state) else None
    case other => fail(s"unknown op $other")
  }

  /** Wing & Gong-style search for a witness linearization of a SINGLE-KEY
    * history: DFS over "which op linearizes next", where an op is eligible
    * first iff no other remaining op returned before it was invoked (a
    * completed op precedes a later-invoked one in any legal order).
    * Memoizes (remaining set, state) — the same pruning porcupine's
    * checker applies via its state cache.
    */
  private def linearize(history: IndexedSeq[HOp]): Option[List[HOp]] = {
    val seen = scala.collection.mutable.HashSet.empty[(Set[Int], String)]
    def dfs(remaining: Set[Int], state: String): Option[List[Int]] = {
      if (remaining.isEmpty) return Some(Nil)
      if (!seen.add((remaining, state))) return None
      val eligible = remaining.filter(i =>
        remaining.forall(j => j == i || history(j).ret > history(i).inv))
      eligible.toSeq.sorted.foreach { i =>
        step(state, history(i)).foreach { next =>
          dfs(remaining - i, next) match {
            case Some(rest) => return Some(i :: rest)
            case None => ()
          }
        }
      }
      None
    }
    dfs(history.indices.toSet, "").map(_.map(history))
  }

  /** Multi-key check: partition by key exactly as the reference model's
    * Partition does, find a witness per key (keys are independent under
    * the model, so per-key witnesses compose into a global linearization).
    */
  private def linearizeAll(history: Seq[HOp]): Option[Map[String, List[HOp]]] = {
    val byKey = history.groupBy(_.key)
    val witnesses = byKey.map { case (k, ops) => k -> linearize(ops.toIndexedSeq) }
    if (witnesses.values.forall(_.isDefined)) Some(witnesses.map { case (k, w) => k -> w.get })
    else None
  }

  /** Discrete-event simulation of C concurrent clients against a
    * sequential store: at every tick one of {invoke, linearize, return}
    * fires for a random client, so operation intervals genuinely overlap
    * while each op's linearization point (where it reads/writes the store)
    * lies inside its interval. The produced history is linearizable BY
    * CONSTRUCTION — the simulation's own schedule is the witness.
    */
  private def simulate(seed: Long, nClients: Int, opsPerClient: Int,
      keys: Vector[String]): Vector[HOp] = {
    val rnd = new scala.util.Random(seed)
    val args = Vector("a", "b", "c")
    val store = scala.collection.mutable.Map.empty[String, String]
    final class Flight(val client: Int, val op: String, val key: String,
        val arg: String, val inv: Long) {
      var linearized = false
      var out = ""
    }
    var time = 0L
    def tick(): Long = { time += 1; time }
    val remaining = Array.fill(nClients)(opsPerClient)
    val inFlight = Array.fill[Option[Flight]](nClients)(None)
    val done = Vector.newBuilder[HOp]
    var left = nClients * opsPerClient
    while (left > 0) {
      val canInvoke = (0 until nClients).filter(c => inFlight(c).isEmpty && remaining(c) > 0)
      val canLin = (0 until nClients).filter(c => inFlight(c).exists(!_.linearized))
      val canRet = (0 until nClients).filter(c => inFlight(c).exists(_.linearized))
      val moves = canInvoke.map(c => ("inv", c)) ++ canLin.map(c => ("lin", c)) ++
        canRet.map(c => ("ret", c))
      val (kind, c) = moves(rnd.nextInt(moves.size))
      kind match {
        case "inv" =>
          val op = Vector("get", "put", "append")(rnd.nextInt(3))
          val key = keys(rnd.nextInt(keys.size))
          val arg = if (op == "get") "" else args(rnd.nextInt(args.size))
          inFlight(c) = Some(new Flight(c, op, key, arg, tick()))
        case "lin" =>
          val f = inFlight(c).get
          f.op match {
            case "get" => f.out = store.getOrElse(f.key, "")
            case "put" => store(f.key) = f.arg
            case "append" => store(f.key) = store.getOrElse(f.key, "") + f.arg
          }
          f.linearized = true
          tick(): Unit
        case "ret" =>
          val f = inFlight(c).get
          done += HOp(c, f.inv, tick(), f.op, f.key, f.arg, f.out)
          inFlight(c) = None
          remaining(c) -= 1
          left -= 1
      }
    }
    done.result()
  }

  test("property: simulated concurrent histories are accepted (100 seeds)") {
    for (seed <- 1 to 100) {
      val h = simulate(seed, nClients = 4, opsPerClient = 4, keys = Vector("x", "y"))
      assert(linearizeAll(h).isDefined, s"seed $seed rejected a valid history:\n$h")
    }
  }

  test("property: corrupting any get's output makes the history rejected") {
    // generator args are drawn from {a,b,c}, so a state containing 'Z' is
    // unreachable under ANY order — the corruption is unambiguously illegal
    var checked = 0
    for (seed <- 1 to 60) {
      val h = simulate(seed, nClients = 3, opsPerClient = 3, keys = Vector("x"))
      val gets = h.zipWithIndex.filter(_._1.op == "get")
      if (gets.nonEmpty) {
        val (_, idx) = gets(seed % gets.size)
        val bad = h.updated(idx, h(idx).copy(out = h(idx).out + "Z"))
        assert(linearizeAll(bad).isEmpty, s"seed $seed accepted a corrupted get:\n$bad")
        checked += 1
      }
    }
    assert(checked > 30, s"too few histories contained gets: $checked")
  }

  test("rejects: stale read after a completed put") {
    // put returned (t=1) before the get was invoked (t=2): the get cannot
    // observe the initial ""
    val h = Vector(
      HOp(0, 0L, 1L, "put", "x", "a", ""),
      HOp(1, 2L, 3L, "get", "x", "", ""))
    assert(linearize(h).isEmpty)
  }

  test("rejects: gets observing two writes in contradictory orders") {
    // both puts completed before either get; the two sequential gets then
    // observe different final states — no single order explains both
    val h = Vector(
      HOp(0, 0L, 3L, "put", "x", "a", ""),
      HOp(1, 1L, 4L, "put", "x", "b", ""),
      HOp(2, 5L, 6L, "get", "x", "", "a"),
      HOp(2, 7L, 8L, "get", "x", "", "b"))
    assert(linearize(h).isEmpty)
  }

  test("rejects: append order contradicted by a read") {
    // append(a) completed strictly before append(b) started -> "ba" is
    // impossible
    val h = Vector(
      HOp(0, 0L, 1L, "append", "x", "a", ""),
      HOp(0, 2L, 3L, "append", "x", "b", ""),
      HOp(1, 4L, 5L, "get", "x", "", "ba"))
    assert(linearize(h).isEmpty)
  }

  test("accepts: concurrent appends justify either observed order") {
    val h = Vector(
      HOp(0, 0L, 5L, "append", "x", "a", ""),
      HOp(1, 1L, 6L, "append", "x", "b", ""),
      HOp(2, 7L, 8L, "get", "x", "", "ba"))
    val w = linearize(h)
    assert(w.isDefined)
    assert(w.get.filter(_.op == "append").map(_.arg) == List("b", "a"),
      "witness must order the appends to justify the read")
  }

  test("witness linearizations replay identically through KvStore.replay") {
    // close the loop with the ENGINE: the checker's witness order, replayed
    // through the distributed single-log replay, must reproduce the exact
    // get outputs and final state the model predicts — i.e. the operator's
    // replay semantics and the checker's model are the same semantics
    val h = simulate(seed = 42, nClients = 4, opsPerClient = 5, keys = Vector("x", "y", "z"))
    val witnesses = linearizeAll(h).getOrElse(fail("simulated history must linearize"))
    val log = witnesses.toSeq.flatMap { case (_, ops) =>
      ops.zipWithIndex.map { case (o, i) => KvStore.KvOp(i.toLong, o.op, o.key, o.arg) }
    }
    val replayed = KvStore.replay(KvStore.log(spark, log.map(o => (o.seq, o.op, o.key, o.value))))
      .collect()
    // every get observes exactly what the history recorded
    val gotGets = replayed.filter(_.kind == "get")
      .map(r => (r.key, r.seq) -> r.value).toMap
    witnesses.foreach { case (key, ops) =>
      ops.zipWithIndex.filter(_._1.op == "get").foreach { case (o, i) =>
        assert(gotGets((key, i.toLong)) == o.out,
          s"replayed get #$i on $key disagrees with the history")
      }
    }
    // final state per key matches a driver-side fold of the witness
    val finalStates = replayed.filter(_.kind == "state").map(r => r.key -> r.value).toMap
    witnesses.foreach { case (key, ops) =>
      val expected = ops.foldLeft("") { (st, o) => step(st, o).getOrElse(fail("witness must step")) }
      val wrote = ops.exists(o => o.op == "put" || o.op == "append")
      if (wrote) assert(finalStates(key) == expected, s"final state of $key")
      else assert(!finalStates.contains(key))
    }
  }
}
