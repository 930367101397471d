package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over the user↔item interaction graph implied by the
  * events table (`props.k` is the item a user touched). Two classics every
  * large-scale events warehouse eventually runs: PageRank (iterative link
  * analysis) and item co-occurrence (the "users who touched i also touched
  * j" recommender primitive).
  *
  * Numeric discipline — [[pagerank]] runs entirely in FIXED-POINT BIGINT
  * arithmetic (rank scaled by [[Scale]], integer division everywhere).
  * Integer sums are associative and commutative, so the result is
  * bit-identical under ANY partitioning or aggregation order — which is
  * what lets an iterative float-free PageRank carry an exact DuckDB oracle
  * (a recursive CTE replaying the same `//` arithmetic). Float PageRank
  * would hash-mismatch on summation order alone.
  *
  * Scale design:
  *   - The edge list is built once (distinct user-item pairs — map-side
  *     combined), checkpointed, and re-read by every round; the per-round
  *     work is one join (ranks ⋈ edges on src — both sides hash-partitioned
  *     on the SAME key, so AQE reuses the exchange) plus one map-side
  *     combined sum on dst. No driver-side data ever: ranks live as
  *     distributed rows, rounds are fixed-count (no convergence collect).
  *   - Per-round `localCheckpoint` keeps the logical plan flat — without it
  *     round r's plan nests all r−1 predecessors and Catalyst re-optimizes
  *     the whole tower each round (the same superlinear-planning trap
  *     `Dedup.clusters` documents; measured there).
  *   - [[itemCooccur]] guards the quadratic per-user pair fan-out with
  *     [[MaxItemsPerUser]]: a bot touching 10⁶ items would emit 10¹² pairs;
  *     capped users are EXCLUDED (the standard spam guard in co-occurrence
  *     mining), making the fan-out per user ≤ cap² by construction. The
  *     pair count aggregation is map-side combined on (i, j).
  */
object Graph {

  /** Item node ids live at ItemBase + k so user and item ids share one
    * BIGINT node-id space without collision (fixture user_ids ≪ 10⁶; a
    * production deployment would partition the id space the same way).
    */
  val ItemBase = 1000000L

  /** Fixed-point scale: rank 1.0 ≡ 1,000,000. */
  val Scale = 1000000L

  /** Damping numerator/denominator: d = 85/100. */
  val DampNum = 85L
  val DampDen = 100L

  /** Fixed iteration count — a fixed-round PageRank is deterministic and
    * oracle-replayable; production runs pick rounds from the graph's
    * mixing time (10–20 covers web-scale graphs to ranking stability).
    */
  val Rounds = 10

  /** Co-occurrence hot-user cap (see scale note above). */
  val MaxItemsPerUser = 200

  /** Distinct (user, item) interactions — the bipartite edge set. */
  private[graft] def userItems(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("u"),
        (from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k") + lit(ItemBase)).as("i"))
      .distinct()

  /** Bidirected edge list (src, dst, d = src's out-degree). Bidirecting the
    * bipartite graph gives every node out-degree ≥ 1, so there is no
    * dangling-mass term to redistribute — total rank mass is conserved up
    * to per-node integer-division truncation.
    */
  private[graft] def edgesWithDeg(s: SparkSession, dir: String): DataFrame = {
    val base = userItems(s, dir)
    val ed = base.select(col("u").as("src"), col("i").as("dst"))
      .unionByName(base.select(col("i").as("src"), col("u").as("dst")))
    ed.join(ed.groupBy("src").agg(count(lit(1)).as("d")), "src")
  }

  /** pagerank — fixed-point PageRank over the user↔item graph:
    * rank⁰ = Scale; rankⁿ⁺¹(v) = 0.15·Scale + 0.85·Σ_{u→v} rankⁿ(u) ÷ d(u),
    * all in truncating BIGINT division. Output (node, rank): node < 10⁶ is
    * a user, node ≥ 10⁶ an item.
    */
  def pagerank(s: SparkSession, dir: String, rounds: Int = Rounds): DataFrame = {
    val sc = s.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit = {
      val live = sc.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(false)))
    }
    val (edges, edgeIds) = checkpointTracked(edgesWithDeg(s, dir))
    var (ranks, rankIds) = checkpointTracked(
      edges.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(Scale)))
    var round = 0
    while (round < rounds) {
      // every node has in-edges (bidirected graph), so the inner join +
      // groupBy covers the full node set each round
      val (next, nextIds) = checkpointTracked(
        ranks.join(edges, ranks("node") === edges("src"))
          .select(col("dst"), expr("rank DIV d").as("contrib"))
          .groupBy(col("dst").as("node"))
          .agg(expr(s"${Scale - Scale * DampNum / DampDen} + " +
            s"(sum(contrib) * $DampNum) DIV $DampDen").as("rank"))
          .select(col("node"), col("rank")))
      free(rankIds)
      ranks = next
      rankIds = nextIds
      round += 1
    }
    free(edgeIds)
    graft.TransientCache.adoptRddIds(rankIds)
    ranks
  }

  /** item_cooccur — for every ordered item pair (i, j), i ≠ j, the number
    * of (un-capped) users who touched both, keeping each item's top-5
    * partners (by n_users desc, j asc — a total order, so the top-k set is
    * deterministic). Emitting ordered pairs keeps "partners OF i" a simple
    * filter for the downstream recommender.
    *
    * Plan shape: one distinct (map-side combined), the hot-user filter as
    * a window count over u (the same u-shuffle the self-join needs — AQE
    * reuses the exchange), the pair fan-out inside the u-partition join,
    * then a map-side combined count on (i, j) and a per-i top-k window.
    */
  def itemCooccur(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ui = userItems(s, dir)
      .withColumn("n_items", count(lit(1)).over(Window.partitionBy("u")))
      .filter(col("n_items") <= MaxItemsPerUser)
      .select("u", "i")
    val a = ui.as("a")
    val b = ui.as("b")
    val pairs = a.join(b, col("a.u") === col("b.u") && col("a.i") =!= col("b.i"))
      .groupBy(col("a.i").as("item"), col("b.i").as("partner"))
      .agg(count(lit(1)).as("n_users"))
    pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy("item").orderBy(col("n_users").desc, col("partner"))))
      .filter(col("rk") <= topK)
      .select("item", "partner", "n_users", "rk")
  }
}
