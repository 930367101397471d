package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup, Pipeline}

/** Session-hygiene contract: operator-internal caches and checkpoints are
  * registered transients, and one [[TransientCache.release]] sweep after the
  * consuming action leaves ZERO persisted blocks behind (memoized shared
  * artifacts persist by design until [[TransientCache.releaseAll]]).
  * This is the invariant that keeps a 60-query session — or a month-long
  * production session — from accumulating storage pressure.
  */
class TransientCacheSpec extends AnyFunSuite {
  import TestSpark._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("cache-heavy operators leave no blocks after release + releaseAll") {
    TransientCache.releaseAll(spark)
    spark.catalog.clearCache()
    // other suites in this shared JVM may hold unregistered blocks; the
    // contract under test is that OUR operators add nothing beyond this set
    val strays = persistedIds

    // each of these caches or checkpoints internally
    Ann.lshTopK(spark, Sf0001).write.mode("overwrite").format("noop").save()
    Dedup.minhash(spark, Sf0001).write.mode("overwrite").format("noop").save()
    Dedup.clusters(spark, Sf0001).write.mode("overwrite").format("noop").save()
    assert((persistedIds -- strays).nonEmpty,
      "operators should have live transient blocks before the sweep")

    TransientCache.release(spark)
    // after the per-query sweep only the memoized shared edge artifact may
    // remain (bounded: one entry per (dir, threshold))
    TransientCache.releaseAll(spark)
    assert(persistedIds -- strays == Set.empty[Int],
      "releaseAll must drop every operator-registered block")
  }

  test("memoized similarity edges are shared: second consumer reuses blocks") {
    TransientCache.releaseAll(spark)
    val e1 = Dedup.similarityEdges(spark, Sf0001)
    val n1 = e1.count()
    // same key → the SAME materialized frame, not a recompute
    val e2 = Dedup.similarityEdges(spark, Sf0001)
    assert(e1 eq e2, "memo must return the identical shared frame")
    // both consumers agree with the underlying join
    val direct = Dedup.jaccard3(spark, Sf0001).count()
    assert(n1 == direct)
    TransientCache.releaseAll(spark)
  }

  test("memo is atomic: concurrent same-key callers run ONE build") {
    TransientCache.releaseAll(spark)
    val s = spark
    import s.implicits._
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { i =>
      Future {
        gate.await()
        TransientCache.memo("memo-race-test") {
          builds.incrementAndGet()
          Seq(1, 2, 3).toDF("v")
        }
      }
    }
    gate.countDown()
    val frames = Await.result(Future.sequence(futures), scala.concurrent.duration.Duration("60s"))
    assert(builds.get() == 1,
      s"build + localCheckpoint ran ${builds.get()} times for one key")
    assert(frames.forall(_ eq frames.head), "all callers must share one frame")
    TransientCache.releaseAll(spark)
  }

  test("releaseAll clears memo locks and a post-release memo still works") {
    val s = spark
    import s.implicits._
    TransientCache.memo("lock-hygiene-a") { Seq(1).toDF("v") }
    TransientCache.memo("lock-hygiene-b") { Seq(2).toDF("v") }
    assert(TransientCache.memoLockCount >= 2)
    TransientCache.releaseAll(spark)
    assert(TransientCache.memoLockCount == 0,
      "releaseAll must drop per-key lock objects, not just the memo frames")
    // a rebuild after the sweep mints a fresh lock and a fresh frame
    val rebuilt = TransientCache.memo("lock-hygiene-a") { Seq(3).toDF("v") }
    assert(rebuilt.collect().map(_.getInt(0)).toSeq == Seq(3))
    TransientCache.releaseAll(spark)
  }

  test("releaseAll waits for an in-flight memo build and sweeps its blocks") {
    TransientCache.releaseAll(spark)
    val s = spark
    import s.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val baseline = s.sparkContext.getPersistentRDDs.size
    val buildStarted = new java.util.concurrent.CountDownLatch(1)
    val buildDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val builder = Future {
      TransientCache.memo("sweep-race-test") {
        buildStarted.countDown()
        Thread.sleep(500) // keep the build in flight while releaseAll races it
        buildDone.set(true)
        Seq(1, 2, 3).toDF("v")
      }
    }
    buildStarted.await()
    // the sweep must BLOCK until the build registers its blocks, then drop
    // them — before the gate, these blocks survived until the next sweep
    TransientCache.releaseAll(spark)
    assert(buildDone.get(),
      "releaseAll returned while the memo build was still in flight")
    Await.result(builder, scala.concurrent.duration.Duration("60s"))
    assert(s.sparkContext.getPersistentRDDs.size == baseline,
      "the racing build's checkpoint blocks must not outlive the sweep")
    assert(TransientCache.memoLockCount == 0)
  }

  test("clusters and pipeline_keep share one edge set and stay correct") {
    TransientCache.releaseAll(spark)
    val clusters = Dedup.clusters(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = Pipeline.keep(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(clusters == keep.map(identity),
      "keep-set cluster ids must equal the cluster table's")
    TransientCache.releaseAll(spark)
    TransientCache.release(spark)
  }

  test("clusters accepts a caller-supplied pair set") {
    val s = spark
    import s.implicits._
    // a 4-node path 1-2, 2-3 plus isolated 4 — via the pairs parameter the
    // similarity join is bypassed entirely
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc1", "doc2")
    val labels = Dedup.clusters(spark, Sf0001, pairs = Some(pairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    // docs untouched by the supplied edges keep themselves as cluster id
    assert(labels.filterNot(kv => Set(1L, 2L, 3L)(kv._1)).forall(kv => kv._1 == kv._2))
    TransientCache.release(spark)
  }
}
