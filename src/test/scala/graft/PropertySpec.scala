package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Workloads
import graft.functions.HashFunctions

/** Property tests over the pure kernels (SURVEY §5: add property tests where
  * the reference has none but semantics allow). Raw ScalaCheck Gen sampling
  * with a fixed seed — deterministic, no Spark session needed.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator produced no sample"))

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
  private val text: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("fnv64 matches the published FNV-1a 64 test vectors") {
    assert(HashFunctions.fnv64("") == 0xcbf29ce484222325L)
    assert(HashFunctions.fnv64("a") == 0xaf63dc4c8601ec8cL)
    assert(HashFunctions.fnv64("foobar") == 0x85944171f73967e8L)
  }

  test("shingleSet is invariant to leading/trailing spaces") {
    samples(text, 200).foreach { t =>
      assert(Dedup.shingleSet("  " + t + " ") == Dedup.shingleSet(t), s"text: $t")
    }
  }

  test("equal shingle sets produce equal LSH band keys (recall 1 at j=1)") {
    samples(text, 200).foreach { t =>
      val sh = Dedup.shingleSet(t)
      assert(Dedup.bandKeys(sh).toSeq == Dedup.bandKeys(sh).toSeq)
      // identical docs always collide in every band -> candidate guaranteed
      val sh2 = Dedup.shingleSet(t + "")
      assert(Dedup.bandKeys(sh).toSeq == Dedup.bandKeys(sh2).toSeq)
    }
  }

  test("simhash64 is token-order insensitive (vote sums commute)") {
    samples(text, 200).filter(_.nonEmpty).foreach { t =>
      val toks = t.split("\\s+").toSeq
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(toks).mkString(" ")
      assert(Dedup.simhash64(t) == Dedup.simhash64(shuffled), s"text: $t")
    }
  }

  test("wc additivity: counts over concatenated corpora add up") {
    val docs = samples(text, 100)
    def counts(ts: Seq[String]): Map[String, Int] =
      ts.flatMap(Workloads.letterTokens).groupBy(identity).view.mapValues(_.size).toMap
    val (a, b) = docs.splitAt(50)
    val merged = (counts(a).keySet ++ counts(b).keySet).map { w =>
      w -> (counts(a).getOrElse(w, 0) + counts(b).getOrElse(w, 0))
    }.toMap
    assert(counts(docs) == merged)
  }

  test("mix64 is a bijection on sampled longs (no accidental collisions)") {
    val longs = samples(Gen.long, 2000)
    assert(longs.map(Dedup.mix64).distinct.size == longs.distinct.size)
  }
}
