package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, TextKernels}

/** The byte-scan token-count kernels (`bpe_token_count` / `ws_token_count`):
  * exact equivalence to the Java-regex formulations they replace (the DuckDB
  * oracles replay those regexes, so equivalence is the correctness contract),
  * codegen parity over a real scan, SQL registration, plan shape.
  */
class TextKernelSpec extends AnyFunSuite {
  import TestSpark._

  // The regex references the kernels must reproduce bit-for-bit.
  private val bpeRe =
    java.util.regex.Pattern.compile("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")

  private def bpeRef(s: String): Int = {
    val m = bpeRe.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // size(filter(split(trim(text), "\s+"), t => t =!= "")) — SQL trim strips
  // ASCII space only; split is Java regex with limit -1. wsTokens pins those
  // semantics already (WorkloadParitySpec); count its non-empty entries.
  private def wsRef(s: String): Int =
    graft.operators.TextOps.wsTokens(s).count(_.nonEmpty)

  private val edgeCases = Seq(
    "", " ", "   ", "\t", "\t\n\u000B\f\r", "a", "Z9", "a b", " a ",
    "\ta\tb\t", "a\nb", "...", "a.b,c", "!!", "a1b2 c3", "hello, world!",
    "é", "éé", "aéb", "a é b", "ß中文", "naïve café", "a\u0301",   // combining mark
    "\uD83D\uDE00", "a\uD83D\uDE00b", "\uD83D\uDE00 \uD83D\uDE01", // supplementary
    "mixed é\t中 \uD83D\uDE00x9!", "trailing space ", " leading",
    "\u00A0", "a\u00A0b") // NBSP is NOT Java-regex \s: must count as punct

  // split(trim(text), "\s+") reference — TextOps.wsTokens pins those exact
  // Java semantics (limit -1, ASCII-space trim) already.
  private def splitRef(s: String): Seq[String] =
    graft.operators.TextOps.wsTokens(s).toSeq

  private def kernelSplit(s: String): Seq[String] = {
    val a = TextKernels.wsSplit(UTF8String.fromString(s))
    (0 until a.numElements()).map(i =>
      a.getUTF8String(i).toString)
  }

  test("kernels == regex references on edge cases") {
    for (s <- edgeCases) {
      assert(TextKernels.bpeTokenCount(UTF8String.fromString(s)) == bpeRef(s),
        s"bpe mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(TextKernels.wsTokenCount(UTF8String.fromString(s)) == wsRef(s),
        s"ws mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(kernelSplit(s) == splitRef(s),
        s"split mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("kernels == regex references on 2000 random unicode-mixed strings") {
    val alphabet: IndexedSeq[String] =
      ("abcXYZ019" .map(_.toString)) ++
        (".,!?@#-_" .map(_.toString)) ++
        (" \t\n\u000B\f\r".map(_.toString)) ++
        IndexedSeq("é", "ß", "中", "ω", "\u0301", "\u00A0", "\uD83D\uDE00",
          "\uD83E\uDD16", "  ", "ab", "a.")
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 0 until 2000) {
      val len = rnd.nextInt(40)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString
      assert(TextKernels.bpeTokenCount(UTF8String.fromString(s)) == bpeRef(s),
        s"bpe mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(TextKernels.wsTokenCount(UTF8String.fromString(s)) == wsRef(s),
        s"ws mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(kernelSplit(s) == splitRef(s),
        s"split mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("ws_split column == split(trim, \\s+) column over a real scan") {
    import org.apache.spark.sql.functions.{col, split, trim}
    val rows = graft.sources.Tables.documents(spark, Sf0001)
      .select(
        split(trim(col("text")), "\\s+").as("regex"),
        GraftFunctions.wsSplit(col("text")).as("kernel"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("codegen path over a real scan == regex references") {
    import org.apache.spark.sql.functions.col
    val rows = graft.sources.Tables.documents(spark, Sf0001)
      .select(col("text"),
        GraftFunctions.bpeTokenCount(col("text")).as("nb"),
        GraftFunctions.wsTokenCount(col("text")).as("nw"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(r.getAs[Int]("nb") == bpeRef(t))
      assert(r.getAs[Int]("nw") == wsRef(t))
    }
  }

  test("register as SQL functions; null-safe") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT bpe_token_count('hello, world!') AS nb, " +
        "ws_token_count(' a\tb  c ') AS nw, " +
        "bpe_token_count(CAST(NULL AS STRING)) AS nnull")
      .collect()(0)
    assert(r.getAs[Int]("nb") == 4) // hello | , | world | !
    assert(r.getAs[Int]("nw") == 3)
    assert(r.isNullAt(2))
  }

  test("text_tokens plan: kernels inside whole-stage codegen, no regex/HOF") {
    val df = graft.operators.TextOps.textTokens(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bpe_token_count") && plan.contains("ws_token_count"),
      s"kernels missing from plan:\n$plan")
    assert(!plan.contains("regexp_extract_all"), s"regex survived:\n$plan")
    assert(!plan.toLowerCase.contains("arrayfilter") && !plan.contains("filter(split"),
      s"interpreted HOF survived:\n$plan")
    // the compact executedPlan string marks whole-stage-codegen stages
    // with a "*(N)" operator prefix
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
