package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators a production LLM training-data pipeline runs
  * after per-document filtering and dedup: benchmark decontamination,
  * token-budget sequence packing, and per-source document caps.
  *
  * Scale design at 100 TB:
  *   - `decontam` joins the corpus against the BENCHMARK n-gram set, never
  *     corpus-vs-corpus: the benchmark side is test-set sized (MBs), so it
  *     broadcasts and the corpus is touched in one scan + one per-doc
  *     aggregation with map-side partial counts;
  *   - `packSequences` is a running-sum window per language shard — one
  *     shuffle keyed on the shard column. The bin assignment depends only on
  *     the PREFIX sum of token counts, so it stays deterministic under any
  *     executor count (contrast greedy first-fit packing, whose output
  *     depends on visit order);
  *   - `domainCap` is a bounded top-k per key: rank-within-domain then
  *     filter, which Spark executes as one hash shuffle on the domain plus a
  *     per-partition sort — no global sort, no driver collection.
  */
object Curation {

  /** Benchmark membership stand-in for the fixture: every `benchmarkMod`-th
    * document plays the held-out eval set. A real pipeline reads the actual
    * benchmark corpus here; the plan shape is identical.
    */
  val BenchmarkMod = 50

  /** decontam — test-set decontamination by word-3-gram overlap (the
    * GPT-3/Gopher appendix recipe: a training document is contaminated when
    * it shares n-grams with an evaluation benchmark). Shingle semantics are
    * exactly [[Dedup.shingleSet]] — the same grams the dedup family uses, so
    * one persisted gram table can serve both at scale.
    *
    * Output per NON-benchmark document: distinct-gram count, how many of
    * those grams appear anywhere in the benchmark, the overlap fraction, and
    * the boolean a pipeline filters on.
    *
    * 100 TB plan: the benchmark gram set (right side) is tiny — broadcast
    * equi-join, corpus scanned once, per-doc counts partial-aggregated
    * map-side. No corpus-vs-corpus shuffle exists in this plan.
    */
  def decontam(s: SparkSession, dir: String, benchmarkMod: Int = BenchmarkMod): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Dedup.shingleSet(text)) }
      .toDF("doc_id", "grams")
    val bench = grams
      .filter(col("doc_id") % benchmarkMod === 0)
      .select(explode(col("grams")).as("gram"))
      .distinct()
      .withColumn("bench_hit", lit(1))
    grams
      .filter(col("doc_id") % benchmarkMod =!= 0)
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
      .join(broadcast(bench), Seq("gram"), "left")
      .groupBy("doc_id", "n_grams")
      .agg(count(col("bench_hit")).as("bench_hits"))
      .select(
        col("doc_id"), col("n_grams"), col("bench_hits"),
        (col("bench_hits").cast("double") / col("n_grams").cast("double"))
          .as("contamination"),
        (col("bench_hits") > 0).as("contaminated"))
  }

  /** Token budget per packed training sequence (fixture-sized; a real run
    * uses the model context length, e.g. 2048/4096/8192).
    */
  val SeqBudget = 256

  /** pack_sequences — assign documents to fixed-token-budget training
    * sequences: within each language shard, documents are laid out in doc_id
    * order and a document goes to the bin its STARTING token offset falls in
    * (`(prefix_sum - n_toks) div budget`). This is the deterministic
    * streaming formulation of sequence packing: bins can overflow by at most
    * one document (the concatenation-then-chunk layout GPT-style pretraining
    * uses), and the assignment is a pure function of the ordered prefix sums
    * — independent of partitioning, unlike greedy first-fit.
    *
    * 100 TB plan: one shuffle on the shard key (lang here; lang × date in a
    * real lake, which also bounds skew). The window is a running sum, which
    * Spark evaluates with a single sort per shard partition — no global
    * sort. A dominant shard is sub-sharded by a deterministic doc_id range
    * split upstream; the bin ids stay stable because they depend only on
    * in-shard prefix sums.
    */
  def packSequences(s: SparkSession, dir: String, budget: Int = SeqBudget): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("lang"), col("doc_id"), col("n_toks"),
        expr(s"(cum - n_toks) DIV $budget").as("seq_id"))
  }

  /** Per-source keep limit (CCNet/RefinedWeb-style domain balancing caps a
    * single domain's share of the corpus).
    */
  val DomainCap = 15

  /** domain_cap — keep at most `cap` documents per source/domain, preferring
    * longer documents (n_chars as the quality proxy; ties broken by doc_id
    * so the result is total-order deterministic). Emits the kept rows with
    * their in-domain rank.
    *
    * 100 TB plan: rank-within-key is one hash shuffle on `source` + a
    * per-partition sort of that domain's rows. Because the rank filter is a
    * row_number ≤ cap, Catalyst inserts `WindowGroupLimit(Partial)` BELOW
    * the exchange (verified in the executed plan): each map partition keeps
    * at most `cap` rows per domain before shuffling, so a mega-domain ships
    * ≤ cap × mapPartitions rows, not its full row count — the two-level
    * top-k refinement for free.
    */
  def domainCap(s: SparkSession, dir: String, cap: Int = DomainCap): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
  }

  /** Chunk geometry for the fixture: 64-token windows advancing by 48 (16
    * tokens of overlap). A real pipeline sets window = model context length
    * and stride = window − overlap.
    */
  val ChunkWindow = 64
  val ChunkStride = 48

  /** chunk_docs — split every document into fixed-token-budget windows with
    * overlap (the context-window splitter: long documents become multiple
    * training examples, the overlap preserving cross-boundary n-grams for
    * retrieval/embedding corpora). A chunk starts at every `stride` multiple
    * below the token count and takes up to `window` tokens, so the chunk set
    * is a pure per-row function of the document — no state, no shuffle.
    *
    * 100 TB plan: one codegen'd scan with a generate (posexplode) — embarras-
    * singly parallel, output is written straight back out partitioned however
    * the sink wants. Contrast stateful packing ([[packSequences]]), which
    * needs a per-shard prefix sum; chunking deliberately does NOT coalesce
    * short documents, so it needs no cross-row coordination at all.
    */
  def chunkDocs(s: SparkSession, dir: String,
      window: Int = ChunkWindow, stride: Int = ChunkStride): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
      .select(col("doc_id"), col("n_toks"), col("toks"),
        posexplode(sequence(lit(0), col("n_toks") - 1, lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(
        col("doc_id"), col("n_toks"), col("chunk_idx"), col("start_tok"),
        least(lit(window), col("n_toks") - col("start_tok")).as("chunk_toks"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(window)), " ")
          .as("chunk_text"))

  /** split_assign — reproducible train/val/test assignment: a salted md5
    * coin per document, three-way thresholded at 80/10/10. Two properties a
    * production pipeline needs and ad-hoc `rand()` splits lack:
    *
    *   - determinism under any partitioning/retry — the split is a pure
    *     function of doc_id, so a re-run (or a late-arriving shard) lands
    *     every document in the same split;
    *   - coin independence — the coin is salted with a purpose tag
    *     ("split:"), so it is INDEPENDENT of [[Pipeline.mix]]'s sampling
    *     coin (md5 of the bare id). Reusing one hash for both decisions
    *     would correlate them (every sampled-out doc would also skew the
    *     split), a classic silent eval-contamination bug.
    *
    * One codegen'd scan, no shuffle; thresholds compare the first 8 hex
    * chars lexicographically (uniform over 2^32).
    */
  def splitAssign(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8)
          .as("coin"))
      .withColumn("split",
        when(col("coin") < "cccccccc", "train")     // 0.8 * 2^32
          .when(col("coin") < "e6666666", "val")    // 0.9 * 2^32
          .otherwise("test"))

  /** text_commonness — corpus-frequency document scoring (the integral
    * cousin of CCNet's LM-perplexity filter): token-level corpus frequencies
    * aggregated per document. Documents full of rare tokens (low
    * `rarest_freq` / `mean_freq`) are OCR garbage or boilerplate-stripped
    * fragments; documents of only ultra-common tokens carry no information.
    * All sums stay integral (counts of counts) so the oracle compare is
    * bit-exact — no float log-prob summation-order hazard.
    *
    * Two-pass plan: (1) one shuffle on token to build the corpus frequency
    * table; (2) join the exploded tokens back to it and aggregate per doc.
    * The frequency table is an aggregate, so AQE sizes it at runtime and
    * converts the join to broadcast when the vocabulary fits (it does here,
    * and for any natural-language vocabulary in the low millions); a
    * web-scale token table beyond that joins by one extra shuffle on `tok` —
    * still linear, never all-pairs.
    */
  def textCommonness(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tok_freq"))
    toks.join(freq, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        sum("tok_freq").as("freq_sum"),
        min("tok_freq").as("rarest_freq"))
      .withColumn("mean_freq",
        col("freq_sum").cast("double") / col("n_toks").cast("double"))
  }

  /** Epoch count / shard fan-out for [[epochOrder]]. 16 shards is fixture-
    * sized; a real run sets shards ≈ executor-cores × small constant
    * (any power of 16 — the shard is a coin hex prefix) so shard files are
    * write-parallel.
    */
  val Epochs = 3
  val OrderShards = 16

  /** epoch_order — deterministic multi-epoch training shuffle order: every
    * document gets, per epoch, a salted md5 coin, a shard (top 4 coin bits
    * here), and its position within that (epoch, shard) by coin order. The
    * total training order for epoch e is (shard, pos) lexicographic — the
    * sharded-shuffle layout pretraining loaders consume (shard files, each
    * internally ordered), with a FRESH permutation per epoch because the
    * coin is salted with the epoch number.
    *
    * Determinism under retry/repartition is the whole point (same property
    * as [[splitAssign]]): re-running any epoch reproduces byte-identical
    * shard files, so a resumed training run sees the same example order.
    *
    * 100 TB plan: one shuffle keyed on (epoch, shard) — 16 shards here,
    * thousands in production, so each window partition is corpus/shards and
    * the per-partition sort is Spark's external sort. Deliberately NOT a
    * global row_number over the epoch: a dense corpus-wide rank needs either
    * a single-partition window (doesn't scale) or a second prefix-sum pass;
    * the (shard, pos) pair encodes the same total order for free.
    */
  def epochOrder(s: SparkSession, dir: String,
      epochs: Int = Epochs, shards: Int = OrderShards): DataFrame = {
    // shard = first k coin hex digits, so the fan-out must be a power of 16
    // (16 at fixture scale, 256/4096/… in production); the prefix length is
    // log16(shards)
    val hexDigits = {
      val tz = java.lang.Integer.numberOfTrailingZeros(shards)
      require(shards >= 16 && java.lang.Integer.bitCount(shards) == 1 && tz % 4 == 0,
        s"shards must be a power of 16, got $shards")
      tz / 4
    }
    val w = Window.partitionBy("epoch", "shard").orderBy(col("coin").asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("coin",
        md5(concat(lit("epoch:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard", conv(substring(col("coin"), 1, hexDigits), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("epoch", "shard", "pos", "doc_id")
  }

  /** Per-source token budget for [[budgetSample]] (fixture-sized; a real
    * run sets this to the mixture allocation, e.g. "30B tokens of code").
    */
  val SourceBudget = 256

  /** budget_sample — token-budget mixture allocation: each source
    * contributes documents, visited in salted-coin order (uniform random
    * but deterministic), until its TOKEN budget fills — a document is kept
    * iff the tokens before it in coin order fit under the budget, so the
    * last kept document may overshoot by at most itself (the same
    * starting-offset discipline as [[packSequences]]' bins). This is the
    * "N tokens per domain" step of mixture construction — [[Pipeline.mix]]
    * downsamples by RATE; this allocates by absolute token count, which is
    * how training mixtures are actually specified.
    *
    * 100 TB plan: one shuffle on source; the running sum shares the
    * per-source sort. A mega-source sorts corpus/source rows per partition
    * (external sort); when budget ≪ source size, a two-phase refinement
    * (cap by rank ≤ budget/min_doc_tokens map-side first) bounds the sort
    * input — documented trade, not needed at fixture scale.
    */
  def budgetSample(s: SparkSession, dir: String, budget: Int = SourceBudget): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("coin").asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_toks"),
        md5(concat(lit("budget:"), col("doc_id").cast("string"))).as("coin"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .filter(col("cum") - col("n_toks") < budget)
      .select(col("source"), col("doc_id"), col("n_toks"), col("cum"))
  }

  /** Per-stratum sample size for [[stratifiedSample]]. */
  val StratumK = 40

  /** stratified_sample — exact-k-per-stratum deterministic sample: within
    * each language, keep the k documents with the smallest salted md5 coins
    * (coin order is uniform, so this is a uniform without-replacement sample
    * of each stratum — unlike [[domainCap]], which deliberately PREFERS long
    * documents). The eval-set / ablation-corpus builder: "40 random docs per
    * language, reproducibly, regardless of cluster size or retry".
    *
    * The coin salt ("strat:") keeps this decision independent of the
    * split coin ("split:") and [[Pipeline.mix]]'s sampling coin — the same
    * coin-isolation rule splitAssign documents.
    *
    * 100 TB plan: identical shape to domain_cap — one hash shuffle on lang
    * with Catalyst's WindowGroupLimit(Partial) keeping ≤ k rows per stratum
    * map-side before the exchange, so a billion-doc language ships k rows
    * per map partition, not its corpus. Exact-k without any global sort or
    * per-stratum scan-twice reservoir pass.
    */
  def stratifiedSample(s: SparkSession, dir: String, k: Int = StratumK): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("coin").asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("strat:"), col("doc_id").cast("string"))).as("coin"))
      .withColumn("rank_in_stratum", row_number().over(w))
      .filter(col("rank_in_stratum") <= k)
      .select("lang", "rank_in_stratum", "doc_id")
  }

  /** Redaction patterns for [[piiScrub]]. Deliberately RE2-compatible (no
    * lookaround, no backreferences) so the identical pattern strings run in
    * Java's regex engine here and in RE2-based engines (DuckDB, Go) — one
    * pattern set, one semantics, every engine.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val LongNumRe = "[0-9]{7,}"

  /** The scrub core: count-then-replace each pattern IN ORDER (emails, then
    * IPv4, then ≥7-digit runs), each pattern evaluated against the text
    * state its replacement applies to — so a digit run inside an email is
    * redacted as part of the email, never double-counted. Pure codegen'd
    * builtins (`regexp_extract_all` + `regexp_replace`), one scan, zero
    * shuffle: scrubbing scales with read bandwidth like every other
    * per-document text operator.
    */
  private[graft] def scrub(df: DataFrame, textCol: Column): DataFrame =
    df
      .withColumn("n_emails", size(regexp_extract_all(textCol, lit(EmailRe), lit(0))))
      .withColumn("t1", regexp_replace(textCol, EmailRe, "<EMAIL>"))
      .withColumn("n_ips", size(regexp_extract_all(col("t1"), lit(Ipv4Re), lit(0))))
      .withColumn("t2", regexp_replace(col("t1"), Ipv4Re, "<IP>"))
      .withColumn("n_nums", size(regexp_extract_all(col("t2"), lit(LongNumRe), lit(0))))
      .withColumn("scrubbed", regexp_replace(col("t2"), LongNumRe, "<NUM>"))
      .drop("t1", "t2")

  /** pii_scrub — PII redaction, the compliance step every crawl-derived
    * training corpus runs before anything else sees the text: emails, IPv4
    * addresses, and long digit runs (phone/account numbers) are counted and
    * replaced with typed placeholder tokens.
    *
    * The fixture corpus is synthetic word salad with NO digits or PII, so
    * scrubbing it raw would be vacuous (every count 0, text unchanged — the
    * dedup_embed lesson from round 6). The registered query therefore first
    * appends a deterministic contact footer — email, IP, phone, each a pure
    * function of doc_id, plus an extra IP on every third doc so counts are
    * not constant — and the DuckDB oracle replays the same augmentation
    * before applying the same count/replace chain. The full redaction PLAN
    * is exercised end-to-end with non-trivial counts and per-doc texts;
    * real-PII pattern behavior (odd TLDs, digits inside emails, adjacent
    * runs) is pinned on planted strings in CurationSpec.
    */
  /** Tokens per line for [[lineDedup]]'s tiling. */
  val LineTokens = 8

  /** A document as its dedup "lines": the token stream tiled into
    * [[LineTokens]]-token lines (last tile short), plus — the deterministic
    * non-vacuity augmentation, same pattern as pii_scrub — a boilerplate
    * footer line (one of 5 variants keyed on doc_id) appended to every
    * third document, so corpus-duplicated lines exist on the synthetic
    * fixture. Tokenization is [[TextOps.wsTokens]], the exact semantics the
    * oracle's `string_split_regex(trim(text), '\s+')` replays.
    */
  private[graft] def docLines(id: Long, text: String): Seq[(Long, Int, String)] = {
    val toks = TextOps.wsTokens(text)
    val nTiles = (toks.length + LineTokens - 1) / LineTokens
    val body = (0 until nTiles).map { i =>
      (id, i, toks.slice(i * LineTokens,
        math.min(toks.length, (i + 1) * LineTokens)).mkString(" "))
    }
    if (id % 3 == 0) body :+ ((id, nTiles, s"boilerplate footer variant ${id % 5}"))
    else body
  }

  /** line_dedup — corpus-wide duplicate-LINE removal, the C4 recipe: any
    * line occurring more than once across the whole corpus is kept only at
    * its FIRST occurrence (the (doc_id, line_no)-minimal one) and dropped
    * everywhere else — the filter that strips navigation chrome, cookie
    * banners and boilerplate footers that per-DOCUMENT dedup can never see.
    * Sits between [[Dedup]]'s document granularity and
    * `substring_scrub`'s token-run granularity: the unit is the line.
    *
    * Output per document: line count, kept-line count, and an md5 over the
    * kept lines' digests in line order (null when nothing survives) — the
    * cleaned document's identity without re-shipping its text.
    *
    * 100 TB plan: lines leave the scan as md5 DIGESTS (16 bytes, never raw
    * text — the dedup_exact principle); first-occurrence election is
    * `min(struct(doc_id, line_no))` per digest — ONE map-side-partial
    * shuffle on the digest, no sort, no window (a boilerplate line shared
    * by 10⁸ documents arrives at its reducer as one row per map partition,
    * not 10⁸ rows). The election output IS the kept-line set — (lmd5,
    * first.doc_id, first.line_no) enumerates exactly the lines that
    * survive — so the cleaned-document digest aggregates the ELECTION
    * frame, never the line stream: the first shape joined firsts back onto
    * every line and re-aggregated all of them per doc (two full sorts of
    * the corpus-scale stream — the collect_list fallback made the
    * reassembly the whole cost: 66 s at the sf100 decade probe where the
    * probe-staged components summed 18 s, see ProbeLine), while this one
    * touches the line stream once more only for the per-doc line COUNT, a
    * codegen'd map-side-partial count whose shuffle is |docs| rows. The
    * branches share one TransientCache'd scan.
    */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = graft.TransientCache.cache(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) => docLines(id, text) }
        .toDF("doc_id", "line_no", "line")
        .select(col("doc_id"), col("line_no"), md5(col("line")).as("lmd5")))
    val firsts = lines.groupBy("lmd5")
      .agg(min(struct(col("doc_id"), col("line_no"))).as("first"))
    val counts = lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    val kept = firsts
      .select(col("first.doc_id").as("doc_id"),
        col("first.line_no").as("line_no"), col("lmd5"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept_raw"),
        md5(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("line_no"), col("lmd5")))),
          x => x.getField("lmd5")))).as("kept_md5"))
    counts.join(kept, Seq("doc_id"), "left").select(
      col("doc_id"), col("n_lines"),
      coalesce(col("n_kept_raw"), lit(0L)).as("n_kept"),
      col("kept_md5"))
  }

  /** Span-corruption window length and masked prefix width for
    * [[spanCorrupt]]. `SpanPeriod` MUST be a power of two: the per-doc
    * phase is the low bits of an fnv64 hash, and only a power-of-two
    * modulus makes the signed-long bitmask equal the oracle's unsigned
    * HUGEINT mod (the lesson minhash_est_error taught about signed vs
    * unsigned hash arithmetic, applied at design time).
    */
  val SpanPeriod = 16
  val SpanLen = 2

  /** span_corrupt — T5/UL2-style span-corruption example construction, the
    * step that turns curated documents into denoising (input, target)
    * training pairs: deterministic non-overlapping spans of [[SpanLen]]
    * tokens are dropped from the input and replaced by sentinel tokens
    * (`<extra_id_N>`); the target lists each sentinel followed by the
    * tokens it hid. Span placement is a pure function of (doc_id,
    * position) — a hashed per-document PHASE rotates a fixed
    * [[SpanPeriod]]-token cycle whose first [[SpanLen]] offsets are
    * masked — so corruption is reproducible under retries and any
    * partitioning (the split_assign salted-coin discipline), needs no
    * sequential scan, and non-overlap holds by construction (one span per
    * cycle). Corruption rate = SpanLen/SpanPeriod (12.5% at the
    * defaults — the T5 ballpark).
    *
    * 100 TB: ONE scan, ZERO shuffles. Every output column is a pure
    * per-document function — phase from the doc_id hash, mask/start/span_id
    * from the position cycle, both strings assembled in position order — so
    * one typed JVM pass per row computes the whole answer. The first
    * formulation posexploded the corpus, ran a doc-keyed window sum for
    * span_id, and re-assembled position order with
    * `array_sort(collect_list(struct(pos, piece)))` — the ENTIRE token
    * stream through an exchange plus per-group sorts to recover an order
    * each document already had on the way in (the vocab_encode disease;
    * measured 113.6 s at sf100 for what the typed pass computes during the
    * scan). Tokenization is [[graft.operators.TextOps.wsTokens]] — the
    * exact `split(trim, "\s+")` semantics the DuckDB oracle replays.
    */
  def spanCorrupt(s: SparkSession, dir: String, period: Int = SpanPeriod,
      spanLen: Int = SpanLen): DataFrame = {
    require((period & (period - 1)) == 0, "period must be a power of two")
    require(spanLen > 0 && spanLen < period, "0 < spanLen < period")
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // null text produced no exploded rows, so the doc was absent from the
      // old grouped output — drop, don't NPE
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val ts = graft.operators.TextOps.wsTokens(text)
        val phase =
          (graft.functions.HashFunctions.fnv64("span:" + id) &
            (period - 1).toLong).toInt
        var nMasked = 0L
        var nSpans = 0L
        val in = new java.lang.StringBuilder
        val tg = new java.lang.StringBuilder
        var inFirst = true
        var tgFirst = true
        var i = 0
        while (i < ts.length) {
          val off = (i + phase) % period
          if (off < spanLen) {
            nMasked += 1
            // a doc can start mid-span: pos 0 opens its (truncated) span
            if (off == 0 || i == 0) {
              nSpans += 1
              val sentinel = "<extra_id_" + (nSpans - 1) + ">"
              if (inFirst) inFirst = false else in.append(' ')
              in.append(sentinel)
              if (tgFirst) tgFirst = false else tg.append(' ')
              tg.append(sentinel).append(' ').append(ts(i))
            } else {
              if (tgFirst) tgFirst = false else tg.append(' ')
              tg.append(ts(i))
            }
          } else {
            if (inFirst) inFirst = false else in.append(' ')
            in.append(ts(i))
          }
          i += 1
        }
        (id, ts.length.toLong, nMasked, nSpans, in.toString, tg.toString)
      }
      .toDF("doc_id", "n_tokens", "n_masked", "n_spans",
        "input_text", "target_text")
  }

  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), (col("doc_id") % 7).cast("string"),
      lit(".example.com from 10."), (col("doc_id") % 256).cast("string"),
      lit("."), (col("doc_id") % 100).cast("string"),
      lit("."), ((col("doc_id") * 7) % 256).cast("string"),
      lit(" tel "), (lit(5550000000L) + col("doc_id") * 13).cast("string"),
      when(col("doc_id") % 3 === 0, lit(" alt 192.168.1.77")).otherwise(lit("")))
    scrub(Tables.documents(s, dir).select(col("doc_id"), aug.as("aug")), col("aug"))
      .select("doc_id", "n_emails", "n_ips", "n_nums", "scrubbed")
  }
}
