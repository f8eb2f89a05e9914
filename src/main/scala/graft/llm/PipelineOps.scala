package graft.llm

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.11 (round 8 extension): the four training-data curation ops a
  * production pretraining pipeline runs AROUND the dedup/quality core —
  * benchmark decontamination, PII scrubbing, domain mixture weighting, and
  * int8 embedding quantization.
  *
  * Reference provenance: the reference repo (reference/README.md:1-2)
  * declares the BDMA capability surface but contains no code; these ops
  * extend SURVEY §2.11's normative inventory with the curation steps the
  * north-star contract (BASELINE.json:6 — "add the LLM-data-pipeline
  * operators … design every operator for 100 TB scale") names as
  * first-class.
  */
object PipelineOps extends OpRegistry {

  /** A doc is "benchmark/eval" iff doc_id % BenchMod == 0 — a deterministic
    * 2% held-out slice standing in for an external eval suite (the fixture
    * has no separate benchmark table). */
  private[graft] val BenchMod = 50

  /** Contamination threshold: flagged iff hit-ratio >= 0.2, tested in exact
    * integer arithmetic (5*hits >= shingles) so the flag can never diverge
    * cross-engine on a double boundary. */
  private[graft] def contaminatedFlag(nHit: Column, nSh: Column): Column =
    (nHit * lit(5L) >= nSh).cast("int")

  /** Decontamination kernel over a shingle frame (doc_id, h): overlap of
    * each train doc's shingle set against the union of benchmark shingles.
    * Exposed for the planted-corpus spec. */
  private[graft] def decontaminate(sh: DataFrame): DataFrame = {
    val bench = sh.filter(col("doc_id") % BenchMod === 0)
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    sh.filter(col("doc_id") % BenchMod =!= 0)
      // The benchmark n-gram universe is eval-suite-sized (thousands of
      // docs), orders of magnitude below the corpus: broadcast it and the
      // 100 TB train side is checked map-side with NO shuffle of the
      // corpus — the same shape GPT-3's 13-gram decontamination pass used
      // (Brown et al. 2020, appendix C; PAPERS.md). The broadcast contract
      // assumes a BOUNDED external benchmark table; this fixture's modular
      // stand-in (doc_id % 50) grows with the corpus instead, so at the
      // 100 TB design point the real deployment swaps in the actual eval
      // suite (fixed size) — broadcasting a corpus-fraction build side
      // would OOM the driver (ADVICE r8).
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
  }

  /** PII patterns, shared verbatim with the oracle SQL (RE2 ∩ java.util.regex
    * syntax only: character classes + quantifiers + groups, no backrefs/
    * lookaround). The email form is the general one — any dotted local part,
    * any domain with >= 1 dot (`user@example.com` AND `a@b.c.d.e` both
    * match; the round-8 pattern required exactly three domain labels and
    * silently under-matched 2-label addresses — verdict r8 #6). */
  private[graft] val EmailRe = "[a-z0-9.+_-]+@[a-z0-9-]+(\\.[a-z0-9-]+)+"

  /** NANP-ish phone: +C[C]-AAA-BBB[B] with 1-2 digit country code; matched
    * BEFORE the generic digit-run rule so a phone redacts as one `<phone>`
    * token, not three `<num>` fragments. */
  private[graft] val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"

  /** Portable 31-bit rolling hash over a string — the SAME char-fold +
    * constants as sketch_cms_topk's token hash (17, ×31, mod 2^31), so a
    * second engine replays it bit-for-bit with a list_reduce. Empty text
    * folds to the seed 17 on both engines: without the length guard,
    * `sequence(1, 0)` would infer step -1 and yield [1, 0] — two phantom
    * ascii("")=0 chars the oracle's empty `range(1, 1)` never folds
    * (ADVICE r8; Shingling.shingleArray guards the same footgun).
    *
    * Portability domain is ASCII text (the fixture's domain): Spark's
    * ascii() returns the first UTF-8 BYTE (signed — 'é' gives -61) while
    * a second engine's ord() returns the CODE POINT (233), so non-ASCII
    * input diverges cross-engine; consumers pmod the final bucket so the
    * [0, range) invariant survives even a negative byte fold (ADVICE r8;
    * same documented-domain convention as VectorOps' ord==byte caveat).
    *
    * NULL text propagates as NULL (ADVICE r9): the guard tests
    * `length == 0` and routes everything else — including NULL, whose
    * comparison is NULL and falls to otherwise — into `sequence(1, NULL)`
    * = NULL, exactly matching the oracle's `range`/`list_transform` NULL
    * propagation. The inverted (`length >= 1`) form silently hashed NULL
    * to the seed 17 while the oracle returned NULL. */
  private[graft] def rollingHash31(c: Column): Column =
    graft.functions.GraftExpressions.rollingHash31(c)

  /** The declarative HOF twin of [[RollingHash31]] — kept as the
    * bit-identity reference (PropertySpec compares the two on the
    * documented ASCII domain). Routing production call sites through it
    * was the dominant term of docs_split_leakage's 100× probe wall: every
    * char pays a substr position scan + ascii() + two interpreted lambda
    * calls, where the native expression is one codegen'd codepoint loop. */
  private[graft] def rollingHash31Hof(c: Column): Column =
    aggregate(
      transform(
        when(length(c) === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(1), length(c))),
        i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(17L),
      (acc, ch) => (acc * lit(31L) + ch) % lit(2147483648L))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "docs_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: fraction of each training doc's distinct
      // 3-token shingles that appear in ANY benchmark doc; flag docs at
      // >= 20% overlap. Shingles ride the shared hashed kernel
      // (Shingling.shingleArray — 8-byte keys, one tokenize pass); the
      // oracle replays string shingles, identical modulo the same
      // 2^-64-collision trade every minhash/jaccard op already makes.
      // Docs with <3 tokens have no shingles and are (on both sides)
      // absent from the report — nothing to decontaminate against.
      implicit val sp: SparkSession = s
      val docs = tWide(s, dir)("documents")
      val sh = docs.select(col("doc_id"),
        explode(Shingling.shingleArray(col("text"), hashed = true)).as("h"))
      decontaminate(sh)
        .select(col("doc_id"), col("n_shingles"), col("n_hit"),
          r6(col("n_hit").cast("double") / col("n_shingles")).as("ratio"),
          contaminatedFlag(col("n_hit"), col("n_shingles")).as("contaminated"))
        .orderBy("doc_id")
    }),

    "text_pii_scrub" -> ((s, dir) => {
      // PII redaction: the fixture corpus is synthetic word-soup with no
      // real PII, so each doc is first augmented with a deterministic
      // contact line (2-label email + phone + numeric ref, all derived
      // from doc_id — identical string concat in both engines), then
      // scrubbed in precedence order: emails → <email>, phones → <phone>,
      // remaining digit runs → <num> (a phone must redact as ONE token,
      // so it is matched before the generic digit rule). Reports
      // redaction counts + before/after lengths + a scrubbed prefix, so
      // the oracle certifies the actual redacted text, not just counts.
      // Pure per-row map work — scales embarrassingly; tWide spreads the
      // single-file fixture scan.
      val docs = tWide(s, dir)("documents")
      val aug = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com tel +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ref "), col("doc_id") * 7 + 13)
      docs.select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("n_phones"),
          length(col("t")).as("len_raw"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("t"), EmailRe, "<email>"),
              PhoneRe, "<phone>"),
            "[0-9]+", "<num>").as("scrubbed"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"), col("len_raw"),
          length(col("scrubbed")).as("len_scrubbed"),
          substring(col("scrubbed"), 1, 40).as("head"))
        .orderBy("doc_id")
    }),

    "docs_domain_mix" -> ((s, dir) => {
      // Domain mixture weights: per-source sampling weight ∝ sqrt(n_docs)
      // (temperature-smoothed multinomial, the α<1 reweighting
      // GPT-3/Llama-style pipelines apply so head domains don't drown the
      // tail). Determinism: sqrt is IEEE-exactly-rounded in every engine,
      // each weight is quantized to integer micro-units BEFORE the
      // normalizing sum, and the ppm share is integer division — no
      // double accumulation anywhere, so no ordering sensitivity. The
      // full-frame window runs on the DOMAIN dimension, which is tiny by
      // construction (20 sources here; O(100s) in any real corpus) — the
      // single-partition window is a few-row job at any corpus scale,
      // while the groupBy below it is the only fact-sized pass.
      val docs = t(s, dir)("documents")
      val byS = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val wq = floor(sqrt(col("n_docs").cast("double")) * lit(1e6) + lit(0.5))
        .cast("long")
      byS.withColumn("w_q", wq)
        .withColumn("w_total", sum(col("w_q")).over(Window.partitionBy()))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          call_function("div", col("w_q") * lit(1000000L), col("w_total"))
            .as("mix_ppm"))
        .orderBy("source")
    }),

    "docs_mixture_epoch_plan" -> ((s, dir) => {
      // Data-mixing EPOCH plan — docs_domain_mix gives the target shares;
      // this op turns them into the actionable table: per source, how many
      // epochs (repeats) of that source the training run makes when the
      // total token budget is one pass over the corpus re-balanced to
      // sqrt-temperature shares (epochs > 1 ⇒ the source is upsampled /
      // repeated, < 1 ⇒ downsampled — the Llama-style mixture sheet).
      // Weights are TOKEN-based here (budgets are spent in tokens, not
      // docs): w ∝ sqrt(tokens), quantized to integer MILLI-units before
      // the normalizing sum (milli, not micro: w_q ≤ 1e10 at 1e14 corpus
      // tokens keeps w_q·1e6 inside BIGINT where micro-units would
      // overflow) — no double accumulation, no ordering sensitivity.
      // epochs6 = share · total ÷ tokens as ONE fixed left-assoc IEEE
      // double sequence from exact integers (the text_readability
      // discipline), r6 display. Source dimension is tiny by construction;
      // the groupBy is the only fact-sized pass.
      val byS = t(s, dir)("documents").groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      val wq = floor(sqrt(col("tokens").cast("double")) * lit(1e3) + lit(0.5))
        .cast("long")
      byS.withColumn("w_q", wq)
        .withColumn("w_total", sum(col("w_q")).over(Window.partitionBy()))
        .withColumn("total_tokens", sum(col("tokens")).over(Window.partitionBy()))
        .select(col("source"), col("n_docs"), col("tokens"),
          call_function("div", col("w_q") * lit(1000000L), col("w_total"))
            .as("share_ppm"),
          r6(col("w_q").cast("double") / col("w_total") * col("total_tokens")
            / col("tokens")).as("epochs6"))
        .orderBy("source")
    }),

    "docs_lm_quality_filter" -> ((s, dir) => {
      // LM-based quality filtering (the CCNet shape): score every doc by
      // its average bigram negative-log-likelihood under the corpus' own
      // per-lang char-bigram LM, flag docs above their language's mean —
      // high-perplexity docs are the boilerplate/garbage a pretraining
      // pipeline drops. Trains on ALL bigram occurrences (the docs_char_lm
      // statistic), scores every occurrence.
      //
      // Determinism: ln() is applied once per (lang, bigram) LM ENTRY
      // (charset²-bounded, ~2k values — not per occurrence) and quantized
      // to micro-unit longs immediately; per-doc totals and the per-lang
      // mean are then pure integer sums/divisions — no double
      // accumulation, so no ordering sensitivity. Residual risk (ADVICE
      // r8 #5): ln() itself is NOT correctly rounded by IEEE — a libm
      // difference of 1 ULP at an exact .5 micro-nat boundary could flip
      // one LM entry's nll_q and cascade into a flipped `flagged` bit.
      // Accepted as the same cross-engine-libm caveat the other
      // transcendental ops document; unobserved on the fixture (JVM
      // StrictMath and DuckDB both delegate to fdlibm-compatible ln for
      // these magnitudes). Scale: the LM is
      // charset²×langs rows at ANY corpus size → MODEL state: it collects
      // to the driver (like the k-means centroids) and scoring is pure
      // map-side — the native LmNllSum expression folds each doc's NLL sum
      // into the scan against the in-memory LM, so no occurrence-sized row
      // stream ever exists. The previous shape (explode → broadcast-hash-
      // join → groupBy(doc_id)) was the measured 21.7×-at-100× growth
      // term of the r10 scale probe: profiling showed the join stage
      // materializing 198M (doc_id, lang, bg, nll_q) rows cost ~25 s
      // (codegen on or off) just to sum them back down to one row per doc,
      // while the LM-training aggregation over the same explode cost 6 s.
      // Training still explodes once — its shuffles are vocab-sized and
      // partial-aggregated.
      val perDoc = lmAvgNll(s, dir)
      // Per-lang mean via a lang-sized agg + broadcast join back, NOT a
      // Window.partitionBy(lang): the window funnels the whole per-doc
      // frame into |langs| partitions (5 here) and sorts each one on a
      // single core — the measured 13.7×-at-100× growth term of the r8/r9
      // scale probe. The agg partial-reduces map-side to |langs| rows and
      // the join back is a broadcast of those |langs| rows — every stage
      // stays parallel at any corpus size; integer mean unchanged.
      val langMean = perDoc.groupBy("lang")
        .agg(call_function("div", sum(col("avg_nll_micro")), count(lit(1)))
          .as("lang_mean_micro"))
      perDoc.join(broadcast(langMean), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_nll_micro"),
          (col("avg_nll_micro") > col("lang_mean_micro")).cast("int").as("flagged"))
        .orderBy("doc_id")
    }),

    "docs_nll_histogram" -> ((s, dir) => {
      // Perplexity histogram (round 11): the corpus-QA plot behind every
      // CCNet-style quality cut — per lang, doc counts in half-nat
      // avg-NLL buckets (bucket = avg_nll_micro div 500000) with exact
      // ppm shares. Shows WHERE the docs_lm_quality_filter mean cut
      // lands and whether the distribution is bimodal (clean text vs
      // boilerplate) before committing to a threshold. Consumes the
      // landed per-doc NLL score artifact shared with the filter; after
      // it, two bounded aggs (buckets ≤ maxNll/0.5 nats per lang).
      val perDoc = lmAvgNll(s, dir)
        .withColumn("bucket", call_function("div", col("avg_nll_micro"),
          lit(500000L)))
      val hist = perDoc.groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"))
      val tot = perDoc.groupBy("lang").agg(count(lit(1)).as("lang_docs"))
      hist.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("bucket"),
          (col("bucket") * 500000L).as("lo_micro_nats"), col("n_docs"),
          call_function("div", col("n_docs") * lit(1000000L), col("lang_docs"))
            .as("share_ppm"))
        .orderBy("lang", "bucket")
    }),

    "docs_split_assign" -> ((s, dir) => {
      // Deterministic train/val/test split (80/10/10) by CONTENT hash, not
      // row order or id — the assignment every ML pipeline needs to be
      // stable across re-ingestion, partitioning, and engine. Bucket =
      // rollingHash31(text) pmod 100: the same seedless portable char-fold
      // sketch_cms_topk uses, replayable bit-for-bit in any engine on
      // ASCII text (see rollingHash31's domain note; xxhash64 seeds and
      // md5-hex parsing are not replayable at all). pmod (not %) pins the
      // bucket∈[0,100) invariant even if a non-ASCII byte drives the fold
      // negative — a negative % would silently class as 'train'
      // (ADVICE r8); the oracle SQL mirrors the same ((h%100)+100)%100
      // clamp so both engines pin bucket∈[0,100) outside the documented
      // ASCII domain too (ADVICE r9). Pure map work.
      val bucket = pmod(rollingHash31(col("text")), lit(100L)).cast("int")
      tWide(s, dir)("documents")
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, lit("train"))
            .when(col("bucket") < 90, lit("val"))
            .otherwise(lit("test")))
        .orderBy("doc_id")
    }),

    "docs_epoch_shuffle_plan" -> ((s, dir) => {
      // Reproducible multi-epoch shuffle plan (r15): the data order a
      // training loader must replay EXACTLY across restarts, engines,
      // and partitioning — order key for epoch e = the portable char
      // fold of "e<e>:<doc_id>" (seedless, content-free, so the plan is
      // a pure function of ids — re-ingesting the corpus cannot reorder
      // an epoch). The FULL order is data-sized by design (it IS the
      // plan and ships as a sort key, never materialized on a driver);
      // the op certifies it by emitting each epoch's first 5 positions
      // + per-epoch doc count. The head-of-order pick is the salted
      // two-level top-k (docs_topk_quality_per_lang's r15 kernel):
      // local rank over (epoch, salt) — 3×64 balanced groups — then the
      // final window on the ≤ 3×64×5-row survivor frame only.
      val docs = tWide(s, dir)("documents").select(col("doc_id"))
      val keyed = docs
        .crossJoin(broadcast(
          s.range(3).select(col("id").cast("int").as("epoch"))))
        // the raw char fold does not wrap on short keys ("e0:3" folds to
        // ~1.5e7 — lexicographic, every epoch would order identically);
        // one Carter-Wegman step ((a·h+b) mod 2^31−1, the DedupOps
        // portable constants) wraps ~2e7 times and mixes epochs apart
        .withColumn("h",
          (rollingHash31(concat(lit("e"), col("epoch"), lit(":"),
            col("doc_id").cast("string"))) * lit(2654435761L) + lit(97L))
            % lit(2147483647L))
        .withColumn("salt", pmod(col("doc_id"), lit(64L)))
      val wLocal = Window.partitionBy("epoch", "salt")
        .orderBy(col("h"), col("doc_id"))
      val w = Window.partitionBy("epoch").orderBy(col("h"), col("doc_id"))
      val head = keyed
        .withColumn("lrk", row_number().over(wLocal)).filter(col("lrk") <= 5)
        .withColumn("pos", row_number().over(w)).filter(col("pos") <= 5)
        .select(col("epoch"), col("pos"), col("doc_id"), col("h"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      head.crossJoin(broadcast(n)).orderBy("epoch", "pos")
    }),

    "docs_quality_percentile_gate" -> ((s, dir) => {
      // Per-language quality gate at a PERCENTILE, not a fixed threshold
      // (the CCNet head/middle/tail shape): drop each language's bottom
      // quartile by stopword-ppm score. The threshold comes from a
      // HISTOGRAM cumulative sum — groupBy(lang, score) partial-aggregates
      // map-side to at most |distinct scores| rows per language, and the
      // per-lang window sort runs over that histogram, never over docs.
      // A Window.partitionBy(lang) over the doc frame would funnel the
      // whole corpus into |langs| single-core sorts — the measured
      // 13.7×-at-100× antipattern docs_lm_quality_filter documents — while
      // this plan's only doc-sized stages are one scan and one broadcast
      // join against the |langs|-row threshold table. Score and threshold
      // are integer ppm; the cut cum*4 >= n is exact integer arithmetic
      // (threshold = smallest score whose cumulative count reaches
      // ceil(n/4)), so no float-percentile interpolation dialect risk.
      val toks = split(col("text"), " ")
      val scorePpm = call_function("div",
        size(filter(toks, x => x.isin(TextOps.StopWords: _*))).cast("long")
          * lit(1000000L),
        size(toks).cast("long"))
      val scored = tWide(s, dir)("documents")
        .select(col("doc_id"), col("lang"), scorePpm.as("score_ppm"))
      val hist = scored.groupBy("lang", "score_ppm").agg(count(lit(1)).as("c"))
      val cumW = Window.partitionBy("lang").orderBy("score_ppm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = hist
        .withColumn("cum", sum("c").over(cumW))
        .withColumn("n", sum("c").over(Window.partitionBy("lang")))
        .filter(col("cum") * 4 >= col("n"))
        .groupBy("lang").agg(min("score_ppm").as("thr_ppm"))
      scored.join(broadcast(thr), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("score_ppm"), col("thr_ppm"),
          (col("score_ppm") >= col("thr_ppm")).cast("int").as("kept"))
        .orderBy("doc_id")
    }),

    "docs_temperature_resample" -> ((s, dir) => {
      // Temperature resampling — the operational counterpart of
      // docs_domain_mix's weights: allocate a token budget (half the
      // corpus) across sources ∝ sqrt(source tokens) (α=0.5 smoothing;
      // sqrt because it is IEEE-exactly-rounded in every engine, unlike
      // pow), convert each source's allocation to an integer keep-rate in
      // ppm, then gate individual docs on their CONTENT hash so the sample
      // is stable across re-ingestion, partitioning, and engine — the same
      // rollingHash31 determinism contract as docs_split_assign (ASCII
      // domain; pmod pins h∈[0,1e6) regardless). Output is the per-source
      // audit row: rates plus kept doc/token counts and a doc_id checksum
      // certifying the exact kept set. Scale: one doc-sized scan +
      // groupBy(source) with map-side partials; the window normalization
      // runs on the |sources|-row frame (same tiny-dimension justification
      // as docs_domain_mix) and joins back as a broadcast. All rate math
      // is integer (overflow domain: corpora under ~9e12 tokens keep
      // tgt*1e6 inside int64 — beyond that the ppm scaling moves to
      // DECIMAL(38,0), same documented-domain convention as the ASCII
      // hash fold).
      val perDoc = tWide(s, dir)("documents").select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        pmod(rollingHash31(col("text")), lit(1000000L)).as("h_ppm"))
      val byS = perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      val wq = floor(sqrt(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5))
        .cast("long")
      val tgt = call_function("div",
        call_function("div", col("tok_total"), lit(2L)) * col("w_q"),
        col("w_total"))
      val rates = byS.withColumn("w_q", wq)
        .withColumn("w_total", sum("w_q").over(Window.partitionBy()))
        .withColumn("tok_total", sum("n_tokens").over(Window.partitionBy()))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          least(lit(1000000L),
            call_function("div", tgt * lit(1000000L), col("n_tokens")))
            .as("keep_ppm"))
      val gated = perDoc
        .join(broadcast(rates.select("source", "keep_ppm")), Seq("source"))
        .withColumn("k", (col("h_ppm") < col("keep_ppm")).cast("long"))
        .groupBy("source").agg(
          sum("k").as("n_kept"),
          sum(col("k") * col("n_tok")).as("kept_tokens"),
          sum(col("k") * col("doc_id")).as("kept_id_sum"))
      rates.join(gated, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("keep_ppm"),
          col("n_kept"), col("kept_tokens"), col("kept_id_sum"))
        .orderBy("source")
    }),

    "vec_int8_quantize" -> ((s, dir) => {
      // Symmetric int8 quantization of the embedding column (scale =
      // max|x|/127 per vector, the faiss/SQ8 storage shape that cuts
      // vector storage 4× at 100 TB) + per-label reconstruction error.
      // All per-element math is straight-line IEEE double arithmetic
      // written identically in the oracle; per-element squared errors are
      // quantized to integer picounits and summed as longs (exact,
      // order-independent — the same no-double-accumulation rule as
      // docs_domain_mix). aggregate() folds the array in one codegen'd
      // pass per row; the only shuffle is the tiny per-label agg.
      // Zero-vector guard (ADVICE r8): scale = max|x| = 0 makes x/scale
      // NaN, which Spark's floor coerces to 0 while another engine's
      // BIGINT cast errors — so an all-zero embedding short-circuits to
      // err_q = 0 on BOTH sides (code 0 / error 0 is also the
      // mathematically right SQ8 answer for the zero vector).
      val e = tWide(s, dir)("embeddings")
      val scale = array_max(transform(col("embedding"), v => abs(v.cast("double"))))
      val withS = e.select(col("vec_id"), col("label"), col("embedding"),
        scale.as("scale"))
      val errQ = when(col("scale") > 0, aggregate(col("embedding"), lit(0L), (acc, v) => {
        val x = v.cast("double")
        val code = floor(x / col("scale") * lit(127.0) + lit(0.5))
        val deq = code * col("scale") / lit(127.0)
        acc + floor((x - deq) * (x - deq) * lit(1e12) + lit(0.5))
      })).otherwise(lit(0L))
      withS
        .select(col("label"),
          floor(col("scale") * lit(1e6) + lit(0.5)).cast("long").as("scale_q"),
          errQ.as("err_q"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("err_q")).as("sum_err_p12"),
          sum(col("scale_q")).as("sum_scale_micro"))
        .select(col("label"), col("n_vecs"),
          call_function("div", col("sum_err_p12"), col("n_vecs")).as("avg_err_p12"),
          call_function("div", col("sum_scale_micro"), col("n_vecs")).as("avg_scale_micro"))
        .orderBy("label")
    }),

    "docs_split_leakage" -> ((s, dir) => {
      // Split-leakage QA gate: near-duplicate pairs (exact Jaccard > 0.1
      // on the df-capped shingle universe — the SAME kernel jaccard_pairs
      // oracles) that cross the content-hash train/val/test boundary. A
      // cross-split near-dup is evaluation leakage: the test doc's twin
      // was trained on. The split rule is docs_split_assign's verbatim
      // (rollingHash31 pmod 100 → 80/10/10), so the two ops stay
      // consistent by construction. Output is the ≤ 3×3 (split_a ≤
      // split_b) cell matrix with a leak flag — the candidate pass comes
      // from the session-landed artifact (TextOps.candidatePairs, VERDICT
      // r10 #2) instead of a private re-run; everything after the edge
      // join is pair-count-sized.
      val bucket = pmod(rollingHash31(col("text")), lit(100L))
      val splits = tWide(s, dir)("documents").select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      TextOps.candidatePairs(s, dir)
        .join(splits.select(col("doc_id").as("id1"), col("split").as("s1")),
          Seq("id1"))
        .join(splits.select(col("doc_id").as("id2"), col("split").as("s2")),
          Seq("id2"))
        .select(least(col("s1"), col("s2")).as("split_a"),
          greatest(col("s1"), col("s2")).as("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("is_leak", (col("split_a") =!= col("split_b")).cast("int"))
        .orderBy("split_a", "split_b")
    }),

    "docs_token_budget_fill" -> ((s, dir) => {
      // Token-budget mix construction (round 11): greedily fill each
      // language's training budget (20k tokens) with its highest-quality
      // documents — the "give me the best N-billion tokens per domain"
      // step that sits between quality scoring and docs_pack_greedy.
      // Quality is the engine's shared integer score
      // (docs_topk_quality_per_lang's, dialect-proof by construction).
      // The exact greedy prefix needs a per-lang ordered cumsum, and a
      // doc-sized Window.partitionBy(lang) is the measured antipattern
      // the percentile gate documents — so a HISTOGRAM pre-cut runs
      // first: per (lang, quality) token masses, cumulated over the
      // vocabulary-sized histogram, find the lowest quality level that
      // can still contribute to the budget; only docs at or above that
      // level (≈ budget-sized token mass, one level of slack) enter the
      // exact window. Docs below the cut are provably outside the prefix
      // (they sort after every candidate), so the result is identical to
      // the naive full-corpus cumsum the oracle runs.
      val budget = 20000L
      val toks = split(col("text"), " ")
      val scored = tWide(s, dir)("documents").select(
        col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks).cast("long") * 10
          - size(filter(toks, x => x.isin(TextOps.StopWords: _*))).cast("long") * 5
          - length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long"))
          .as("quality"))
      val hist = scored.groupBy("lang", "quality")
        .agg(sum("n_tokens").as("tok"))
      val cumW = Window.partitionBy("lang").orderBy(col("quality").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cut = hist
        .withColumn("above", sum("tok").over(cumW) - col("tok"))
        .filter(col("above") < budget)
        .groupBy("lang").agg(min("quality").as("q_min"))
      val w = Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))
      scored.join(broadcast(cut), Seq("lang"))
        .filter(col("quality") >= col("q_min"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") <= budget)
        .select(col("lang"), col("doc_id"), col("quality"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("lang", "cum_tokens", "doc_id")
    }),

    "docs_signal_corr" -> ((s, dir) => {
      // Signal-redundancy QA (round 11): per-lang Pearson correlations
      // between the three cheap per-doc signals every curation gate
      // filters on (token count, distinct-token count, char length) —
      // near-1 correlation means a gate on one signal silently subsumes
      // the other, the thing to know before stacking filters. Same
      // distributed-stats shape as agg_corr_covar: exact integer moment
      // sums (BIGINT products, DECIMAL(38,0) sums — overflow-proof at any
      // corpus size), double arithmetic once per group on the exact
      // scalars; one partial+final hash agg, no extra shuffle.
      import org.apache.spark.sql.types.DecimalType
      val d = DecimalType(38, 0)
      val toks = split(col("text"), " ")
      val sig = tWide(s, dir)("documents").select(col("lang"),
        size(toks).cast("long").as("x"),
        size(array_distinct(toks)).cast("long").as("y"),
        col("n_chars").as("z"))
      val g = sig.groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("x").cast(d)).cast("double").as("sx"),
        sum(col("y").cast(d)).cast("double").as("sy"),
        sum(col("z").cast(d)).cast("double").as("sz"),
        sum((col("x") * col("x")).cast(d)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(d)).cast("double").as("syy"),
        sum((col("z") * col("z")).cast(d)).cast("double").as("szz"),
        sum((col("x") * col("y")).cast(d)).cast("double").as("sxy"),
        sum((col("x") * col("z")).cast(d)).cast("double").as("sxz"),
        sum((col("y") * col("z")).cast(d)).cast("double").as("syz"))
      val nD = col("n").cast("double")
      def corr6(sa: Column, sb: Column, saa: Column, sbb: Column,
                sab: Column): Column =
        r6((nD * sab - sa * sb) /
          sqrt((nD * saa - sa * sa) * (nD * sbb - sb * sb)))
      g.select(col("lang"), col("n"),
          corr6(col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
            .as("corr_tok_distinct6"),
          corr6(col("sx"), col("sz"), col("sxx"), col("szz"), col("sxz"))
            .as("corr_tok_chars6"),
          corr6(col("sy"), col("sz"), col("syy"), col("szz"), col("syz"))
            .as("corr_distinct_chars6"))
        .orderBy("lang")
    }),
    "docs_pii_rate_by_source" -> ((s, dir) => {
      // PII incidence QA matrix — the redaction-pipeline MONITOR beside
      // text_pii_scrub's redactor: per source, how many docs carry an
      // email / phone and the combined integer-ppm rate. A source whose
      // rate jumps is a new crawl seed leaking contact pages; the gate
      // reads this table, the scrubber fixes the docs. The fixture corpus
      // is synthetic word-soup with zero real PII, so docs are augmented
      // the text_pii_scrub way but SPARSELY (doc_id % 7 == 0 gains the
      // email line, doc_id % 11 == 0 the phone) — per-source rates then
      // differ and the detector's selectivity is actually exercised.
      // Shares EmailRe/PhoneRe verbatim so monitor and scrubber can never
      // drift. Map-side flags + one source-bounded agg; scan-shaped.
      val d = tWide(s, dir)("documents")
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" tel +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      d.select(col("source"), aug.as("t"))
        .select(col("source"),
          (size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))) > 0)
            .cast("long").as("has_email"),
          (size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))) > 0)
            .cast("long").as("has_phone"))
        .withColumn("has_any", greatest(col("has_email"), col("has_phone")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("has_email")).as("docs_email"),
          sum(col("has_phone")).as("docs_phone"),
          sum(col("has_any")).as("docs_any"))
        .select(col("source"), col("n_docs"), col("docs_email"),
          col("docs_phone"), col("docs_any"),
          call_function("div", col("docs_any") * lit(1000000L), col("n_docs"))
            .as("pii_ppm"))
        .orderBy("source")
    }),

    "docs_license_filter" -> ((s, dir) => {
      // License/copyright screen — the legal gate a pretraining corpus
      // runs beside the PII monitor (docs carrying explicit copyright
      // notices or restrictive license strings get routed to review, not
      // training): per source, docs matching a copyright notice or a
      // license declaration, and the combined integer-ppm rate. The
      // fixture word-soup carries neither, so docs are augmented the
      // docs_pii_rate_by_source way, SPARSELY and deterministically
      // (doc_id % 13 == 0 gains a copyright line, % 17 == 0 a license
      // declaration) — rates differ per source and both detectors'
      // selectivity is exercised. Map-side flags + one source-bounded
      // agg; scan-shaped at any corpus size.
      val d = tWide(s, dir)("documents")
      val aug = concat(col("text"),
        when(col("doc_id") % 13 === 0,
          concat(lit(" copyright (c) 19"), (col("doc_id") % 100).cast("string"),
            lit(" acme corp all rights reserved"))).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit(" licensed under the apache license version 2.0"))
          .otherwise(lit("")))
      d.select(col("source"), aug.as("t"))
        .select(col("source"),
          (size(regexp_extract_all(col("t"),
            lit("copyright \\(c\\) [0-9]+|all rights reserved"), lit(0))) > 0)
            .cast("long").as("has_copyright"),
          (size(regexp_extract_all(col("t"),
            lit("licensed under|license version [0-9.]+"), lit(0))) > 0)
            .cast("long").as("has_license"))
        .withColumn("has_any", greatest(col("has_copyright"), col("has_license")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("has_copyright")).as("docs_copyright"),
          sum(col("has_license")).as("docs_license"),
          sum(col("has_any")).as("docs_flagged"))
        .select(col("source"), col("n_docs"), col("docs_copyright"),
          col("docs_license"), col("docs_flagged"),
          call_function("div", col("docs_flagged") * lit(1000000L),
            col("n_docs")).as("flagged_ppm"))
        .orderBy("source")
    }),
  )

  /** Per-doc average bigram NLL under the corpus' own per-lang char-bigram
    * LM — the scoring half of docs_lm_quality_filter, landed once per
    * corpus ([[graft.CorpusArtifacts]], kind "nllscores") and shared with
    * docs_nll_histogram. Training explodes once (vocab-sized shuffles);
    * the LM is charset²×langs MODEL state collected to the driver; scoring
    * is map-side via the native LmNllSum fold (no occurrence-sized row
    * stream — the r10 fix). n_bigrams >= 1 drops empty/NULL-text docs,
    * row-for-row the old join+groupBy semantics. */
  private[graft] def lmAvgNll(s: SparkSession, dir: String): DataFrame =
    graft.CorpusArtifacts.parquet(s, "nllscores", dir) {
      val bg = tWide(s, dir)("documents").select(col("doc_id"), col("lang"),
        explode(Shingling.charBigramArray(col("text"))).as("bg"))
      val cnt2 = bg.groupBy("lang", "bg").agg(count(lit(1)).as("c2"))
      val cnt1 = cnt2.groupBy(col("lang"), substring(col("bg"), 1, 1).as("c1"))
        .agg(sum(col("c2")).as("c1cnt"))
      // cnt1 derives from cnt2 → alias both sides of the self-join lineage
      val lm = cnt2.as("n2").join(cnt1.as("n1"),
          col("n2.lang") === col("n1.lang")
            && substring(col("n2.bg"), 1, 1) === col("n1.c1"))
        .select(col("n2.lang").as("lang"), col("n2.bg").as("bg"),
          floor(log(col("n1.c1cnt").cast("double") / col("n2.c2")) * lit(1e6)
            + lit(0.5)).cast("long").as("nll_q"))
      // bounded model-state collect: charset²×langs rows (651 on the 100×
      // probe corpus), never data-sized
      val lmMap = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]]()
      lm.collect().foreach { r =>
        val langK = org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))
        var inner = lmMap.get(langK)
        if (inner == null) {
          inner = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
          lmMap.put(langK, inner)
        }
        inner.put(org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
          java.lang.Long.valueOf(r.getLong(2)))
      }
      tWide(s, dir)("documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.GraftExpressions.lmNllSum(col("lang"),
            Shingling.charBigramArray(col("text")), lmMap).as("ns"))
        .select(col("doc_id"), col("lang"),
          element_at(col("ns"), 1).as("n_bigrams"),
          element_at(col("ns"), 2).as("sum_nll"))
        .filter(col("n_bigrams") >= 1)
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          call_function("div", col("sum_nll"), col("n_bigrams")).as("avg_nll_micro"))
    }

  /** DuckDB replay of the per-doc NLL scoring (train the per-lang bigram
    * LM + score every doc), shared by the docs_lm_quality_filter and
    * docs_nll_histogram oracles. Splice after WITH; exposes `perdoc`. */
  private val NllCteSql = """
      bg AS (SELECT doc_id, lang, substring(text, i, 2) AS bg
                  FROM (SELECT doc_id, lang, text, unnest(range(1, length(text))) AS i
                        FROM documents WHERE length(text) >= 2)),
      cnt2 AS (SELECT lang, bg, COUNT(1) AS c2 FROM bg GROUP BY lang, bg),
      cnt1 AS (SELECT lang, substring(bg, 1, 1) AS c1,
                      CAST(SUM(c2) AS BIGINT) AS c1cnt
               FROM cnt2 GROUP BY 1, 2),
      lm AS (SELECT cnt2.lang, cnt2.bg,
                    CAST(floor(ln(CAST(cnt1.c1cnt AS DOUBLE) / cnt2.c2) * 1000000
                             + 0.5) AS BIGINT) AS nll_q
             FROM cnt2 JOIN cnt1
               ON cnt2.lang = cnt1.lang AND substring(cnt2.bg, 1, 1) = cnt1.c1),
      perdoc AS (SELECT bg.doc_id, bg.lang, COUNT(1) AS n_bigrams,
                        CAST(SUM(lm.nll_q) AS BIGINT)
                          // COUNT(1) AS avg_nll_micro
                 FROM bg JOIN lm ON bg.lang = lm.lang AND bg.bg = lm.bg
                 GROUP BY bg.doc_id, bg.lang)"""

  def oracleSql: Map[String, String] = Map(
    "docs_pii_rate_by_source" -> """
      WITH aug AS (SELECT source,
             concat(text,
               CASE WHEN doc_id % 7 = 0
                    THEN concat(' contact user', doc_id, '@example.com')
                    ELSE '' END,
               CASE WHEN doc_id % 11 = 0
                    THEN concat(' tel +1-555-',
                                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                    ELSE '' END) AS t
           FROM documents),
      f AS (SELECT source,
             CASE WHEN len(regexp_extract_all(t,
               '[a-z0-9.+_-]+@[a-z0-9-]+(\.[a-z0-9-]+)+', 0)) > 0
               THEN 1 ELSE 0 END AS has_email,
             CASE WHEN len(regexp_extract_all(t,
               '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', 0)) > 0
               THEN 1 ELSE 0 END AS has_phone
           FROM aug)
      SELECT source, COUNT(1) AS n_docs,
             CAST(SUM(has_email) AS BIGINT) AS docs_email,
             CAST(SUM(has_phone) AS BIGINT) AS docs_phone,
             CAST(SUM(GREATEST(has_email, has_phone)) AS BIGINT) AS docs_any,
             CAST(SUM(GREATEST(has_email, has_phone)) * 1000000 // COUNT(1)
                  AS BIGINT) AS pii_ppm
      FROM f GROUP BY source ORDER BY source""",
    "docs_license_filter" -> """
      WITH aug AS (SELECT source,
             concat(text,
               CASE WHEN doc_id % 13 = 0
                    THEN concat(' copyright (c) 19',
                                CAST(doc_id % 100 AS VARCHAR),
                                ' acme corp all rights reserved')
                    ELSE '' END,
               CASE WHEN doc_id % 17 = 0
                    THEN ' licensed under the apache license version 2.0'
                    ELSE '' END) AS t
           FROM documents),
      f AS (SELECT source,
             CASE WHEN len(regexp_extract_all(t,
               'copyright \(c\) [0-9]+|all rights reserved', 0)) > 0
               THEN 1 ELSE 0 END AS has_copyright,
             CASE WHEN len(regexp_extract_all(t,
               'licensed under|license version [0-9.]+', 0)) > 0
               THEN 1 ELSE 0 END AS has_license
           FROM aug)
      SELECT source, COUNT(1) AS n_docs,
             CAST(SUM(has_copyright) AS BIGINT) AS docs_copyright,
             CAST(SUM(has_license) AS BIGINT) AS docs_license,
             CAST(SUM(GREATEST(has_copyright, has_license)) AS BIGINT)
               AS docs_flagged,
             CAST(SUM(GREATEST(has_copyright, has_license)) * 1000000 // COUNT(1)
                  AS BIGINT) AS flagged_ppm
      FROM f GROUP BY source ORDER BY source""",
    "docs_signal_corr" -> s"""
      WITH m AS (SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y,
                   n_chars AS z
                 FROM documents),
      g AS (SELECT lang, COUNT(1) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(z) AS DOUBLE) AS sz,
                   CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
                   CAST(SUM(z*z) AS DOUBLE) AS szz,
                   CAST(SUM(x*y) AS DOUBLE) AS sxy, CAST(SUM(x*z) AS DOUBLE) AS sxz,
                   CAST(SUM(y*z) AS DOUBLE) AS syz
            FROM m GROUP BY lang)
      SELECT lang, n,
             ${r6Sql("(n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))")} AS corr_tok_distinct6,
             ${r6Sql("(n*sxz - sx*sz) / sqrt((n*sxx - sx*sx) * (n*szz - sz*sz))")} AS corr_tok_chars6,
             ${r6Sql("(n*syz - sy*sz) / sqrt((n*syy - sy*sy) * (n*szz - sz*sz))")} AS corr_distinct_chars6
      FROM g ORDER BY lang""",
    "docs_decontaminate" -> s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM tok)),
      sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % $BenchMod = 0),
      agg AS (SELECT t.doc_id, COUNT(1) AS n_shingles,
                     CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hit
              FROM (SELECT doc_id, shingle FROM sh WHERE doc_id % $BenchMod <> 0) t
                LEFT JOIN bench b ON t.shingle = b.shingle
              GROUP BY t.doc_id)
      SELECT doc_id, n_shingles, n_hit,
             ${r6Sql("CAST(n_hit AS DOUBLE) / n_shingles")} AS ratio,
             CAST(n_hit * 5 >= n_shingles AS INT) AS contaminated
      FROM agg ORDER BY doc_id""",

    "text_pii_scrub" -> """
      WITH aug AS (SELECT doc_id,
             concat(text, ' contact user', doc_id, '@example.com tel +1-555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    ' ref ', doc_id * 7 + 13) AS t
           FROM documents),
      scrub AS (SELECT doc_id, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[a-z0-9.+_-]+@[a-z0-9-]+(\.[a-z0-9-]+)+',
                   '<email>', 'g'),
                 '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', '<phone>', 'g'),
               '[0-9]+', '<num>', 'g') AS scrubbed
           FROM aug)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[a-z0-9.+_-]+@[a-z0-9-]+(\.[a-z0-9-]+)+', 0))
                  AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', 0))
                  AS INT) AS n_phones,
             CAST(length(t) AS INT) AS len_raw,
             CAST(length(scrubbed) AS INT) AS len_scrubbed,
             substring(scrubbed, 1, 40) AS head
      FROM scrub ORDER BY doc_id""",

    "docs_domain_mix" -> """
      WITH byS AS (SELECT source, COUNT(1) AS n_docs,
                          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                   FROM documents GROUP BY source),
      w AS (SELECT source, n_docs, n_tokens,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS w_q
            FROM byS)
      SELECT source, n_docs, n_tokens,
             (w_q * 1000000) // CAST(SUM(w_q) OVER () AS BIGINT) AS mix_ppm
      FROM w ORDER BY source""",

    "docs_mixture_epoch_plan" -> s"""
      WITH byS AS (SELECT source, COUNT(1) AS n_docs,
                          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                   FROM documents GROUP BY source),
      w AS (SELECT source, n_docs, tokens,
                   CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_q
            FROM byS),
      t AS (SELECT source, n_docs, tokens, w_q,
                   CAST(SUM(w_q) OVER () AS BIGINT) AS w_total,
                   CAST(SUM(tokens) OVER () AS BIGINT) AS total_tokens
            FROM w)
      SELECT source, n_docs, tokens,
             (w_q * 1000000) // w_total AS share_ppm,
             ${r6Sql("CAST(w_q AS DOUBLE) / w_total * total_tokens / tokens")}
               AS epochs6
      FROM t ORDER BY source""",

    "docs_lm_quality_filter" -> s"""
      WITH $NllCteSql
      SELECT doc_id, lang, n_bigrams, avg_nll_micro,
             CAST(avg_nll_micro >
                  CAST(SUM(avg_nll_micro) OVER (PARTITION BY lang) AS BIGINT)
                    // COUNT(1) OVER (PARTITION BY lang)
               AS INT) AS flagged
      FROM perdoc ORDER BY doc_id""",

    "docs_nll_histogram" -> s"""
      WITH $NllCteSql,
      h AS (SELECT lang, avg_nll_micro // 500000 AS bucket,
                   COUNT(1) AS n_docs
            FROM perdoc GROUP BY 1, 2),
      tt AS (SELECT lang, COUNT(1) AS lang_docs FROM perdoc GROUP BY lang)
      SELECT h.lang, h.bucket, h.bucket * 500000 AS lo_micro_nats, h.n_docs,
             h.n_docs * 1000000 // tt.lang_docs AS share_ppm
      FROM h JOIN tt ON h.lang = tt.lang
      ORDER BY h.lang, h.bucket""",

    "docs_epoch_shuffle_plan" -> """
      WITH base AS (
        SELECT e.e AS epoch, doc_id,
               'e' || CAST(e.e AS VARCHAR) || ':' ||
                 CAST(doc_id AS VARCHAR) AS s
        FROM documents CROSS JOIN range(0, 3) e(e)),
      k AS (
        SELECT epoch, doc_id,
               (list_reduce(list_prepend(CAST(17 AS BIGINT),
                 list_transform(range(1, length(s) + 1),
                   i -> CAST(ord(substring(s, i, 1)) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % 2147483648)
                 * 2654435761 + 97) % 2147483647 AS h
        FROM base),
      r AS (SELECT epoch, doc_id, h,
                   CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                     ORDER BY h, doc_id) AS INT) AS pos
            FROM k),
      n AS (SELECT COUNT(1) AS n_docs FROM documents)
      SELECT CAST(epoch AS INT) AS epoch, pos, doc_id, h, n.n_docs
      FROM r CROSS JOIN n WHERE pos <= 5
      ORDER BY epoch, pos""",

    "docs_split_assign" -> """
      WITH h AS (SELECT doc_id, lang,
             ((list_reduce(list_prepend(CAST(17 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                 i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
               (a, c) -> (a * 31 + c) % 2147483648) % 100) + 100) % 100 AS bucket
           FROM documents)
      SELECT doc_id, lang, CAST(bucket AS INT) AS bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM h ORDER BY doc_id""",

    "docs_quality_percentile_gate" -> """
      WITH scored AS (
        SELECT doc_id, lang,
               (CAST(len(list_filter(string_split(text, ' '),
                  x -> x IN ('the','of','and','a','to','in','is','data')))
                 AS BIGINT) * 1000000)
                 // CAST(len(string_split(text, ' ')) AS BIGINT) AS score_ppm
        FROM documents),
      hist AS (SELECT lang, score_ppm, COUNT(1) AS c
               FROM scored GROUP BY 1, 2),
      cum AS (SELECT lang, score_ppm,
                     SUM(c) OVER (PARTITION BY lang ORDER BY score_ppm
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                     SUM(c) OVER (PARTITION BY lang) AS n
              FROM hist),
      thr AS (SELECT lang, MIN(score_ppm) AS thr_ppm
              FROM cum WHERE cum * 4 >= n GROUP BY 1)
      SELECT s.doc_id, s.lang, s.score_ppm, t.thr_ppm,
             CAST(s.score_ppm >= t.thr_ppm AS INT) AS kept
      FROM scored s JOIN thr t ON s.lang = t.lang
      ORDER BY s.doc_id""",

    "docs_temperature_resample" -> """
      WITH perdoc AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               ((list_reduce(list_prepend(CAST(17 AS BIGINT),
                   list_transform(range(1, length(text) + 1),
                     i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
                   (a, c) -> (a * 31 + c) % 2147483648) % 1000000)
                 + 1000000) % 1000000 AS h_ppm
        FROM documents),
      byS AS (SELECT source, COUNT(1) AS n_docs,
                     CAST(SUM(n_tok) AS BIGINT) AS n_tokens
              FROM perdoc GROUP BY 1),
      w AS (SELECT source, n_docs, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
                     AS BIGINT) AS w_q
            FROM byS),
      r AS (SELECT source, n_docs, n_tokens,
                   least(CAST(1000000 AS BIGINT),
                     (((CAST(SUM(n_tokens) OVER () AS BIGINT) // 2) * w_q
                        // CAST(SUM(w_q) OVER () AS BIGINT)) * 1000000)
                       // n_tokens) AS keep_ppm
            FROM w),
      g AS (SELECT p.source,
                   CAST(SUM(CASE WHEN p.h_ppm < r.keep_ppm THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN p.h_ppm < r.keep_ppm THEN p.n_tok
                            ELSE 0 END) AS BIGINT) AS kept_tokens,
                   CAST(SUM(CASE WHEN p.h_ppm < r.keep_ppm THEN p.doc_id
                            ELSE 0 END) AS BIGINT) AS kept_id_sum
            FROM perdoc p JOIN r ON p.source = r.source GROUP BY 1)
      SELECT r.source, r.n_docs, r.n_tokens, r.keep_ppm,
             g.n_kept, g.kept_tokens, g.kept_id_sum
      FROM r JOIN g ON r.source = g.source
      ORDER BY r.source""",

    "vec_int8_quantize" -> """
      WITH s AS (SELECT vec_id, label,
             list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS scale,
             embedding
           FROM embeddings),
      el AS (SELECT vec_id, label, scale, CAST(unnest(embedding) AS DOUBLE) AS x FROM s),
      pe AS (SELECT vec_id, label, scale,
             CASE WHEN scale > 0 THEN
               CAST(floor((x - floor(x / scale * 127 + 0.5) * scale / 127)
                        * (x - floor(x / scale * 127 + 0.5) * scale / 127)
                        * 1e12 + 0.5) AS BIGINT)
             ELSE 0 END AS eq
           FROM el),
      pv AS (SELECT vec_id, label, MIN(scale) AS scale,
                    CAST(SUM(eq) AS BIGINT) AS err_q
             FROM pe GROUP BY vec_id, label),
      pq AS (SELECT label, CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_q,
                    err_q
             FROM pv)
      SELECT label, COUNT(1) AS n_vecs,
             CAST(SUM(err_q) AS BIGINT) // COUNT(1) AS avg_err_p12,
             CAST(SUM(scale_q) AS BIGINT) // COUNT(1) AS avg_scale_micro
      FROM pq GROUP BY label ORDER BY label""",

    "docs_split_leakage" -> """
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      sh0 AS (SELECT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM tok)),
      sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      shc AS (SELECT doc_id, shingle FROM (
                SELECT doc_id, shingle,
                       COUNT(1) OVER (PARTITION BY shingle) AS df FROM sh)
              WHERE df <= 100),
      sz AS (SELECT doc_id, COUNT(1) AS n FROM shc GROUP BY doc_id),
      ix AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(1) AS inter
             FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      edges AS (
        SELECT id1, id2
        FROM ix JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) > 0.1),
      sp AS (SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id,
                     ((list_reduce(list_prepend(CAST(17 AS BIGINT),
                       list_transform(range(1, length(text) + 1),
                         i -> CAST(ord(substring(text, i, 1)) AS BIGINT))),
                       (a, c) -> (a * 31 + c) % 2147483648) % 100) + 100) % 100 AS b
                   FROM documents))
      SELECT least(p1.split, p2.split) AS split_a,
             greatest(p1.split, p2.split) AS split_b,
             COUNT(1) AS n_pairs,
             CAST(least(p1.split, p2.split) <> greatest(p1.split, p2.split) AS INT) AS is_leak
      FROM edges JOIN sp p1 ON id1 = p1.doc_id JOIN sp p2 ON id2 = p2.doc_id
      GROUP BY 1, 2 ORDER BY split_a, split_b""",

    "docs_token_budget_fill" -> """
      WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(string_split(text, ' ')) AS BIGINT) * 10
                 - CAST(len(list_filter(string_split(text, ' '),
                     x -> x IN ('the','of','and','a','to','in','is','data'))) AS BIGINT) * 5
                 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT)
                 AS quality
        FROM documents),
      c AS (SELECT lang, doc_id, quality, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY lang
                     ORDER BY quality DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS cum_tokens
            FROM scored)
      SELECT lang, doc_id, quality, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 20000 ORDER BY lang, cum_tokens, doc_id""",
  )
}
