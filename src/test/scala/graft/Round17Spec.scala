package graft

import org.apache.spark.sql.functions._

/** Round-17 batch A: the driver-side full-vocab BPE trainer
  * (VERDICT r16 #2).
  *
  *  - hand corpora pin the trainer's pair counting (overlaps included),
  *    lexicographic tie-break, leftmost-non-overlapping rewrite, and
  *    exhaustion under the merge budget — against literal hand-computed
  *    merge tables;
  *  - the 6-round distributed form (text_bpe_merge_train) is the
  *    DIFFERENTIAL TWIN: its full output must equal the first 6 rows of
  *    text_bpe_train_full on the fixture;
  *  - registry invariants: consecutive rounds from 1, budget respected,
  *    per-round max pair count non-increasing (a BPE invariant: every
  *    new pair's count is bounded by the count of the merge that created
  *    its symbol), and fixture exhaustion leaves every trained word a
  *    single symbol.
  */
class Round17Spec extends GraftSuite {
  import spark.implicits._

  test("bpeTrainFull: overlap counting, merge cascade, exhaustion on a hand corpus") {
    // words: aaa (freq 2), ab (freq 1). Round 1: (a,a) counts BOTH
    // adjacent positions of aaa -> 2*2=4, beats (a,b)=1; rewrite is
    // leftmost non-overlapping: (a)(a)(a) -> (aa)(a), NOT (aa)(aa).
    val docs = Seq((0L, "aaa ab"), (1L, "aaa")).toDF("doc_id", "text")
    val (merges, vocab) = llm.TextOps.bpeTrainFullDocs(docs)
    assert(merges === Seq((1, "a", "a", 4L), (2, "aa", "a", 2L),
      (3, "a", "b", 1L)))
    assert(vocab.toMap === Map("aaa" -> 1, "ab" -> 1))
  }

  test("bpeTrainFull: count ties break lexicographically on (lhs, rhs)") {
    val docs = Seq((0L, "xy yx")).toDF("doc_id", "text")
    val (merges, _) = llm.TextOps.bpeTrainFullDocs(docs)
    assert(merges === Seq((1, "x", "y", 1L), (2, "y", "x", 1L)))
  }

  test("bpeTrainFull: word filter excludes short and non-[a-z0-9] tokens") {
    val docs = Seq((0L, "a A1 b2c b2c ..")).toDF("doc_id", "text")
    val (merges, vocab) = llm.TextOps.bpeTrainFullDocs(docs)
    // only "b2c" survives the len>=2 + charset filter; (b,2) and (2,c)
    // tie at 2 and '2' < 'b' in binary order, so (2,c) merges first
    assert(vocab.map(_._1).toSet === Set("b2c"))
    assert(merges === Seq((1, "2", "c", 2L), (2, "b", "2c", 2L)))
  }

  test("text_bpe_train_full: first 6 merges equal the distributed twin; invariants") {
    val full = q("text_bpe_train_full").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val twin = q("text_bpe_merge_train").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(full.take(6).toSeq === twin.toSeq,
      "driver-side trainer diverged from the 6-round distributed twin")
    // consecutive rounds from 1, inside the budget
    assert(full.map(_._1).toSeq === (1 to full.length))
    assert(full.length <= llm.TextOps.BpeMergeBudget)
    // merged = lhs || rhs on every row
    assert(full.forall(m => m._4 == m._2 + m._3))
    // per-round chosen count is non-increasing (BPE invariant)
    assert(full.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "chosen pair counts must be non-increasing across merge rounds")
    // exhausted before the budget => every trained word is ONE symbol
    val (_, vocab) = llm.TextOps.bpeTrainFull(spark, sfDir)
    if (full.length < llm.TextOps.BpeMergeBudget)
      assert(vocab.forall(_._2 == 1),
        "exhaustion implies a fully merged vocab")
  }

  /** Naive reference BPE: full pair recount every round over plain symbol
    * lists — no incremental maintenance, no guard strings. The slowest,
    * most obviously-correct form; both engine trainers must match it. */
  private def naiveBpe(words: Seq[(String, Long)],
      budget: Int): Seq[(Int, String, String, Long)] = {
    var syms = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= budget && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (a, n) =>
        a.indices.dropRight(1).foreach { i =>
          counts((a(i), a(i + 1))) = counts.getOrElse((a(i), a(i + 1)), 0L) + n }
      }
      if (counts.isEmpty) done = true
      else {
        val ((la, lb), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r, la, lb, c))
        syms = syms.map { case (a, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < a.length) {
            if (i < a.length - 1 && a(i) == la && a(i + 1) == lb) {
              b += la + lb; i += 2
            } else { b += a(i); i += 1 }
          }
          (b.result(), n)
        }
        r += 1
      }
    }
    out.result()
  }

  test("BPE property: driver trainer == naive recount == distributed twin on seeded random corpora") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // random small vocab of random [a-z0-9] words, skewed frequencies —
      // plenty of count ties to exercise the lexicographic tie-break
      val alphabet = "abcz019"
      val vocab = Seq.fill(8 + rnd.nextInt(8)) {
        (2 + rnd.nextInt(5), Seq.fill(2 + rnd.nextInt(5))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      }.map(_._2).distinct
      val docs = (0 until 20).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docsDf = docs.toDF("doc_id", "text")
      val wordFreq = docs.flatMap(_._2.split(" ")).filter(_.length >= 2)
        .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
      val expected = naiveBpe(wordFreq, llm.TextOps.BpeMergeBudget)
      val (driver, _) = llm.TextOps.bpeTrainFullDocs(docsDf)
      assert(driver === expected,
        s"seed $seed: incremental driver trainer diverged from naive recount")
      val (dist, _) = llm.TextOps.bpeTrainDocs(spark, docsDf)
      assert(dist === expected.take(6),
        s"seed $seed: distributed 6-round twin diverged from naive recount")
      // r18 floor path: both trainers under an ACTIVE min-count cutoff
      // must equal the naive recount on the floored dict
      val floored = wordFreq.filter(_._2 >= 3L)
      if (floored.size < wordFreq.size && floored.nonEmpty) {
        val expF = naiveBpe(floored, llm.TextOps.BpeMergeBudget)
        val (drvF, _) = llm.TextOps.bpeTrainFullDocs(docsDf, 3L)
        assert(drvF === expF, s"seed $seed: floored driver trainer diverged")
        val (distF, _) = llm.TextOps.bpeTrainDocs(spark, docsDf, 3L)
        assert(distF === expF.take(6),
          s"seed $seed: floored distributed twin diverged")
      }
    }
  }

  test("stream_cc_maintain: hand corpus replays known per-wave merges and relabels") {
    // base comps: {10,11} label 10, {20} label 20.
    // wave 0 (27, 57, 87): 27 joins 20's comp (min stays 20 — no relabel);
    //   57/87 merge batch-internally to 57.
    // wave 1 (7): 7 < 10 merges into {10,11} — the BASE ROWS RELABEL to 7.
    // wave 2 (17): 17 < 57 merges into {57,87} — both relabel to 17.
    val docs = Seq(
      (10L, "aa bb cc dd ee"), (11L, "aa bb cc dd ee"),
      (20L, "ff gg hh ii jj"),
      (27L, "ff gg hh ii jj"), (57L, "kk ll mm nn oo"),
      (87L, "kk ll mm nn oo"),
      (7L, "aa bb cc dd ee"),
      (17L, "kk ll mm nn oo")).toDF("doc_id", "text")
    val got = streaming.Streaming.streamCcMaintain(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // n_delta_rows (r18): wave rows + relabel pairs — waves 1/2 each land
    // 1 new doc + 1 relabel pair (10→7, 57→17); wave 0 merges nothing
    assert(got.toSeq === Seq(
      (0L, 3L, 2L, 0L, 3L, 3L),
      (1L, 1L, 2L, 2L, 3L, 2L),
      (2L, 1L, 2L, 2L, 3L, 2L)))
    // the SERVED labels (base + delta chain, r18 merge-on-read) are the
    // full-graph ground truth
    val base = s"/tmp/graft_scc_${spark.sparkContext.applicationId}"
    val labels = streaming.Streaming.ccServedLabels(spark, base, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(10L -> 7L, 11L -> 7L, 7L -> 7L,
      20L -> 20L, 27L -> 20L, 57L -> 17L, 87L -> 17L, 17L -> 17L))
    // r18 write-path contract, amended r19 (VERDICT r18 #1): the store is
    // never rewritten PER WAVE — only v0, the per-wave deltas, and the
    // K-amortized checkpoint exist. With K = 2 over 3 waves exactly ONE
    // checkpoint lands: v2 (after wave 1); v1/v3 must not exist.
    assert(new java.io.File(s"$base/labels/v2").exists(),
      "K=2 checkpoint labels/v2 missing — delta chain never re-roots")
    for (v <- Seq(1, 3))
      assert(!new java.io.File(s"$base/labels/v$v").exists(),
        s"labels/v$v exists — per-wave store rewrite regressed")
  }

  test("stream_cc_maintain property: incremental == full rebuild on seeded random corpora") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      // pool-based texts => natural near-dup clusters spanning base and
      // all three waves; one-word mutations keep jaccard > 0.1 edges
      val pool = Vector(
        "aa bb cc dd ee ff", "gg hh ii jj kk ll", "mm nn oo pp qq rr",
        "ss tt uu vv ww xx", "yy zz a1 b2 c3 d4", "e5 f6 g7 h8 i9 j0")
      val docs = (0L until 60L).map { id =>
        val t = pool(rnd.nextInt(pool.size))
        (id, if (rnd.nextBoolean()) t else t + " mut" + rnd.nextInt(3))
      }.toDF("doc_id", "text")
      streaming.Streaming.streamCcMaintain(spark, docs).collect()
      val base = s"/tmp/graft_scc_${spark.sparkContext.applicationId}"
      val incremental = streaming.Streaming.ccServedLabels(spark, base, 2L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (full, _) = llm.DedupOps.connectedComponents(
        docs.select(col("doc_id").as("node")),
        spark.read.parquet(s"$base/edges"))
      val rebuilt = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(incremental === rebuilt, s"seed $seed: incremental diverged")
      // the random pools guarantee real cross-wave merge work happened
      assert(incremental.values.toSet.size < 60, s"seed $seed: no merges at all")
    }
  }

  test("stream_cc_maintain: fixture final store equals a full CC rebuild") {
    q("stream_cc_maintain").collect() // runs the waves, lands the deltas
    val base = s"/tmp/graft_scc_${spark.sparkContext.applicationId}"
    val incremental = streaming.Streaming.ccServedLabels(spark, base, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = llm.DedupOps.plantedStreamDocs(
      Tables.load(spark, sfDir, "documents").select("doc_id", "text"))
    val (full, _) = llm.DedupOps.connectedComponents(
      docs.select(col("doc_id").as("node")),
      spark.read.parquet(s"$base/edges"))
    val rebuilt = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental === rebuilt,
      "incremental per-wave label maintenance diverged from the full rebuild")
    assert(incremental.nonEmpty)
  }

  test("retrieval consumers are SERVED from the landed index (plan lock)") {
    // every IVF consumer's executed plan must read the ivf_cells artifact
    // parquet (a FileScan over the CorpusArtifacts dir), not re-derive
    // cells inline — the r17 landed-index contract
    for (op <- Seq("knn_ivf_topk", "vec_ivf_cell_stats",
        "vec_ivf_probe_cost", "vec_ivf_balance_gini")) {
      val plan = q(op).queryExecution.executedPlan.toString
      assert(plan.contains("graft_artifacts"),
        s"$op does not read the landed index artifact:\n$plan")
    }
    val pq = q("knn_ivfpq_topk").queryExecution.executedPlan.toString
    assert(pq.contains("ivfpq_index"),
      "knn_ivfpq_topk does not read the landed IVF-PQ index")
    val hy = q("docs_hybrid_retrieval").queryExecution.executedPlan.toString
    assert(hy.contains("hybrid_universe"),
      "docs_hybrid_retrieval does not read the landed serving universe")
  }

  test("maintenance_compaction_execute: executed layout equals the plan; round-trip lossless") {
    val (out, planBins, root) = operators.Profiling.compactionExecute(spark, sfDir)
    val plan = planBins.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val actual = spark.read.parquet(root)
      .groupBy(col("o_orderstatus").as("part"), col("bin_id").cast("long").as("bin_id"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("_metadata.file_path")).as("n_out_files"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // the bins on disk are EXACTLY the planned bins
    assert(actual.keySet === plan.keySet,
      s"planned bins ${plan.keySet} != executed ${actual.keySet}")
    // each bin landed as ONE file carrying exactly its planned rows
    actual.foreach { case (bin, (rows, nFiles)) =>
      assert(nFiles === 1L, s"bin $bin splintered into $nFiles files")
      assert(rows === plan(bin)._2,
        s"bin $bin has $rows rows, plan said ${plan(bin)._2}")
    }
    assert(plan.size > 1, "fixture should plan more than one bin")
    // read-back identity vs the source table
    val src = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), Helpers.decSumOut(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
    assert(out.collect().toSeq === src.collect().toSeq)
  }

  test("multimodal_pair_dedup: planted classes land in their categories") {
    // sf0.01: all three planted id classes (%100 = 0 / 50 / 25) exist
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("multimodal_pair_dedup")(spark, dir).collect()
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    // category is a pure function of the two flags
    m.values.foreach { case (i, c, cat) =>
      assert(cat === ((i, c) match {
        case (1, 1) => "both"
        case (1, 0) => "image_only"
        case _      => "caption_only"
      }))
      assert(i == 1 || c == 1, "a pair with neither flag cannot exist")
    }
    val ids = Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    def found(cls: Long, shift: Long)(pred: ((Int, Int, String)) => Boolean) = {
      val planted = ids.filter(_ % 100 == cls)
      (planted.count(d => m.get((d, d + shift)).exists(pred)), planted.length)
    }
    // '.'-append clones: tiny image edit + near-identical shingles -> both
    val (b, bn) = found(0L, 10000000L)(_._3 == "both")
    assert(bn > 0 && b * 2 > bn, s"both-class recall $b/$bn")
    // word-order-reversed clones: identical codepoint histogram -> image
    // dup by construction (Hamming 0); shingles all new -> caption clean
    val (io, ion) = found(50L, 20000000L)(e => e._1 == 1 && e._2 == 0)
    assert(ion > 0 && io * 2 > ion, s"image_only recall $io/$ion")
    // tail-word-append clones: 11 parity flips > 6 -> image clean; most
    // minhash bands survive a 3-shingle tail edit -> caption dup
    val (co, con) = found(25L, 30000000L)(e => e._1 == 0 && e._2 == 1)
    assert(con > 0 && co * 2 > con, s"caption_only recall $co/$con")
  }

  test("scan_stats_sidecar_append: commit-time sidecar update, prune correct against it") {
    import operators.Scans
    val base = Scans.statsSidecarAppendTable(spark, sfDir)
    val v0 = Scans.readLog(spark, f"$base/_log/v00000.stats")
    val v1 = Scans.readLog(spark, f"$base/_log/v00001.stats")
    // the commit APPENDED: v0's lines survive byte-identical as a prefix
    assert(v1.take(v0.size) === v0,
      "append commit must not rewrite the existing sidecar entries")
    assert(v1.size === v0.size + 4, s"expected 4 new stats lines, v0=${v0.size} v1=${v1.size}")
    assert(v1.size === Scans.readManifest(spark, base, 1).size,
      "one stats line per manifest file")
    // prune against the UPDATED sidecar: strict subset, both commits hit
    val ranges = Seq((1000L, 5000L), (10000100L, 10001200L))
    val stats = Scans.readStats(spark, base, 1)
    val live = stats.filter(f =>
      ranges.exists { case (lo, hi) => f.max >= lo && f.min <= hi })
    assert(live.size < stats.size, "prune must exclude at least one file")
    assert(live.exists(_.path.contains("/data/c0/")) &&
      live.exists(_.path.contains("/data/c1/")),
      s"prune must keep files from BOTH commits: ${live.map(_.path)}")
    // soundness: every excluded file provably cannot match either range
    stats.filterNot(f => live.exists(_.path == f.path)).foreach { f =>
      assert(ranges.forall { case (lo, hi) => f.max < lo || f.min > hi }) }
    // the pruned read equals the unpruned filtered read of the v1 table
    val pred = col("o_orderkey").between(1000L, 5000L) ||
      col("o_orderkey").between(10000100L, 10001200L)
    val pruned = spark.read.parquet(live.map(_.path): _*).filter(pred)
      .agg(count(lit(1)), sum("o_orderkey")).collect().toSeq
    val full = spark.read.parquet(Scans.readManifest(spark, base, 1): _*)
      .filter(pred).agg(count(lit(1)), sum("o_orderkey")).collect().toSeq
    assert(pruned === full)
  }

  test("text_bpe_apply: fertility sheet equals a recomputation from the trained vocab") {
    val (_, vocab) = llm.TextOps.bpeTrainFull(spark, sfDir)
    val nsym = vocab.toMap
    // independent apply: plain Scala fold over the corpus words. Words
    // below the r18 training floor are OOV to the trained dict and encode
    // at CHAR level (r19, ADVICE r18: n_sym = n_char fallback), so the
    // fertility sums cover the FULL word mass and the OOV share is an
    // explicit column.
    val perLang = Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("text")).as[(String, String)].collect()
      .flatMap { case (lang, text) => text.split(" ").iterator
        .filter(w => w.length >= 2 &&
          w.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z')))
        .map(w => (lang, w)) }
      .groupBy(_._1).map { case (lang, ws) =>
        val words = ws.map(_._2)
        val nWords = words.length.toLong
        val nChars = words.map(_.length.toLong).sum
        val nToks = words.map(w => nsym.getOrElse(w, w.length).toLong).sum
        val nOov = words.count(w => !nsym.contains(w)).toLong
        (lang, (nWords, nChars, nToks, nOov, nToks * 1000L / nWords,
          nChars * 1000000L / nToks, nOov * 1000000L / nWords))
      }
    val got = q("text_bpe_apply").collect().map(r =>
      r.getString(0) -> ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov_words"),
        r.getAs[Long]("tokens_per_kword"), r.getAs[Long]("chars_per_token_ppm"),
        r.getAs[Long]("oov_word_ppm")))).toMap
    assert(got === perLang)
  }
}
