package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-16 batch E: the retrieval/decontamination trio.
  *
  *  - text_bm25_topk: BM25 score math pinned on a hand corpus against an
  *    independent scalar reimplementation; fixture shape properties; the
  *    map-side WindowGroupLimit plan lock.
  *  - vec_retrieval_metrics: MRR/nDCG recomputed in plain Scala from the
  *    two kernel outputs; bounds.
  *  - docs_decontaminate_semantic: differential against an independent
  *    plan (no broadcast hint, declarative zip_with dot instead of the
  *    native DotQ, window argmax instead of struct-max); partition +
  *    flag contracts; the broadcast plan lock.
  */
class Round16eSpec extends GraftSuite {

  /** THE scalar BM25 per-term score — one copy for all four twins (r17
    * review: the formula previously lived in four identical blocks);
    * mirrors the engines' double-from-first-multiply order exactly. */
  private def sMicroScalar(t: Long, df: Long, dl: Long, n: Long,
      bigL: Long): Long = {
    val idf = math.log((2 * n + 2).toDouble / (2 * df + 1))
    val tfn = t.toDouble * bigL * 22.0 /
      (t.toDouble * bigL * 10.0 + bigL.toDouble * 3.0 +
        dl.toDouble * n * 9.0)
    math.floor(idf * tfn * 1e6).toLong
  }

  import spark.implicits._

  test("text_bm25_topk: hand corpus matches an independent scalar BM25") {
    // 4 terms only -> the 10-term panel takes all of them: queries are
    // (w,x) and (y,z) by (count desc, term asc) ranking.
    val docs = Seq(
      (0L, "x x x y"),
      (1L, "x y z z"),
      (2L, "y z"),
      (3L, "w w w w w w")).toDF("doc_id", "text")
    val n = 4L
    val bigL = 16L
    val tf = Map( // (term, doc) -> tf
      ("x", 0L) -> 3L, ("x", 1L) -> 1L,
      ("y", 0L) -> 1L, ("y", 1L) -> 1L, ("y", 2L) -> 1L,
      ("z", 1L) -> 2L, ("z", 2L) -> 1L,
      ("w", 3L) -> 6L)
    val dl = Map(0L -> 4L, 1L -> 4L, 2L -> 2L, 3L -> 6L)
    val df = tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    def sMicro(term: String, doc: Long): Long =
      sMicroScalar(tf((term, doc)), df(term), dl(doc), n, bigL)
    val queries = Map(0 -> Seq("w", "x"), 1 -> Seq("y", "z"))
    val expected = (for {
      (qid, terms) <- queries.toSeq
      doc <- 0L to 3L
      hit = terms.filter(t => tf.contains((t, doc)))
      if hit.nonEmpty
    } yield (qid, doc, hit.map(t => sMicro(t, doc)).sum, hit.size))
      .groupBy(_._1)
      .flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.map { case (r, i) =>
          Row(qid, i + 1, r._2, r._3, r._4)
        }
      }.toSeq
    val got = llm.TextOps.bm25TopK(spark, docs).collect().toSeq
      .map(r => Row(r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.toSet === expected.toSet)
    assert(got.size === 6) // (w,x): d0,d1,d3; (y,z): d0,d1,d2
  }

  test("text_bm25_topk: fixture shape — 5 queries x 10 ranks, scores non-increasing") {
    val rows = q("text_bm25_topk").collect()
    assert(rows.length === 50)
    val byQ = rows.groupBy(_.getInt(0))
    assert(byQ.keySet === Set(0, 1, 2, 3, 4))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 10))
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse))
    }
  }

  test("text_bm25_topk: top-k lowers to a map-side WindowGroupLimit") {
    val plan = q("text_bm25_topk").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit prune in:\n$plan")
  }

  test("vec_retrieval_metrics: equals a plain-Scala recomputation from the kernels") {
    val ivf = q("knn_ivf_topk").select("qid", "vid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val rel = q("knn_cosine_topk").select("qid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def lg2u(r: Long): Long = math.floor(math.log(r + 1.0) / math.log(2.0) * 1e6).toLong
    def disc(r: Long): Long = 1000000000000L / lg2u(r)
    val idcg = (1L to 5L).map(disc).sum
    val expected = ivf.groupBy(_._1).map { case (qid, items) =>
      val hits = items.filter(i => rel((qid, i._2)))
      val nRel = hits.length
      val fr = if (hits.isEmpty) -1L else hits.map(_._3).min
      val rr = if (hits.isEmpty) 0L else 1000000L / fr
      val dcg = hits.map(i => disc(i._3)).sum
      (qid, (nRel, fr.toInt, rr, dcg, dcg * 1000000L / idcg))
    }
    val got = q("vec_retrieval_metrics").collect().map(r =>
      (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got === expected)
    got.values.foreach { case (nRel, fr, rr, dcg, ndcg) =>
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert(dcg <= idcg)
      assert((rr == 1000000L) === (fr == 1))
    }
  }

  test("docs_decontaminate_semantic: differential vs independent plan; contracts") {
    val e = Tables.load(spark, sfDir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("qe"))
    val bench = e.filter(pmod(col("vec_id"), lit(50L)) === 0 &&
        col("vec_id") < 2000)
      .select(col("vec_id").as("bid"), col("qe").as("bq"))
    val nBench = bench.count()
    val nTotal = e.count()
    // independent path: plain join (no hint), declarative zip_with dot
    // (not the native DotQ), window argmax (not struct-max)
    val dot = aggregate(zip_with(col("qe"), col("bq"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy("vec_id").orderBy(col("dot_q").desc, col("bid"))
    // train side = exact complement of the capped bench set (r17 fix)
    val naive = e.filter(pmod(col("vec_id"), lit(50L)) =!= 0 ||
        col("vec_id") >= 2000).join(bench)
      .select(col("vec_id"), col("bid"), dot.as("dot_q"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("dot_q").as("max_dot_q"),
        col("bid").as("bench_id"),
        (col("dot_q") >= 350000000000L).cast("int").as("contaminated"))
    val got = q("docs_decontaminate_semantic")
    assert(got.count() === nTotal - nBench)
    // no bench member is ever scanned as train; everything else IS —
    // bench ∪ train partitions the corpus (the r17 complement contract)
    assert(got.filter(pmod(col("vec_id"), lit(50L)) === 0 &&
      col("vec_id") < 2000).count() === 0)
    assert(got.except(naive).count() === 0 && naive.except(got).count() === 0)
    assert(got.filter(col("contaminated") === 1).count() > 0)
  }

  test("docs_decontaminate_semantic: eval side broadcasts (nested-loop plan lock)") {
    val plan = q("docs_decontaminate_semantic").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast of the eval side in:\n$plan")
  }

  test("docs_hybrid_retrieval: hand corpus matches a scalar BM25+dense RRF recomputation") {
    val texts = Map(
      0L -> "apple banana cherry apple",
      1L -> "apple banana date",
      2L -> "cherry date egg",
      3L -> "banana banana egg fig",
      4L -> "fig grape apple",
      5L -> "grape egg date banana")
    val vecs = Map(
      0L -> Seq(0.9, 0.1, 0.2, 0.1),
      1L -> Seq(0.8, 0.3, 0.1, 0.2),
      2L -> Seq(0.1, 0.9, 0.3, 0.1),
      3L -> Seq(0.2, 0.8, 0.1, 0.4),
      4L -> Seq(0.3, 0.2, 0.9, 0.1),
      5L -> Seq(0.1, 0.3, 0.8, 0.3))
    val docs = texts.toSeq.toDF("doc_id", "text")
    val emb = vecs.toSeq.toDF("vec_id", "embedding")
    // scalar twin ------------------------------------------------------
    val tok = texts.map { case (d, t) => d -> t.split(" ").toSeq }
    val dl = tok.map { case (d, ts) => d -> ts.size.toLong }
    val n = 6L
    val bigL = dl.values.sum
    val tf = tok.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (t, d) -> xs.size.toLong } }
    val df = tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    def sMicro(term: String, doc: Long): Long =
      sMicroScalar(tf((term, doc)), df(term), dl(doc), n, bigL)
    def qz(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    def dot(a: Long, b: Long): Long =
      vecs(a).map(qz).zip(vecs(b).map(qz)).map { case (x, y) => x * y }.sum
    val expected = (0L to 4L).flatMap { qid =>
      val cands = (0L to 5L).filter(_ != qid)
      val rd = cands.sortBy(d => (-dot(qid, d), d)).zipWithIndex
        .map { case (d, i) => d -> (i + 1L) }.toMap
      val qterms = tok(qid).distinct
      val rs = cands.flatMap { d =>
        val hit = qterms.filter(t => tf.contains((t, d)))
        if (hit.isEmpty) None else Some(d -> hit.map(t => sMicro(t, d)).sum)
      }.sortBy { case (d, sc) => (-sc, d) }.zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1L) }.toMap
      cands.filter(d => rs.contains(d) || rd.contains(d)).map { d =>
        val rrf = rs.get(d).map(r => 1000000L / (r + 60)).getOrElse(0L) +
          rd.get(d).map(r => 1000000L / (r + 60)).getOrElse(0L)
        (qid, d, rs.getOrElse(d, -1L), rd.getOrElse(d, -1L), rrf)
      }.sortBy(r => (-r._5, r._2)).take(5).zipWithIndex.map { case (r, i) =>
        Row(r._1, i + 1, r._2, r._3, r._4, r._5)
      }
    }
    val got = llm.VectorOps.hybridRetrieval(spark, docs, emb).collect().toSeq
      .map(r => Row(r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got === expected)
  }

  test("docs_hybrid_retrieval: fixture shape + RRF integer consistency + plan locks") {
    val rows = q("docs_hybrid_retrieval").collect()
    assert(rows.length === 25)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val (rs, rd, rrf) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(rs == -1L || (rs >= 1L && rs <= 20L))
      assert(rd == -1L || (rd >= 1L && rd <= 20L))
      val exp = (if (rs >= 1) 1000000L / (rs + 60) else 0L) +
        (if (rd >= 1) 1000000L / (rd + 60) else 0L)
      assert(rrf === exp)
    }
    val plan = q("docs_hybrid_retrieval").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("vec_hard_negatives: differential vs independent plan; band contracts") {
    val Margin = 50000000000L
    val e = Tables.load(spark, sfDir, "embeddings").select(col("vec_id"),
      col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("qe"))
    val qp = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("ql"), col("qe").as("qv"))
    // independent path: plain join, declarative zip_with dot, window argmax
    val dot = aggregate(zip_with(col("qv"), col("qe"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val scored = qp.join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("ql"), col("vec_id").as("vid"),
        col("label").as("vl"), dot.as("dot_q"))
    val wp = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("vid"))
    val pos = scored.filter(col("ql") === col("vl"))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
      .select(col("qid"), col("dot_q").as("pos_dot_q"), col("vid").as("pos_id"))
    val wn = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("vid"))
    val naive = scored.filter(col("ql") =!= col("vl"))
      .join(pos, Seq("qid"))
      .filter(col("dot_q") < col("pos_dot_q") &&
        col("dot_q") > col("pos_dot_q") - Margin)
      .withColumn("rn", row_number().over(wn)).filter(col("rn") <= 5)
      .select(col("qid"), col("rn").cast("int").as("rn"), col("vid"),
        col("vl").as("neg_label"), col("dot_q"), col("pos_id"), col("pos_dot_q"))
    val got = q("vec_hard_negatives")
    assert(got.count() > 0)
    assert(got.except(naive).count() === 0 && naive.except(got).count() === 0)
    // band + label contracts on every emitted row
    val qLabel = e.filter(col("vec_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.collect().foreach { r =>
      assert(r.getInt(3) !== qLabel(r.getLong(0))) // neg_label != query label
      assert(r.getLong(4) < r.getLong(6) &&
        r.getLong(4) > r.getLong(6) - Margin) // strictly inside the band
    }
  }

  test("docs_split_by_component: zero cross-split near-dup pairs; singleton agreement") {
    val out = q("docs_split_by_component")
    // 1. the headline contract: NO candidate pair straddles splits
    val splits = out.select(col("doc_id"), col("split"))
    val crossing = llm.TextOps.candidatePairs(spark, sfDir)
      .join(splits.select(col("doc_id").as("id1"), col("split").as("s1")), Seq("id1"))
      .join(splits.select(col("doc_id").as("id2"), col("split").as("s2")), Seq("id2"))
      .filter(col("s1") =!= col("s2"))
    assert(crossing.count() === 0)
    // 2. one split per component
    assert(out.select("component_id", "split").distinct().count() ===
      out.select("component_id").distinct().count())
    // 3. singleton components agree with the per-doc rule
    val singletons = out.groupBy("component_id")
      .agg(count(lit(1)).as("n"), first(col("doc_id")).as("doc_id"),
        first(col("split")).as("comp_split"))
      .filter(col("n") === 1)
    val perDoc = q("docs_split_assign").select(col("doc_id"), col("split"))
    val disagree = singletons.join(perDoc, Seq("doc_id"))
      .filter(col("comp_split") =!= col("split"))
    assert(disagree.count() === 0)
    // 4. every doc is assigned exactly once
    assert(out.count() === Tables.load(spark, sfDir, "documents").count())
    assert(out.select("doc_id").distinct().count() === out.count())
  }

  // ---- seeded random-corpus differentials (SURVEY §5.4) ----------------
  // Full scalar twins of the two retrieval kernels, generalized over any
  // corpus, driven by ScalaCheck generators with fixed seeds.

  /** Scalar BM25 (panel derivation included): returns (qid, rn, doc_id,
    * score_micro, n_terms) rows exactly as text_bm25_topk emits them. */
  private def scalarBm25(texts: Map[Long, String]): Set[Row] = {
    val tok = texts.map { case (d, t) => d -> t.split(" ").toSeq }
    val dl = tok.map { case (d, ts) => d -> ts.size.toLong }
    val n = texts.size.toLong
    val bigL = dl.values.sum
    val tf = tok.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (t, d) -> xs.size.toLong } }.toMap
    val df = tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    val cnt = tf.toSeq.groupBy(_._1._1)
      .map { case (t, xs) => t -> xs.map(_._2).sum }
    val panel = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1)
    val queries = panel.zipWithIndex.groupBy(_._2 / 2)
      .map { case (qid, ts) => qid -> ts.map(_._1) }
    def sMicro(term: String, doc: Long): Long =
      sMicroScalar(tf((term, doc)), df(term), dl(doc), n, bigL)
    (for {
      (qid, terms) <- queries.toSeq
      doc <- texts.keys.toSeq
      hit = terms.filter(t => tf.contains((t, doc)))
      if hit.nonEmpty
    } yield (qid, doc, hit.map(t => sMicro(t, doc)).sum, hit.size))
      .groupBy(_._1)
      .flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex.map { case (r, i) =>
          Row(qid, i + 1, r._2, r._3, r._4)
        }
      }.toSet
  }

  /** Scalar hybrid twin: (qid, rn, doc_id, rs, rd, rrf) rows exactly as
    * docs_hybrid_retrieval emits them over a (texts, vecs) universe. */
  private def scalarHybrid(texts: Map[Long, String],
      vecs: Map[Long, Seq[Double]]): Seq[Row] = {
    val ids = texts.keySet intersect vecs.keySet
    val tok = texts.collect { case (d, t) if ids(d) => d -> t.split(" ").toSeq }
    val dl = tok.map { case (d, ts) => d -> ts.size.toLong }
    val n = ids.size.toLong
    val bigL = dl.values.sum
    val tf = tok.toSeq.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (t, d) -> xs.size.toLong } }.toMap
    val df = tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    def sMicro(term: String, doc: Long): Long =
      sMicroScalar(tf((term, doc)), df(term), dl(doc), n, bigL)
    def qz(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    def dot(a: Long, b: Long): Long =
      vecs(a).map(qz).zip(vecs(b).map(qz)).map { case (x, y) => x * y }.sum
    ids.toSeq.sorted.filter(_ < 5).flatMap { qid =>
      val cands = ids.toSeq.sorted.filter(_ != qid)
      val rd = cands.sortBy(d => (-dot(qid, d), d)).take(20).zipWithIndex
        .map { case (d, i) => d -> (i + 1L) }.toMap
      val qterms = tok(qid).distinct
      val rs = cands.flatMap { d =>
        val hit = qterms.filter(t => tf.contains((t, d)))
        if (hit.isEmpty) None else Some(d -> hit.map(t => sMicro(t, d)).sum)
      }.sortBy { case (d, sc) => (-sc, d) }.take(20).zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1L) }.toMap
      cands.filter(d => rs.contains(d) || rd.contains(d)).map { d =>
        val rrf = rs.get(d).map(r => 1000000L / (r + 60)).getOrElse(0L) +
          rd.get(d).map(r => 1000000L / (r + 60)).getOrElse(0L)
        (qid, d, rs.getOrElse(d, -1L), rd.getOrElse(d, -1L), rrf)
      }.sortBy(r => (-r._5, r._2)).take(5).zipWithIndex.map { case (r, i) =>
        Row(r._1, i + 1, r._2, r._3, r._4, r._5)
      }
    }
  }

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private def sampleCorpus(seed: Long): Map[Long, String] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val g = Gen.chooseNum(6, 18).flatMap { nd =>
      Gen.listOfN(nd, Gen.chooseNum(2, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    }
    g.apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
  }

  private def sampleVecs(seed: Long, ids: Iterable[Long]): Map[Long, Seq[Double]] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val g = Gen.listOfN(ids.size * 3,
      Gen.chooseNum(-999, 999).map(_ / 1000.0))
    val xs = g.apply(Gen.Parameters.default, Seed(seed)).get
    ids.toSeq.sorted.zip(xs.grouped(3).toSeq).toMap
  }

  test("edge: bm25 and hybrid degrade gracefully on degenerate corpora") {
    // single-doc corpus: every panel term's only posting is that doc
    val one = Seq((0L, "solo words here")).toDF("doc_id", "text")
    val b1 = llm.TextOps.bm25TopK(spark, one).collect()
    assert(b1.forall(_.getLong(2) == 0L) && b1.nonEmpty)
    // hybrid with NO query docs (all ids >= 5): empty output, no crash
    val docs = Seq((7L, "a b"), (8L, "b c")).toDF("doc_id", "text")
    val emb = Seq((7L, Seq(0.1, 0.2)), (8L, Seq(0.2, 0.1)))
      .toDF("vec_id", "embedding")
    assert(llm.VectorOps.hybridRetrieval(spark, docs, emb).count() === 0)
    // hybrid with queries but an empty-intersection universe side
    val docsOnly = Seq((0L, "a b")).toDF("doc_id", "text")
    val embOther = Seq((9L, Seq(0.1, 0.2))).toDF("vec_id", "embedding")
    assert(llm.VectorOps.hybridRetrieval(spark, docsOnly, embOther).count() === 0)
  }

  test("property: text_bm25_topk equals the scalar twin on random corpora") {
    for (seed <- Seq(7L, 99L, 2024L)) {
      val texts = sampleCorpus(seed)
      val got = llm.TextOps.bm25TopK(spark, texts.toSeq.toDF("doc_id", "text"))
        .collect().toSet
        .map((r: Row) => Row(r.getInt(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getInt(4)))
      assert(got === scalarBm25(texts), s"seed $seed")
    }
  }

  test("property: docs_hybrid_retrieval equals the scalar twin on random corpora") {
    for (seed <- Seq(7L, 99L, 2024L)) {
      val texts = sampleCorpus(seed)
      val vecs = sampleVecs(seed + 1, texts.keys)
      val got = llm.VectorOps.hybridRetrieval(spark,
        texts.toSeq.toDF("doc_id", "text"),
        vecs.toSeq.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding"))
        .collect().toSeq
        .map(r => Row(r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got === scalarHybrid(texts, vecs), s"seed $seed")
    }
  }
}
