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

  test("text_bpe_apply: fertility sheet equals a recomputation from the trained vocab") {
    val (_, vocab) = llm.TextOps.bpeTrainFull(spark, sfDir)
    val nsym = vocab.toMap
    // independent apply: plain Scala fold over the corpus words
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
        val nToks = words.map(w => nsym(w).toLong).sum
        (lang, (nWords, nChars, nToks, nToks * 1000L / nWords,
          nChars * 1000000L / nToks))
      }
    val got = q("text_bpe_apply").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === perLang)
  }
}
