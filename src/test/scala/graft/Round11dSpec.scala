package graft

import org.apache.spark.sql.functions._

/** Hand-computed unit evidence for the round-11 batch-2 ops
  * (text_collocations, text_vocab_coverage, docs_dedup_weight,
  * dedup_cluster_stats, vec_hamming_recall) — tiny purpose-built corpora
  * where every output cell is derivable by hand, including the edge each
  * op exists for (support cut at the lift boundary, the mid-level K
  * interpolation, the singleton-vs-cluster weight split, a sign-identical
  * duplicate ranking first in both metrics).
  */
class Round11dSpec extends GraftSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r11d_doc_")
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_collocations: support cut keeps only c12 >= 3; lift matches the hand formula") {
    // ts = [a,b,a,b,a,b]: adjacent pairs ab x3, ba x2 -> only (a,b)
    // survives the support cut. uni a:3 b:3, n_tok 6, n_pair 5.
    // lift6 = ((((3*6)*6)/5)/3)/3 = 2.4 exactly.
    val dir = writeDocs(Seq((1L, "a b a b a b", "en")))
    val rows = SparkEntry.queries("text_collocations")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("w1") == "a" && r.getAs[String]("w2") == "b")
    assert(r.getAs[Long]("c12") == 3L)
    assert(r.getAs[Long]("c1") == 3L && r.getAs[Long]("c2") == 3L)
    assert(math.abs(r.getAs[Double]("lift6") - 2.4) < 1e-12)
  }

  test("text_vocab_coverage: mid-level boundary interpolates exactly; k > vocab covers everything") {
    // 5 words twice (w01..w05), 7 words once (w06..w12): vocab 12,
    // total 17. top-10 mass = 10 + 5*1 = 15 (boundary level c=1).
    val text = ((1 to 5).map(i => f"w$i%02d w$i%02d") ++
      (6 to 12).map(i => f"w$i%02d")).mkString(" ")
    val dir = writeDocs(Seq((1L, text, "en")))
    val rows = SparkEntry.queries("text_vocab_coverage")(spark, dir)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("top_words"),
        r.getAs[Long]("covered_tokens"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("coverage_ppm")))
    assert(rows.toSeq === Seq(
      (10L, 10L, 15L, 17L, 15L * 1000000L / 17L),
      (100L, 12L, 17L, 17L, 1000000L),
      (1000L, 12L, 17L, 17L, 1000000L)))
  }

  test("docs_dedup_weight + dedup_cluster_stats: 1/|cluster| ppm weights; histogram masses add up") {
    // docs 1,2 share shingle "alpha beta gamma" (jac 1/3 > 0.1); doc 3 is
    // disjoint -> clusters {1,2} and {3}.
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma epsilon", "en"),
      (3L, "zeta eta theta iota", "en")))
    val w = SparkEntry.queries("docs_dedup_weight")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Long]("weight_ppm")))
    assert(w.toSeq === Seq((1L, 1L, 2L, 500000L), (2L, 1L, 2L, 500000L),
      (3L, 3L, 1L, 1000000L)))
    val st = SparkEntry.queries("dedup_cluster_stats")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))
    assert(st.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L)))
    // doc mass in the histogram equals the corpus size
    assert(st.map(_._3).sum == 3L)
  }

  test("vec_hamming_recall: sign-identical duplicates rank first in both metrics -> recall 1") {
    // vecs 1..10 duplicate query 0 (same signs, same dot); 11..25 are the
    // opposite direction (all 64 sign bits differ, negative dot) -> the
    // Hamming top-10 and the exact top-10 are both exactly {1..10}.
    val dim = 64
    val pos = Array.fill(dim)(0.125f)
    val neg = pos.map(x => -x)
    val rows = (0 to 10).map(i => (i.toLong, pos.toSeq, 0)) ++
      (11 to 25).map(i => (i.toLong, neg.toSeq, 1))
    val dir = TestSpark.tempDir("graft_r11d_emb_")
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("vec_hamming_recall")(spark, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("n_hit"),
        r.getAs[Long]("recall_ppm")))
    // only qid 0 exists (< 10 filter keeps 0..9; ids 1..9 are also queries)
    assert(out.nonEmpty && out.forall { case (_, h, p) =>
      h == 10 && p == 1000000L })
  }

  test("vec_hamming_recall on the fixture: 10 query rows, recall_ppm = n_hit * 100000") {
    val out = q("vec_hamming_recall").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val h = r.getAs[Int]("n_hit")
      assert(h >= 0 && h <= 10)
      assert(r.getAs[Long]("recall_ppm") == h.toLong * 100000L)
    }
  }
}
