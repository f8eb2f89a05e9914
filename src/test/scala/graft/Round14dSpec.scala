package graft

import org.apache.spark.sql.functions._

/** Round-14 batches D+E: prefix dedup, cross-doc boilerplate spans,
  * PQ distortion diagnostics, byte entropy, k-core peel, reciprocity.
  */
class Round14dSpec extends GraftSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = TestSpark.tempDir("graft_r14d_docs_")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_prefix: 40-char prefix clusters; canonical is min doc_id") {
    val shared = ("x" * 40)
    val dir = writeDocs(Seq(
      (5L, shared + " tail one", "en", "s0"),
      (3L, shared + " different tail", "en", "s0"),
      (7L, "y" * 50, "en", "s0")))
    val out = SparkEntry.queries("dedup_prefix")(spark, dir).collect()
    assert(out.length === 1)
    assert((out(0).getAs[Long]("n_docs"), out(0).getAs[Long]("canonical_doc"))
      === ((2L, 3L)))
  }

  test("docs_boilerplate_spans: df>=5 is boilerplate, df=4 is not") {
    // "a b c" appears in docs 1..5 (df 5, boilerplate); "d e f" in 1..4
    // (df 4, clean). Each doc is exactly one trigram.
    val rows = (1L to 5L).map(i => (i, "a b c", "en", "s0")) ++
      (11L to 14L).map(i => (i, "d e f", "en", "s1"))
    val dir = writeDocs(rows)
    val out = SparkEntry.queries("docs_boilerplate_spans")(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_boiler_hits"), r.getAs[Long]("boiler_ppm"))).toSeq
    assert(out === Seq(("s0", 5L, 5L, 1000000L), ("s1", 4L, 0L, 0L)))
  }

  test("vec_pq_distortion: per-subspace rollup reconciles with vec_pq_codes") {
    val codes = q("vec_pq_codes").agg(
      sum("qerr").as("tot"), count(lit(1)).as("n")).collect()(0)
    val dist = q("vec_pq_distortion").agg(
      sum("sum_qerr").as("tot"), max("n_vecs").as("n"),
      min("n_vecs").as("n2")).collect()(0)
    // every subspace covers every vector; total err identical by identity
    assert(dist.getAs[Long]("n") === codes.getAs[Long]("n"))
    assert(dist.getAs[Long]("n2") === codes.getAs[Long]("n"))
    assert(dist.getAs[Long]("tot") === codes.getAs[Long]("tot"))
  }

  test("multimodal_bytes_entropy: one-symbol blob => 0; two equal halves => ln 2") {
    val dir = writeDocs(Seq(
      (1L, "aaaaaaaa", "mono", "s0"),
      (2L, "aaaabbbb", "duo", "s0")))
    val out = SparkEntry.queries("multimodal_bytes_entropy")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("entropy6"))).toMap
    assert(out("mono") === ((8L, 0.0)))
    // ln 2 = 0.693147..., micro-nat floor-quantized then r6
    assert(math.abs(out("duo")._2 - 0.693147) < 1e-5)
    assert(out("duo")._1 === 8L)
  }

  test("kcorePeel kernel: triangle survives k=2, pendant chain peels") {
    // triangle 1-2-3 plus pendant path 3-4-5
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val dir2 = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = operators.Profiling.kcorePeel(dir2, k = 2, rounds = 3)
      .select("src").distinct().as[Long].collect().toSet
    assert(core === Set(1L, 2L, 3L))
  }

  test("graph_reciprocity: mutual arcs count, one-way arcs don't") {
    val dir = TestSpark.tempDir("graft_r14d_rec_")
    // order 1: supp nation 0 -> cust nation 1; order 2: 1 -> 0 (mutual);
    // order 3: 0 -> 2 (one-way)
    Seq((1L, 10L), (2L, 11L), (3L, 10L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 20L), (2L, 21L), (3L, 22L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((20L, 1), (21L, 0), (22L, 2)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("graph_reciprocity")(spark, dir)
      .collect().map(r => (r.getAs[Long]("nation"), r.getAs[Long]("out_deg"),
        r.getAs[Long]("n_recip"), r.getAs[Long]("recip_ppm"))).toSeq
    assert(out === Seq((0L, 2L, 1L, 500000L), (1L, 1L, 1L, 1000000L)))
  }
}
