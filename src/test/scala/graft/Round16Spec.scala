package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 batch A (VERDICT r15 #1): the fused portable shingle-hash
  * kernel. The portable dedup family is fully DuckDB-oracled, so the
  * rewrite MUST be hash-identical — these differentials pin the fused
  * native kernel to the r15 declarative chain bit-for-bit, on the fixture
  * corpus AND on adversarial edge strings (multibyte, surrogate pairs,
  * empty tokens, <3 tokens, duplicate shingles).
  */
class Round16Spec extends GraftSuite {
  import spark.implicits._

  /** The r15 declarative chain, verbatim: distinct 3-token shingle STRINGS
    * → rollingHash31 each → first-occurrence-distinct hashes. */
  private def declarativeDistinct(text: org.apache.spark.sql.Column) =
    array_distinct(transform(
      llm.Shingling.shingleArray(text, hashed = false)(spark),
      sh => llm.PipelineOps.rollingHash31(sh)))

  /** The r15 winnowing chain, verbatim: positional shingles, order and
    * duplicates kept. */
  private def declarativePositional(text: org.apache.spark.sql.Column) = {
    val toks = split(text, " ")
    transform(
      when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
        .otherwise(array().cast("array<int>")),
      i => llm.PipelineOps.rollingHash31(
        array_join(slice(toks, i + 1, lit(3)), " ")))
  }

  private def fused(text: org.apache.spark.sql.Column, distinct: Boolean) =
    functions.GraftExpressions.shingleRolling31(text, distinct)

  private lazy val edgeDocs: DataFrame = Seq(
    "plain ascii three token soup",
    "a b c",
    "a b",                       // < 3 tokens → empty
    "",                          // split → [""] → empty
    "x  y  z w",                 // double spaces → empty tokens
    " leading and trailing ",    // leading/trailing separators
    "dup dup dup dup dup",       // duplicate shingles collapse (distinct)
    "café naïve résumé über café naïve résumé", // multibyte, repeated run
    "😀 emoji 🚀 pair 😀 emoji 🚀", // surrogate pairs
    "mix é😀x tøkens 中文 words here too"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def assertArraysEqual(df: DataFrame, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, label: String): Unit = {
    val bad = df.select(col("doc_id"), a.as("a"), b.as("b"))
      .filter(!(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, s"$label mismatch on docs ${bad.map(_.get(0)).mkString(",")}: " +
      bad.take(2).mkString(" | "))
  }

  test("fused distinct shingle hashes == r15 declarative chain on edge strings") {
    assertArraysEqual(edgeDocs, fused(col("text"), distinct = true),
      declarativeDistinct(col("text")), "distinct edge")
  }

  test("fused positional shingle hashes == r15 declarative chain on edge strings") {
    assertArraysEqual(edgeDocs, fused(col("text"), distinct = false),
      declarativePositional(col("text")), "positional edge")
  }

  test("fused kernels == declarative chains on the full fixture corpus (planted)") {
    val docs = llm.DedupOps.plantedDocs(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")))
    assertArraysEqual(docs, fused(col("text"), distinct = true),
      declarativeDistinct(col("text")), "distinct fixture")
    assertArraysEqual(docs, fused(col("text"), distinct = false),
      declarativePositional(col("text")), "positional fixture")
  }

  test("portableSignature via fused kernel is bit-identical to the r15 declarative signature") {
    val docs = llm.DedupOps.plantedDocs(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")))
    // r15 signature, inlined verbatim (explode strings → hash → 8 mins)
    val sh = docs.select(col("doc_id"),
        explode(llm.Shingling.shingleArray(col("text"), hashed = false)(spark)).as("sh"))
      .select(col("doc_id"), llm.PipelineOps.rollingHash31(col("sh")).as("h"))
    val aggs = (0 until llm.DedupOps.PortableRows).map(j =>
      min((col("h") * lit(llm.DedupOps.PortA(j)) + lit(llm.DedupOps.PortB(j)))
        % lit(llm.DedupOps.PortP)).as(s"pm$j"))
    val old = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val now = llm.DedupOps.portableSignature(docs)
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty,
      "fused portableSignature diverged from the r15 declarative signature")
  }

  test("fused kernels == declarative chains on generator-random token soup") {
    // scalacheck-generated corpora (fixed seeds — the PropertySpec
    // discipline): mixed ASCII/multibyte tokens, random lengths 0..12
    // tokens, repeated runs, empty tokens via doubled separators
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokGen = Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)),
      Gen.oneOf("é", "中", "😀", "", "aa", "naïve"))
    val docGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val corpus = Seq(7L, 99L, 2024L).flatMap { seed =>
      Gen.listOfN(40, docGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = corpus.toDF("doc_id", "text")
    assertArraysEqual(df, fused(col("text"), distinct = true),
      declarativeDistinct(col("text")), "distinct random")
    assertArraysEqual(df, fused(col("text"), distinct = false),
      declarativePositional(col("text")), "positional random")
  }

  test("fused kernel null/empty semantics match the declarative chain") {
    val df = Seq((0L, Option("a b c d")), (1L, None), (2L, Option("")))
      .toDF("doc_id", "text")
    assertArraysEqual(df, fused(col("text"), distinct = true),
      declarativeDistinct(col("text")), "null distinct")
    assertArraysEqual(df, fused(col("text"), distinct = false),
      declarativePositional(col("text")), "null positional")
  }
}
