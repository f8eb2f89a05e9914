package graft

import org.apache.spark.sql.functions._

/** §2.11 round-8 extension ops: decontamination, PII scrub, domain mix,
  * int8 quantization. Beyond the DuckDB oracle rows (exact value match),
  * these assert the SEMANTIC contracts on planted corpora the fixtures
  * cannot exercise (a full-copy contamination, a zero-overlap doc).
  */
class PipelineOpsSpec extends GraftSuite {
  import spark.implicits._

  test("docs_quality_percentile_gate: hand fixture — threshold at ceil(n/4), ties kept, per-lang isolation") {
    import graft.llm.PipelineOps
    // lang a: 8 docs with stopword-ppm scores 0,125000,250000,...,875000
    // (i stopwords padded to 8 tokens) -> ceil(8/4)=2 -> thr = 2nd-smallest
    // = 125000; exactly the score-0 doc is dropped. lang b: all-identical
    // scores -> everyone is the threshold row -> all kept.
    def text(nStop: Int, nTot: Int) =
      (Seq.fill(nStop)("the") ++ Seq.fill(nTot - nStop)("zzz")).mkString(" ")
    val docs =
      (0 until 8).map(i => (i.toLong, text(i, 8), "a", "s", 1L)) ++
        (10 until 14).map(i => (i.toLong, text(2, 8), "b", "s", 1L))
    val tmp = TestSpark.tempDir("graft_pgate_")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = PipelineOps.queries("docs_quality_percentile_gate")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Long]("thr_ppm") == 125000L)
    assert(got(0L).getAs[Int]("kept") == 0, "bottom-quartile doc must drop")
    (1 until 8).foreach(i => assert(got(i.toLong).getAs[Int]("kept") == 1))
    (10 until 14).foreach { i =>
      assert(got(i.toLong).getAs[Int]("kept") == 1,
        "all-tied language must keep every doc")
      assert(got(i.toLong).getAs[Long]("thr_ppm") == 250000L)
    }
  }

  test("docs_temperature_resample: smaller source keeps a higher fraction; audit sums reconcile; deterministic") {
    import graft.llm.PipelineOps
    // source big: 64 docs x 16 tokens; source small: 4 docs x 16 tokens.
    // alpha=0.5 smoothing -> keep rate ∝ 1/sqrt(source tokens), so the
    // small source's keep_ppm must be strictly higher (temperature
    // flattening), and rates stay in (0, 1e6].
    def doc(id: Long, src: String) =
      (id, (0 until 16).map(j => s"w${(id * 31 + j * 7) % 97}").mkString(" "),
        "en", src, 1L)
    val docs = (0L until 64L).map(doc(_, "big")) ++
      (100L until 104L).map(doc(_, "small"))
    val tmp = TestSpark.tempDir("graft_resample_")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val run1 = PipelineOps.queries("docs_temperature_resample")(spark, tmp)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val (big, small) = (run1("big"), run1("small"))
    assert(small.getAs[Long]("keep_ppm") > big.getAs[Long]("keep_ppm"),
      "temperature flattening must favor the tail source")
    run1.values.foreach { r =>
      assert(r.getAs[Long]("keep_ppm") > 0L && r.getAs[Long]("keep_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // content-hash gate -> bit-identical on a second run
    val run2 = PipelineOps.queries("docs_temperature_resample")(spark, tmp)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("kept_id_sum")).toMap
    run1.foreach { case (s, r) =>
      assert(run2(s) == r.getAs[Long]("kept_id_sum"), s"source $s not deterministic")
    }
  }

  test("docs_decontaminate: planted full copy of a benchmark doc is flagged; disjoint doc is clean") {
    // benchmark doc (id 0 = 0 mod 50), an exact train-side copy (id 7),
    // and a train doc sharing no shingle (id 9).
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, bench),
      (7L, bench),
      (9L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    implicit val s = spark
    val sh = docs.select(col("doc_id"),
      explode(graft.llm.Shingling.shingleArray(col("text"), hashed = true)).as("h"))
    val rep = graft.llm.PipelineOps.decontaminate(sh)
      .withColumn("contaminated",
        graft.llm.PipelineOps.contaminatedFlag(col("n_hit"), col("n_shingles")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"), r.getAs[Int]("contaminated")))
      .toMap
    assert(!rep.contains(0L), "benchmark docs must not appear in the train report")
    val (n7, h7, c7) = rep(7L)
    assert(n7 == h7 && c7 == 1, s"full copy must be 100% hit + flagged, got $n7/$h7/$c7")
    val (_, h9, c9) = rep(9L)
    assert(h9 == 0L && c9 == 0, s"disjoint doc must be 0-hit + clean, got $h9/$c9")
  }

  test("docs_decontaminate fixture run: ratio in [0,1], flag consistent, benchmark excluded") {
    val rows = q("docs_decontaminate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, h, ratio, flag) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("ratio"), r.getAs[Int]("contaminated"))
      assert(id % graft.llm.PipelineOps.BenchMod != 0, s"benchmark doc $id in train report")
      assert(h >= 0 && h <= n, s"doc $id: hits $h outside [0, $n]")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id: ratio $ratio")
      assert(flag == (if (5 * h >= n) 1 else 0), s"doc $id: flag/ratio mismatch")
    }
  }

  test("text_pii_scrub: no email/phone/digit survives; phone redacts as ONE token") {
    val rows = q("text_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1,
        s"doc ${r.getAs[Long]("doc_id")}: injected email not counted")
      assert(r.getAs[Int]("n_phones") >= 1,
        s"doc ${r.getAs[Long]("doc_id")}: injected phone not counted")
      assert(r.getAs[Int]("len_scrubbed") > 0)
    }
    // re-scrub check on the FULL scrubbed text (op emits a 40-char head; the
    // invariant is asserted by recomputing the r9 augmentation + scrub —
    // 2-label email, +1-555-XXXX phone, numeric ref — in precedence order)
    val emailRe = graft.llm.PipelineOps.EmailRe.r
    val phoneRe = graft.llm.PipelineOps.PhoneRe.r
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com tel +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" ref "), col("doc_id") * 7 + 13),
          graft.llm.PipelineOps.EmailRe, "<email>"),
          graft.llm.PipelineOps.PhoneRe, "<phone>"),
          "[0-9]+", "<num>").as("scrubbed"))
      .collect()
    full.foreach { r =>
      val t = r.getAs[String]("scrubbed")
      assert(emailRe.findFirstIn(t).isEmpty, s"email survived scrub: $t")
      assert(phoneRe.findFirstIn(t).isEmpty, s"phone survived scrub: $t")
      assert(!t.exists(_.isDigit), s"digit survived scrub: $t")
      assert(t.contains("<phone>"),
        s"phone must redact as one <phone> token (PhoneRe before the digit rule): $t")
    }
  }

  test("PII patterns: 2/3/4-label emails match; phone precedence over digit runs") {
    // Direct regex contract (verdict r8 #6 done-bar): the round-8 email
    // pattern required exactly three domain labels — these cases fail it.
    val emailRe = graft.llm.PipelineOps.EmailRe.r
    Seq("a@b.co", "user@example.com", "a.b+c@mail.example.com", "a@b.c.d.e")
      .foreach { e =>
        assert(emailRe.findFirstIn(e).contains(e), s"EmailRe must match all of: $e")
      }
    assert(emailRe.findFirstIn("nodomain@bare").isEmpty,
      "dotless domain must not match")
    val phoneRe = graft.llm.PipelineOps.PhoneRe.r
    Seq("+1-555-0123", "+44-123-456").foreach { p =>
      assert(phoneRe.findFirstIn(p).contains(p), s"PhoneRe must match: $p")
    }
    // a phone inside text must scrub to ONE token, not <num>-<num>-<num>
    val scrubbed = spark.range(1).select(
      regexp_replace(regexp_replace(regexp_replace(
        lit("call +1-555-0142 now"),
        graft.llm.PipelineOps.EmailRe, "<email>"),
        graft.llm.PipelineOps.PhoneRe, "<phone>"),
        "[0-9]+", "<num>").as("t")).head.getString(0)
    assert(scrubbed == "call <phone> now", s"got: $scrubbed")
  }

  test("docs_domain_mix: ppm shares sum to ~1e6, monotone in n_docs, integer-deterministic") {
    val rows = q("docs_domain_mix").collect()
    assert(rows.length > 1)
    val ppm = rows.map(r => r.getAs[Long]("n_docs") -> r.getAs[Long]("mix_ppm"))
    val total = ppm.map(_._2).sum
    // floor-division truncation: total in (1e6 - n_sources, 1e6]
    assert(total <= 1000000L && total > 1000000L - rows.length,
      s"ppm total $total outside the floor-div band")
    // sqrt weighting is monotone: more docs never gets a smaller share
    ppm.sortBy(_._1).sliding(2).foreach {
      case Array((n1, p1), (n2, p2)) =>
        assert(n1 > n2 || p1 <= p2, s"share not monotone: ($n1,$p1) vs ($n2,$p2)")
      case _ =>
    }
  }

  test("vec_int8_quantize: reconstruction error within the int8 step bound; scales positive") {
    val rows = q("vec_int8_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, err, sc) = (r.getAs[Long]("n_vecs"), r.getAs[Long]("avg_err_p12"),
        r.getAs[Long]("avg_scale_micro"))
      assert(n > 0 && sc > 0)
      // worst case per element: (step/2)^2 with step = scale/127; for
      // L2-normalized 64-dim vectors scale <= 1, so the per-vector bound is
      // 64 * (1/254)^2 * 1e12 pico-units — generous but real
      val bound = (64.0 * math.pow(1.0 / 254.0, 2) * 1e12).toLong
      assert(err in0to(bound), s"label ${r.getAs[Int]("label")}: avg err $err > bound $bound")
    }
  }

  private implicit class LongOps(x: Long) {
    def in0to(hi: Long): Boolean = x >= 0 && x <= hi
  }

  test("docs_lm_quality_filter: flags a nonempty strict subset per multi-doc lang; NLL sane") {
    val rows = q("docs_lm_quality_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0)
      // avg NLL in micro-nats: > 0 (no bigram is certain) and < ln(corpus
      // bigram count) ~ 20 nats — a generous sanity band
      val nll = r.getAs[Long]("avg_nll_micro")
      assert(nll > 0 && nll < 20000000L, s"doc ${r.getAs[Long]("doc_id")}: avg NLL $nll")
    }
    // flagged = above the lang mean → for any lang with >1 distinct score,
    // at least one doc flagged and at least one not
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val scores = rs.map(_.getAs[Long]("avg_nll_micro")).distinct
      if (scores.length > 1) {
        val flags = rs.map(_.getAs[Int]("flagged")).toSet
        assert(flags == Set(0, 1), s"lang $lang: above-mean flag must split the docs, got $flags")
      }
    }
  }

  test("docs_split_assign: deterministic, content-keyed, all splits populated") {
    val a = q("docs_split_assign").collect()
    val b = q("docs_split_assign").collect()
    assert(a.map(_.toSeq.toList).toList == b.map(_.toSeq.toList).toList,
      "split assignment must be bit-stable across runs")
    val bySplit = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"all three splits must be populated, got $bySplit")
    // 80/10/10 by hash: train strictly dominates on any non-tiny corpus
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"), s"$bySplit")
    a.foreach { r =>
      val (bkt, sp) = (r.getAs[Int]("bucket"), r.getAs[String]("split"))
      assert(bkt >= 0 && bkt < 100)
      assert(sp == (if (bkt < 80) "train" else if (bkt < 90) "val" else "test"))
    }
  }

  test("docs_split_assign: assignment keys on content only — invariant to row order and partitioning") {
    // same corpus written in two different orders/partitionings must yield
    // the identical per-doc assignment (the property that makes the split
    // stable across re-ingestion on a real pipeline)
    val docs = (0L until 60L).map(i => (i, s"doc $i body word${i % 7} tail"))
    val t1 = TestSpark.tempDir("graft_split_a_")
    val t2 = TestSpark.tempDir("graft_split_b_")
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .coalesce(1).write.mode("overwrite").parquet(s"$t1/documents.parquet")
    scala.util.Random.shuffle(docs).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .repartition(7).write.mode("overwrite").parquet(s"$t2/documents.parquet")
    def assign(dir: String) =
      SparkEntry.queries("docs_split_assign")(spark, dir)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(assign(t1) == assign(t2),
      "split assignment changed under reordering/repartitioning")
  }

  test("docs_decontaminate: growing the benchmark set never decreases any doc's hit count") {
    implicit val s = spark
    val mk = (rows: Seq[(Long, String)]) => {
      val sh = rows.toDF("doc_id", "text").select(col("doc_id"),
        explode(graft.llm.Shingling.shingleArray(col("text"), hashed = true)).as("h"))
      graft.llm.PipelineOps.decontaminate(sh)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    }
    val train = Seq(
      (7L, "alpha beta gamma delta epsilon zeta"),
      (9L, "one two three four five six seven"))
    val benchSmall = Seq((0L, "alpha beta gamma nine ten eleven"))
    val benchBig = benchSmall :+ ((50L, "five six seven delta epsilon zeta"))
    val small = mk(train ++ benchSmall)
    val big = mk(train ++ benchBig)
    train.map(_._1).foreach { id =>
      assert(big(id) >= small(id),
        s"doc $id: n_hit dropped ${small(id)} -> ${big(id)} when the benchmark grew")
    }
    assert(big(9L) > small(9L), "the added benchmark doc shares shingles with doc 9")
  }

  test("docs_decontaminate plan: benchmark side joins as broadcast, never sort-merge") {
    // The scale contract: the benchmark n-gram universe broadcasts, so the
    // 100 TB train side is checked map-side. A SortMergeJoin here would
    // shuffle the full corpus' shingle set — the shape this op exists to
    // avoid.
    val df = q("docs_decontaminate")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-shuffling sort-merge join in the decontaminate plan:\n$plan")
  }

  test("vec_int8_quantize plan: scan prunes to the columns the op reads") {
    // vec_id is projected then dropped — column pruning must strip it from
    // the parquet ReadSchema, or the scan pays for a column nobody uses
    // (string render because AQE wraps the plan tree).
    val df = q("vec_int8_quantize")
    df.collect()
    // greedy to the LAST '>' on the line — the field types themselves
    // contain '>' (array<float>)
    val reads = """ReadSchema: struct<(.*)>""".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1)).toList
    assert(reads.nonEmpty, "no FileScan ReadSchema found in the quantize plan")
    reads.foreach { r =>
      val cols = r.split(",").map(_.takeWhile(_ != ':').trim).toSet
      assert(cols == Set("embedding", "label"),
        s"embeddings scan must read exactly (embedding,label), got $cols")
    }
  }

  test("LmNllSum edges: unknown lang, missing bigram, null element, empty array") {
    // The interpreted eval path must mirror the inner-join-plus-groupBy
    // semantics it replaced: missing LM entries contribute to neither
    // count nor sum; unknown lang yields (0,0) — the caller's
    // n_bigrams >= 1 filter then drops the doc; a NULL element nulls the
    // result (the join's isnotnull Filter dropped those rows upstream).
    // The codegen path is exercised end-to-end by the oracle row.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val lm = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    val en = new java.util.HashMap[UTF8String, java.lang.Long]()
    en.put(UTF8String.fromString("ab"), 3L)
    en.put(UTF8String.fromString("bc"), 5L)
    lm.put(UTF8String.fromString("en"), en)
    def arrLit(xs: Seq[String]): Literal =
      Literal.create(xs, ArrayType(StringType, containsNull = true))
    def run(lang: String, xs: Seq[String]): Any =
      graft.functions.LmNllSum(Literal(lang), arrLit(xs), lm).eval(null)
    def pair(a: Any): (Long, Long) = {
      val ad = a.asInstanceOf[ArrayData]
      (ad.getLong(0), ad.getLong(1))
    }
    assert(pair(run("en", Seq("ab", "bc", "ab"))) == (3L, 11L))
    assert(pair(run("en", Seq("ab", "zz", "bc"))) == (2L, 8L),
      "missing bigram must be skipped, not nulled or zero-scored")
    assert(pair(run("fr", Seq("ab", "bc"))) == (0L, 0L),
      "unknown lang must yield (0,0) so the n>=1 filter drops the doc")
    assert(pair(run("en", Seq.empty)) == (0L, 0L))
    assert(run("en", Seq("ab", null)) == null,
      "a NULL element must null the whole result")
    val nullLang = graft.functions.LmNllSum(
      Literal.create(null, StringType), arrLit(Seq("ab")), lm).eval(null)
    assert(nullLang == null, "NULL lang must propagate NULL")
  }
}
