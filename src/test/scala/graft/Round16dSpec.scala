package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-16 batch D: stream_dedup_bands — continuous-ingestion near-dup
  * admission (the streaming deployment of dedup_incremental_bands'
  * nightly loop). The contracts under test:
  *
  *  1. WAVE ORDER: the mtime-staged files really replay as micro-batches
  *     0,1,2 in wave order — proven by the cross-wave duplicate, whose
  *     admission/rejection DIRECTION depends on order.
  *  2. CUMULATIVE STORE: wave N+1 is probed against the store INCLUDING
  *     wave N's admissions (a batch-vs-batch dup rejects), not just the
  *     base corpus.
  *  3. BATCH-TWIN EQUALITY: the streaming receipts equal a plain batch
  *     replay of the three admission rounds — on a hand corpus with known
  *     duplicates AND on the sf0.001 planted fixture universe (the same
  *     equality the DuckDB oracle asserts at the driver gate).
  */
class Round16dSpec extends GraftSuite {
  import spark.implicits._

  /** 10 disjoint tokens per doc: no shared trigrams across distinct docs,
    * so the ONLY near-dup signal is a verbatim text copy. */
  private def soup(i: Int): String =
    ('a' to 'j').map(c => s"t$i$c").mkString(" ")

  /** Plain batch replay of the three admission rounds — the ground-truth
    * twin the streaming kernel must reproduce exactly. */
  private def replay(docs: DataFrame): Seq[(Long, Long, Long, Long, Long)] = {
    val keys = llm.DedupOps.portableBands(llm.DedupOps.portableSignature(docs))
      .localCheckpoint()
    var store = keys.filter(pmod(col("doc_id"), lit(10L)) =!= 7)
      .select("band", "bh").distinct().localCheckpoint()
    (0 until 3).map { w =>
      val waveDocs = docs
        .filter(pmod(col("doc_id"), lit(10L)) === 7 &&
          pmod(col("doc_id"), lit(3L)) === w)
        .select("doc_id")
      val waveKeys = keys.join(waveDocs, Seq("doc_id"), "left_semi")
      val rejected = waveKeys.join(store, Seq("band", "bh"), "left_semi")
        .select("doc_id").distinct()
      val admitted = waveDocs.join(rejected, Seq("doc_id"), "left_anti")
      store = store.unionByName(
          waveKeys.join(admitted, Seq("doc_id"), "left_semi")
            .select("band", "bh")).distinct().localCheckpoint()
      (w.toLong, waveDocs.count(), rejected.count(), admitted.count(),
        store.count())
    }
  }

  private def receipts(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select("wave", "n_batch", "n_rejected", "n_admitted", "n_store_after")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  private lazy val handCorpus: DataFrame = {
    // ids 0..59; batch = {7,17,27,37,47,57}, waves 1,2,0,1,2,0.
    // doc 27 (wave 0) copies BASE doc 3  -> rejected by the landed store.
    // doc 17 (wave 2) copies BATCH doc 57 (wave 0) -> rejected ONLY
    //   because wave 0's admission re-landed 57's bands (the cumulative
    //   path; with store-only probing it would admit).
    (0 until 60).map { i =>
      val text = i match {
        case 27 => soup(3)
        case 17 => soup(57)
        case _  => soup(i)
      }
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("hand corpus: wave order, cumulative store, known dup directions") {
    val got = receipts(streaming.Streaming.streamBandAdmission(spark, handCorpus))
    val expected = replay(handCorpus)
    assert(got == expected, s"streaming receipts $got != batch replay $expected")
    // pin the semantics, not just self-consistency:
    val byWave = got.map(r => r._1 -> r).toMap
    assert(byWave(0L)._2 == 2 && byWave(0L)._3 == 1 && byWave(0L)._4 == 1,
      s"wave 0 should reject {27} and admit {57}: ${byWave(0L)}")
    assert(byWave(1L)._2 == 2 && byWave(1L)._3 == 0 && byWave(1L)._4 == 2,
      s"wave 1 should admit both {7, 37}: ${byWave(1L)}")
    assert(byWave(2L)._2 == 2 && byWave(2L)._3 == 1 && byWave(2L)._4 == 1,
      s"wave 2 should reject the cross-wave copy {17}: ${byWave(2L)}")
    // the store only ever grows, by exactly the admitted docs' new bands
    assert(got.map(_._5) == got.map(_._5).sorted, s"store must not shrink: $got")
  }

  test("re-run determinism: a second full run reproduces identical receipts") {
    // the kernel scrubs and rebuilds its appId-keyed scratch (keys, store
    // chain, staged waves, checkpoint) on every invocation, so bench reps
    // and driver re-runs must land on the same receipts bit-for-bit
    val first = receipts(streaming.Streaming.streamBandAdmission(spark, handCorpus))
    val second = receipts(streaming.Streaming.streamBandAdmission(spark, handCorpus))
    assert(first == second, s"re-run diverged: $first vs $second")
  }

  test("sf0.001 fixture: streaming receipts equal the batch replay") {
    val universe = llm.DedupOps.plantedStreamDocs(
      graft.Tables.load(spark, sfDir, "documents").select("doc_id", "text"))
    val got = receipts(q("stream_dedup_bands"))
    assert(got.size == 3, s"expected 3 wave receipts, got $got")
    assert(got == replay(universe), "streaming receipts != batch replay")
    got.foreach { r =>
      assert(r._3 + r._4 == r._2, s"rejected + admitted != batch size: $r")
    }
  }
}
