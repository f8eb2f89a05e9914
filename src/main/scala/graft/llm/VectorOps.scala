package graft.llm

import graft.OpRegistry
import graft.Helpers._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.11 similarity search + multimodal operators.
  *
  * Determinism design: float dot products are sensitive to summation order
  * and engine float-promotion rules, so the scored kernel quantizes each
  * embedding element to integer micro-units (floor(x*1e6+0.5) — same IEEE
  * formula both engines) and sums 64-bit integer products: exact,
  * order-independent, hash-stable. Embeddings are L2-normalized
  * (FIXTURES.md) so the quantized dot is cosine * 1e12 within ~1e-4.
  *
  * Scale design: the brute-force kernel is the correctness baseline over a
  * bounded query set; `knn_ivf_topk` is the 100 TB path — a coarse inverted
  * index (sign-bit LSH cells) prunes candidates before exact re-ranking.
  */
object VectorOps extends OpRegistry {

  /** embedding -> array<long> of micro-unit quantized elements. */
  private def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1e6) + lit(0.5)))

  /** exact integer dot product of two quantized vectors. */
  private def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir)("embeddings").select(col("vec_id"), quantize(col("embedding")).as("qe"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qe").as("qv"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"), dotQ(col("qv"), col("qe")).as("dot_q"))
      val w = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("vid"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vid"), col("dot_q"),
          r4(col("dot_q").cast("double") / lit(1e12)).as("cos4"),
          col("rn").cast("int").as("rn"))
        .orderBy("qid", "rn")
    }),

    "sim_threshold_pairs" -> ((s, dir) => {
      val e = t(s, dir)("embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"), quantize(col("embedding")).as("qe"))
      val a = e.select(col("vec_id").as("id1"), col("qe").as("q1"))
      val b = e.select(col("vec_id").as("id2"), col("qe").as("q2"))
      a.join(broadcast(b), col("id1") < col("id2"))
        .select(col("id1"), col("id2"), dotQ(col("q1"), col("q2")).as("dot_q"))
        .filter(col("dot_q") > 250000000000L)
        .select(col("id1"), col("id2"), col("dot_q"),
          r4(col("dot_q").cast("double") / lit(1e12)).as("cos4"))
        .orderBy("id1", "id2")
    }),

    "vec_norm_stats" -> ((s, dir) => {
      val e = t(s, dir)("embeddings")
        .withColumn("qe", quantize(col("embedding")))
        .withColumn("sumsq_q", dotQ(col("qe"), col("qe")))
        .withColumn("norm_q",
          floor(sqrt(col("sumsq_q").cast("double") / lit(1e12)) * lit(1e6) + lit(0.5)))
      e.groupBy("label")
        .agg(count(lit(1)).as("cnt"),
          sum(col("norm_q")).as("sum_norm_q"),
          min(size(col("embedding"))).as("dim_min"),
          max(size(col("embedding"))).as("dim_max"))
        .withColumn("mean_norm",
          r6(col("sum_norm_q").cast("double") / col("cnt") / lit(1e6)))
        .orderBy("label")
    }),

    "multimodal_join" -> ((s, dir) => {
      val tt = t(s, dir) _
      tt("documents").join(tt("embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
          size(col("embedding")).as("dim"),
          sha2(col("text"), 256).as("text_sha"))
        .orderBy("doc_id")
    }),

    "multimodal_label_text" -> ((s, dir) => {
      val tt = t(s, dir) _
      val j = tt("documents").join(tt("embeddings"), col("doc_id") === col("vec_id"))
        .select("doc_id", "lang", "n_chars", "label")
      val perLabel = j.groupBy("label")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      val langCnt = j.groupBy("label", "lang").agg(count(lit(1)).as("lcnt"))
      val w = Window.partitionBy("label").orderBy(col("lcnt").desc, col("lang"))
      val dom = langCnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("label").as("label2"), col("lang").as("dom_lang"))
      perLabel.join(dom, col("label") === col("label2")).drop("label2")
        .select(col("label"), col("cnt"), col("sum_chars"),
          r4(col("sum_chars").cast("double") / col("cnt")).as("avg_chars"),
          col("dom_lang"))
        .orderBy("label")
    }),

    "knn_ivf_topk" -> ((s, dir) => {
      // Scale path (no oracle; unit-tested for recall vs brute force):
      // coarse cells from the sign bits of 8 fixed pseudo-random projections
      // (deterministic hash-derived planes), exact quantized re-rank within
      // the query's cell plus Hamming-1 neighbor cells.
      val e = t(s, dir)("embeddings").select(col("vec_id"), quantize(col("embedding")).as("qe"))
      // projection p (0..7): pseudo-plane component for dim i is
      // ((xxhash64(p, i) % 1001) - 500) — deterministic, zero-mean.
      def cellOf(qe: Column): Column = {
        val bits = (0 until 8).map { p =>
          val proj = aggregate(
            zip_with(qe, sequence(lit(0), lit(63)),
              (x, i) => x * ((xxhash64(lit(p), i) % 1001) - 500)),
            lit(0L), (acc, x) => acc + x)
          when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }
      val cells = e.withColumn("cell", cellOf(col("qe")))
      val q = cells.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("qe").as("qv"), col("cell").as("qcell"))
      // candidate cells: exact cell + 8 Hamming-1 flips
      val qx = q.withColumn("cand_cell",
        explode(array(col("qcell") +: (0 until 8).map(b =>
          col("qcell").bitwiseXOR(lit(1L << b))): _*)))
      val scored = broadcast(qx).join(cells,
          col("cand_cell") === col("cell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"), dotQ(col("qv"), col("qe")).as("dot_q"))
        .dropDuplicates("qid", "vid")
      val w = Window.partitionBy("qid").orderBy(col("dot_q").desc, col("vid"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vid"), col("dot_q"), col("rn").cast("int").as("rn"))
        .orderBy("qid", "rn")
    }),

    "multimodal_features" -> ((s, dir) => {
      // Multimodal plumbing (no oracle; unit-tested): binary payload column
      // + typed metadata struct + per-partition batched "decode". The real
      // image/audio decode is STUBBED (container has no codec libs) with a
      // deterministic byte-statistics extractor; schema, partitioning and
      // batch shape are the real Spark surface a decode UDF would use.
      val src = t(s, dir)("documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
      import s.implicits._
      val decoded = src
        .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
        .as[(Long, Array[Byte], String)]
        .mapPartitions { it =>
          it.map { case (id, bytes, lang) =>
            // stubbed "decode": byte stats stand in for pixel stats
            val n = bytes.length
            val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
            val checksum = bytes.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
            (id, lang, n, sum, checksum)
          }
        }
        .toDF("doc_id", "lang", "n_bytes", "byte_sum", "checksum")
      decoded.orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_cosine_topk" -> s"""
      WITH q AS (SELECT vec_id, list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qe
                 FROM embeddings),
      e AS (SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS i FROM q),
      d AS (SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot_q
            FROM e a JOIN e b ON a.i = b.i
            WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      r AS (SELECT qid, vid, dot_q,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot_q DESC, vid) AS rn
            FROM d)
      SELECT qid, vid, dot_q, ${r4Sql("CAST(dot_q AS DOUBLE) / 1000000000000")} AS cos4,
             CAST(rn AS INT) AS rn
      FROM r WHERE rn <= 5 ORDER BY qid, rn""",
    "sim_threshold_pairs" -> s"""
      WITH q AS (SELECT vec_id, list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qe
                 FROM embeddings WHERE vec_id < 100),
      e AS (SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS i FROM q),
      d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, SUM(a.v * b.v) AS dot_q
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
      SELECT id1, id2, dot_q, ${r4Sql("CAST(dot_q AS DOUBLE) / 1000000000000")} AS cos4
      FROM d WHERE dot_q > 250000000000 ORDER BY id1, id2""",
    "vec_norm_stats" -> s"""
      WITH q AS (SELECT vec_id, label, embedding, list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qe
                 FROM embeddings),
      n AS (SELECT vec_id, label, len(embedding) AS dim,
                   CAST(floor(sqrt(CAST(list_sum(list_transform(qe, v -> v * v)) AS DOUBLE)
                     / 1000000000000) * 1000000 + 0.5) AS BIGINT) AS norm_q
            FROM q)
      SELECT label, COUNT(1) AS cnt, SUM(norm_q) AS sum_norm_q,
             CAST(MIN(dim) AS INT) AS dim_min, CAST(MAX(dim) AS INT) AS dim_max,
             ${r6Sql("CAST(SUM(norm_q) AS DOUBLE) / COUNT(1) / 1000000")} AS mean_norm
      FROM n GROUP BY label ORDER BY label""",
    "multimodal_join" -> """
      SELECT doc_id, lang, n_chars, label,
             CAST(len(embedding) AS INT) AS dim, sha256(text) AS text_sha
      FROM documents JOIN embeddings ON doc_id = vec_id
      ORDER BY doc_id""",
    "multimodal_label_text" -> s"""
      WITH j AS (SELECT doc_id, lang, n_chars, label
                 FROM documents JOIN embeddings ON doc_id = vec_id),
      per_label AS (SELECT label, COUNT(1) AS cnt, SUM(n_chars) AS sum_chars
                    FROM j GROUP BY label),
      lc AS (SELECT label, lang, COUNT(1) AS lcnt FROM j GROUP BY label, lang),
      dom AS (SELECT label, lang AS dom_lang FROM (
                SELECT label, lang, ROW_NUMBER() OVER (PARTITION BY label
                       ORDER BY lcnt DESC, lang) AS rn FROM lc)
              WHERE rn = 1)
      SELECT p.label, p.cnt, p.sum_chars,
             ${r4Sql("CAST(p.sum_chars AS DOUBLE) / p.cnt")} AS avg_chars,
             dom.dom_lang
      FROM per_label p JOIN dom ON p.label = dom.label
      ORDER BY p.label""",
  )
}
