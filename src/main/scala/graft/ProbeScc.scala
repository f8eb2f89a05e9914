package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY profiling main for stream_cc_maintain (r19 optimization round;
  * deleted before commit). Times the op's phases separately. */
object ProbeScc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.GraftOptimizations.install(spark)
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"[probe] === rep $rep ===")
      val docs = time("docs.localCheckpoint") {
        graft.llm.DedupOps.plantedStreamDocs(
          Tables.load(spark, sfDir, "documents").select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism))
          .localCheckpoint()
      }
      val base = s"/tmp/graft_probe_scc"
      org.apache.spark.network.util.JavaUtils.deleteRecursively(new java.io.File(base))
      time("edges build+write") {
        graft.llm.DedupOps.plantedJaccardEdges(spark, docs)
          .write.mode("overwrite").parquet(s"$base/edges")
      }
      val edges = spark.read.parquet(s"$base/edges")
      time("base CC build+write") {
        val isBatch = (c: org.apache.spark.sql.Column) => pmod(c, lit(10L)) === 7
        val baseNodes = docs.filter(!isBatch(col("doc_id")))
          .select(col("doc_id").as("node"))
        val baseEdges = edges.filter(!isBatch(col("a")) && !isBatch(col("b")))
        graft.llm.DedupOps.connectedComponents(baseNodes, baseEdges)._1
          .select(col("node").as("doc_id"), col("label"))
          .write.mode("overwrite").parquet(s"$base/labels/v0")
      }
      time("3x ccProcessWave direct") {
        val isBatch = (c: org.apache.spark.sql.Column) => pmod(c, lit(10L)) === 7
        val batchDocs = docs.filter(isBatch(col("doc_id"))).select("doc_id")
        for (w <- 0L until 3L) {
          val wave = batchDocs.filter(pmod(col("doc_id"), lit(3L)) === w)
          time(s"  wave $w") {
            graft.streaming.Streaming.ccProcessWave(spark, base, edges, wave, w)
          }
        }
      }
      // timed replay of ccProcessWave's pieces for wave 1 (the checkpoint
      // wave) against the state waves 0 already landed
      time("wave-1 pieces") {
        import graft.llm.DedupOps
        import org.apache.spark.sql.{Column, DataFrame}
        val batchId = 1L
        def ccIsBatch(c: Column): Column = pmod(c, lit(10L)) === 7
        def ccWaveOf(c: Column): Column =
          when(!ccIsBatch(c), lit(-1L)).otherwise(pmod(c, lit(3L)))
        def foldDelta(lab: DataFrame, w: Long): DataFrame = {
          val wave = spark.read.parquet(s"$base/labels/delta/b$w/wave")
          val rel = spark.read.parquet(s"$base/labels/delta/b$w/relabel")
            .withColumnRenamed("old_label", "label")
          lab.unionByName(wave)
            .join(broadcast(rel), Seq("label"), "left")
            .select(col("doc_id"),
              coalesce(col("new_label"), col("label")).as("label"))
        }
        val batch = docs.filter(ccIsBatch(col("doc_id"))).select("doc_id")
          .filter(pmod(col("doc_id"), lit(3L)) === batchId)
        val store = time("  served+ckpt") {
          foldDelta(spark.read.parquet(s"$base/labels/v0"), 0L).localCheckpoint()
        }
        val waveDocs = batch.select("doc_id").distinct()
        val newEdges = edges.filter(
          greatest(ccWaveOf(col("a")), ccWaveOf(col("b"))) === batchId)
        val ce0 = newEdges
          .join(store.select(col("doc_id").as("a"), col("label").as("la")), Seq("a"), "left")
          .join(store.select(col("doc_id").as("b"), col("label").as("lb")), Seq("b"), "left")
        val touchedLabels = ce0.select(col("la").as("node"))
          .unionByName(ce0.select(col("lb").as("node")))
          .filter(col("node").isNotNull).distinct()
        val ce = ce0
          .select(coalesce(col("la"), col("a")).as("u"), coalesce(col("lb"), col("b")).as("v"))
          .filter(col("u") =!= col("v"))
          .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b")).distinct()
        val touched = ce.select(col("a").as("node"))
          .union(ce.select(col("b").as("node"))).distinct()
        val (subLab, rounds) = time("  sub-CC") {
          val r = DedupOps.connectedComponents(
            waveDocs.select(col("doc_id").as("node")).union(touched).distinct(), ce)
          r._1.count(); r
        }
        println(s"[probe]   sub-CC rounds: $rounds")
        val waveOut = waveDocs.join(subLab, col("doc_id") === col("node"))
          .select(col("doc_id"), col("label"))
        val relabel = subLab.join(touchedLabels, Seq("node"))
          .filter(col("node") =!= col("label"))
          .select(col("node").as("old_label"), col("label").as("new_label"))
        time("  delta writes") {
          waveOut.repartition(1).write.mode("overwrite")
            .parquet(s"$base/labels/delta/b$batchId/wave")
          relabel.repartition(1).write.mode("overwrite")
            .parquet(s"$base/labels/delta/b$batchId/relabel")
        }
        val landedRelabel = spark.read.parquet(s"$base/labels/delta/b$batchId/relabel")
        val folded = foldDelta(store, batchId).localCheckpoint(false)
        time("  receipt write") {
          waveDocs.agg(
              coalesce(max(pmod(col("doc_id"), lit(3L))), lit(batchId)).as("wave"),
              count(lit(1)).as("n_batch"))
            .crossJoin(newEdges.agg(count(lit(1)).as("n_edges_new")))
            .crossJoin(store.join(
                landedRelabel.select(col("old_label").as("label")), Seq("label"))
              .agg(count(lit(1)).as("n_relabeled")))
            .crossJoin(folded.agg(countDistinct(col("label")).as("n_components")))
            .crossJoin(spark.read.parquet(s"$base/labels/delta/b$batchId/wave")
              .agg(count(lit(1)).as("nw"))
              .crossJoin(landedRelabel.agg(count(lit(1)).as("nr")))
              .select((col("nw") + col("nr")).as("n_delta_rows")))
            .write.mode("overwrite").parquet(s"$base/log/b$batchId")
        }
        time("  ckpt write") {
          folded.write.mode("overwrite").parquet(s"$base/labels/v${batchId + 1L}")
        }
      }
      time("FULL streamCcMaintain") {
        Bench.materialize(SparkEntry.queries("stream_cc_maintain")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
