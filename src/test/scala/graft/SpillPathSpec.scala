package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Spill-path evidence (verdict r8 #7 / r9 next-round #4): the fixtures fit
  * in memory, so no ordinary run ever exercises the agg/sort/join spill
  * machinery — the exact code a 100 TB deployment lives in. This suite
  * FORCES each spillable operator family down its spill path with the
  * runtime SQL thresholds Spark ships for this purpose and asserts
  * (a) the query completes, (b) the spill actually engaged (task spill
  * metrics or the operator's fallback-task metric), (c) the result is
  * IDENTICAL to the unforced in-memory run.
  *
  * Deliberately not `spark.memory.fraction`: that is static per
  * SparkContext (unusable in the shared test session) and memory-pressure
  * spills are nondeterministic at fixture scale; the row-count thresholds
  * drive the same UnsafeExternalSorter / UnsafeKVExternalSorter spill code
  * deterministically. Thresholds are small-but-not-1: a 1-row threshold
  * writes one spill file per row, and every open spill reader costs a
  * fixed 1 MB buffer at merge — measured OOMing the 8 GB test JVM on the
  * multi-join iterative op — so each test uses the smallest threshold its
  * op survives; the spill code exercised is identical at any threshold.
  */
class SpillPathSpec extends GraftSuite {

  /** Sum of (memory, disk) bytes spilled across all tasks during `body`. */
  private def spilledDuring(body: => Unit): (Long, Long) = {
    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // task-end events are posted async; poll until the totals go quiet
      var last = (-1L, -1L)
      var cur = (mem.get(), disk.get())
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (cur != last && System.nanoTime() < deadline) {
        last = cur
        Thread.sleep(200)
        cur = (mem.get(), disk.get())
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Canonical sorted render of a query result for cross-run equality. */
  private def rendered(name: String): Seq[String] =
    q(name).collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def assertSpillsAndMatches(name: String, confs: (String, String)*): Unit = {
    val expected = rendered(name) // unforced in-memory run
    var got: Seq[String] = null
    val (memB, diskB) = spilledDuring {
      withConfs(confs: _*) { got = rendered(name) }
    }
    assert(got == expected,
      s"$name: spill path changed the result (${got.size} vs ${expected.size} rows)")
    assert(memB + diskB > 0,
      s"$name: no spill recorded (mem=$memB disk=$diskB) — thresholds did not engage")
    info(s"$name: spilled mem=$memB disk=$diskB bytes, ${expected.size} rows identical")
  }

  test("window spill: win_running_sum identical with 4-row buffer threshold") {
    assertSpillsAndMatches("win_running_sum",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4")
  }

  test("hash-agg fallback: agg_pricing_summary identical when the hash map is evicted") {
    // testFallbackStartsAt=(0,0): HashAggregateExec destructs its map into an
    // UnsafeKVExternalSorter immediately and finishes sort-based — the exact
    // path an at-scale agg takes when executor memory fills.
    assertSpillsAndMatches("agg_pricing_summary",
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "0, 0")
  }

  test("sort-merge join buffer spill: multi-row match groups spill and join correctly") {
    // join_sortmerge buffers its RIGHT side (orders), whose key is unique —
    // 1-row match groups never buffer, so that registry op cannot spill by
    // construction. This probe drives the SAME ExternalAppendOnlyUnsafeRowArray
    // spill code with the sides flipped: lineitem buffered (~4 rows per
    // orderkey at any SF), 2-row threshold.
    def smj = {
      val tt = (n: String) => Tables.load(spark, sfDir, n)
      tt("orders").hint("merge")
        .join(tt("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
    }
    val expected = smj.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    var got: Seq[String] = null
    val (memB, diskB) = spilledDuring {
      withConfs(
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "2",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2",
        // keep it an SMJ: AQE would rewrite the small side to broadcast
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        got = smj.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      }
    }
    assert(got == expected, "SMJ spill path changed the join result")
    assert(memB + diskB > 0,
      s"SMJ buffer never spilled (mem=$memB disk=$diskB) — match groups did not exceed the threshold")
    info(s"smj probe: spilled mem=$memB disk=$diskB bytes, ${expected.size} groups identical")
  }

  test("object-hash-agg fallback: agg_sorted_collect identical at fallbackThreshold=1") {
    // collect_list aggs run ObjectHashAggregateExec; threshold=1 forces the
    // sort-based fallback after one hash-map entry. The fallback sorter only
    // writes to DISK under real memory pressure, so the engagement evidence
    // is the operator's own numTasksFallBacked metric (AQE disabled for this
    // run so the executed tree is directly introspectable).
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    val expected = rendered("agg_sorted_collect")
    withConfs(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = q("agg_sorted_collect")
      val got = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      assert(got == expected, "object-hash-agg fallback changed the result")
      val fallbackTasks = df.queryExecution.executedPlan.collect {
        case o: ObjectHashAggregateExec =>
          o.metrics.get("numTasksFallBacked").map(_.value).getOrElse(0L)
      }.sum
      assert(fallbackTasks > 0,
        s"no task fell back to sort-based aggregation (numTasksFallBacked=$fallbackTasks)")
      info(s"agg_sorted_collect: $fallbackTasks tasks fell back, ${expected.size} rows identical")
    }
  }

  test("multi-shuffle iterative op under agg eviction: dedup_components identical") {
    // The iterative connected-components op (joins + aggs + checkpoints per
    // round) with every hash aggregate evicted to sort-based — the closest
    // local[4] gets to a memory-starved 1000-executor stage. Buffer
    // thresholds stay default here: a per-row spill file across O(log n)
    // iterations OOMs the test JVM (see header), while the agg fallback
    // spills bounded sorter runs every stage. Fallback at 64 entries, not
    // 0: immediate fallback across this op's ~10 stages × tasks floods the
    // heap with spill-file reader buffers (and once tripped a JDK
    // FileChannel close race — NativeThreadSet AIOOBE); 64 drives the
    // identical eviction code with a survivable file count. The wider
    // shuffle bounds spill files PER TASK (each open spill reader costs a
    // fixed 1 MB buffer at merge — the at-scale sizing rule this suite
    // exists to evidence); the op's output is partitioning-invariant.
    // the candidate-pair artifact memo would otherwise serve the forced run
    // from parquet and move the spill-heavy build OUT of the measured block
    // — clear it so the full build + CC iterations run under eviction
    val expected = rendered("dedup_components")
    llm.TextOps.clearCandidateArtifacts()
    var got: Seq[String] = null
    val (memB, diskB) = spilledDuring {
      withConfs(
        "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "16, 64",
        "spark.sql.shuffle.partitions" -> "32") {
        got = rendered("dedup_components")
      }
    }
    assert(got == expected,
      s"dedup_components: spill path changed the result (${got.size} vs ${expected.size} rows)")
    assert(memB + diskB > 0,
      s"dedup_components: no spill recorded (mem=$memB disk=$diskB) — thresholds did not engage")
    info(s"dedup_components: spilled mem=$memB disk=$diskB bytes, ${expected.size} rows identical")
  }

  test("global top-k under agg fallback: limit_topk_global identical") {
    // TakeOrderedAndProject itself never spills (k rows per partition by
    // construction — that is WHY it is the scale-safe global-topk plan);
    // the evidence here is that the op survives upstream agg eviction.
    val expected = rendered("limit_topk_global")
    var got: Seq[String] = null
    val (memB, diskB) = spilledDuring {
      withConfs("spark.sql.TungstenAggregate.testFallbackStartsAt" -> "0, 0") {
        got = rendered("limit_topk_global")
      }
    }
    assert(got == expected, s"limit_topk_global diverged under agg fallback")
    info(s"limit_topk_global: mem=$memB disk=$diskB (TakeOrdered itself is bounded, no spill required)")
  }
}
