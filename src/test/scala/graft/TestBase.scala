package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local test session (same mandatory configs as Verify/Bench). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Shared tmp-fixture factory (ADVICE r11: per-suite
    * Files.createTempDirectory fixtures were never deleted, accumulating
    * tmp garbage across runs). Every dir created here is recursively
    * removed by one JVM shutdown hook. */
  private val tmpDirs = scala.collection.mutable.ListBuffer[java.nio.file.Path]()
  private lazy val hook: Unit = sys.addShutdownHook {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    tmpDirs.synchronized(tmpDirs.toList).foreach { d =>
      try Files.walk(d).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () }
    }
  }
  def tempDir(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.synchronized(tmpDirs += p)
    p.toString
  }
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sfDir: String = TestSpark.sfDir
  def q(name: String) = SparkEntry.queries(name)(spark, sfDir)
}
