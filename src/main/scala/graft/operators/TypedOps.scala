package graft.operators

import graft.OpRegistry
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Row shape for the typed pipeline (top-level for encoder derivation). */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

/** Typed aggregation buffer: exact cent sum + count. */
case class CentsCount(cents: Long, n: Long)

/** §2.12 typed Dataset surface: case-class `Encoder`s, typed lambda
  * filter, `groupByKey`, and a typed `Aggregator` — the `Dataset[T]` API
  * the engine offers where compile-time row types help. Semantically the
  * op is an exact per-customer cent aggregation, so it oracles like any
  * relational query; the point is the API path (KeyValueGroupedDataset →
  * typed Aggregator with a product-encoder buffer), which still compiles
  * to the same partial+final hash aggregate — typed API costs encoder
  * serialization in the lambdas but not a different plan shape.
  */
object TypedOps extends OpRegistry {

  private val centsAgg: Aggregator[OrderRow, CentsCount, CentsCount] =
    new Aggregator[OrderRow, CentsCount, CentsCount] {
      def zero: CentsCount = CentsCount(0L, 0L)
      def reduce(b: CentsCount, a: OrderRow): CentsCount =
        CentsCount(b.cents + math.floor(a.o_totalprice * 100 + 0.5).toLong, b.n + 1)
      def merge(x: CentsCount, y: CentsCount): CentsCount =
        CentsCount(x.cents + y.cents, x.n + y.n)
      def finish(r: CentsCount): CentsCount = r
      def bufferEncoder: Encoder[CentsCount] = Encoders.product[CentsCount]
      def outputEncoder: Encoder[CentsCount] = Encoders.product[CentsCount]
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_agg_orders" -> ((s, dir) => {
      import s.implicits._
      val ds = t(s, dir)("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice").as[OrderRow]
      ds.filter(o => o.o_totalprice > 0)
        .groupByKey(_.o_custkey)
        .agg(centsAgg.toColumn.name("cc"))
        .toDF("o_custkey", "cc")
        .select(col("o_custkey"), col("cc.cents").as("sum_cents"),
          col("cc.n").as("n_orders"))
        .orderBy("o_custkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "typed_agg_orders" -> """
      SELECT o_custkey,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
             COUNT(1) AS n_orders
      FROM orders WHERE o_totalprice > 0
      GROUP BY o_custkey ORDER BY o_custkey""",
  )
}
