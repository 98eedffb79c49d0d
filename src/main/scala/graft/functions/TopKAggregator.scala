package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF (the §2.B UDAF surface as a first-class operator):
  * exact per-group top-k as an `Aggregator`, the reference's stateful-stage
  * idiom (`/root/reference/src/lib.rs:140-187` — user state folded per
  * element) rendered as Spark's typed aggregation.
  *
  * Why an Aggregator and not a window: `row_number() <= k` sorts (or
  * WindowGroupLimit-prunes) each partition; this buffer keeps AT MOST k
  * entries per group through both the partial and merge phases —
  * O(groups·k) state, no per-group sort of the full data, map-side
  * combining for free (planned as ObjectHashAggregate). At 100 TB that is
  * the difference between shuffling every row of a hot group and shuffling
  * k rows per (partition, group).
  *
  * Ties break on ascending id so the result is total-order deterministic —
  * the same (value DESC, id ASC) order the oracle's window uses.
  */
final class TopKAggregator[I](k: Int, f: I => (Double, Long))
    extends Aggregator[I, Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    // buf is sorted best-first and at most k long; insertion keeps both.
    if (buf.length >= k && better(buf.last, v)) buf
    else {
      val (pre, post) = buf.span(better(_, v))
      (pre :+ v) ++ post.take(k - pre.length - 1)
    }
  }

  def zero: Seq[(Double, Long)] = Vector.empty
  def reduce(buf: Seq[(Double, Long)], in: I): Seq[(Double, Long)] =
    insert(buf, f(in))
  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

object TopKAggregator {

  /** Per-event_type top-k (value, event_id) via the custom Aggregator. */
  def topKPerType(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopKAggregator[(String, Double, Long)](k, t => (t._2, t._3))
        .toColumn.name("top"))
      .flatMap { case (et, top) =>
        top.zipWithIndex.map { case ((v, id), i) => (et, i + 1L, v, id) }
      }
      .toDF("event_type", "rnk", "value", "event_id")
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x74_topk_udaf",
      (s, dir) => topKPerType(s, dir, 3).orderBy("event_type", "rnk"),
      Some("""SELECT event_type, rnk, value, event_id FROM (
             |  SELECT event_type, value, event_id,
             |         CAST(row_number() OVER (PARTITION BY event_type
             |              ORDER BY value DESC, event_id) AS BIGINT) AS rnk
             |  FROM events) t
             |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin))
  )
}
