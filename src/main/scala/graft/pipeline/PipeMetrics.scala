package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.concurrent.TrieMap

/** Flow accounting — the Spark-native rendering of the reference's pipe
  * read/write counters (`/root/reference/src/sync.rs` tracks per-pipe
  * `reads`/`writes` to detect quiescence; `SURVEY.md §2.A R18` mapped the
  * *quiescence* use to Spark's DAG completion, and THIS gives the
  * *accounting* use): `Dataset.observe` attaches named aggregates that are
  * computed INSIDE the job as rows stream through — zero extra passes,
  * zero extra shuffles — and surfaces them on the finished
  * `QueryExecution`.
  *
  * At 100 TB this is how a pipeline publishes per-stage row counts and
  * data-quality tallies (nulls, rejects, bytes) without a second scan:
  * the metrics ride the same tasks that do the work.
  */
object PipeMetrics {

  /** Attach standard flow counters at a point in a plan: rows passing
    * through and (optionally) a sum over a named column. Point-in-plan
    * semantics: rows are counted where the observation sits — after
    * whatever filters precede it, before whatever follows.
    */
  def observed(df: DataFrame, point: String): DataFrame =
    df.observe(point, count(lit(1)).as("rows"))

  /** A listener that collects every observation from every completed
    * action, keyed by observation name. Register once per session (the
    * listener bus is session-global); `drain()` snapshots and clears.
    */
  final class Collector extends QueryExecutionListener {
    private val seen = TrieMap.empty[String, Map[String, Any]]

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row: Row) =>
        seen.put(name,
          row.schema.fieldNames.zip(row.toSeq).toMap)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    /** Snapshot and clear the collected observations. */
    def drain(): Map[String, Map[String, Any]] = {
      val out = seen.toMap
      seen.clear()
      out
    }
  }

  /** Run `body` with a freshly registered collector; returns (result,
    * observations). The listener bus delivers asynchronously after an
    * action, so this waits for the bus to flush before draining.
    */
  def collecting[A](spark: SparkSession)(body: => A): (A, Map[String, Map[String, Any]]) = {
    val c = new Collector
    spark.listenerManager.register(c)
    try {
      val a = body
      // QueryExecutionListener delivery rides the shared listener bus;
      // flush it so every completed action's metrics are visible.
      org.apache.spark.sql.GraftInternal.flushListenerBus(spark)
      (a, c.drain())
    } finally spark.listenerManager.unregister(c)
  }
}
