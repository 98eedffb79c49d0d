package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12: data-selection instrumentation — the dedup threshold-yield
  * sweep an operator of x02/x03's family needs before anyone picks its
  * threshold in production.
  */
object Round12Queries {

  // ---- x206: dedup threshold sweep --------------------------------------

  /** x206: dedup marginal-yield curve — for each candidate Jaccard
    * threshold, how many near-dup pairs fire and how many distinct docs
    * they touch. This is the tuning query behind every x02/x03/x43
    * deployment: the threshold is a corpus-dependent policy choice, and
    * the right way to pick it is to sweep once, not to re-run the dedup
    * five times.
    *
    * On this fixture the curve is BIMODAL — organic pairs sit below 0.1
    * Jaccard, planted dups at 0.9+ — so the sweep's answer is "any
    * threshold in [0.1, 0.6] is equivalent"; the spine spans 0.05–0.9 to
    * show both cliffs, and the spec pins the plateau.
    *
    * Shape: ONE inverted-index pair pass at the loosest threshold (0.05),
    * then each pair fans out to the thresholds it clears (≤ 5 rows) and
    * two tiny keyed aggregates — the sweep costs one x02, not five. The
    * threshold spine left-joins the aggregates so an empty band still
    * reports 0 (the x202 densify lesson). Thresholds are carried as
    * permille INTEGERS alongside their double form — `(0.6 * 1000)` cast
    * to long truncates to 599 (0.6 has no exact double), so the permille
    * label must never be derived from the double.
    *
    * Scale: identical to x02 (the inverted-index join with the DF skew
    * cap available); the fan-out multiplies only the matched PAIR set,
    * never the corpus.
    */
  private def dedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), 0.05)
    val th = Seq(50L, 100L, 300L, 600L, 900L)
    val e = pairs.select(col("a"), col("b"), col("jaccard"),
        explode(array(th.map(t =>
          struct(lit(t).as("tp"), lit(t / 1000.0).as("t"))): _*)).as("th"))
      .filter(col("jaccard") >= col("th.t"))
      .select(col("a"), col("b"), col("th.tp").as("tp"))
    val np = e.groupBy("tp").agg(count(lit(1)).as("n_pairs"))
    val nd = e.select(col("tp"), explode(array(col("a"), col("b"))).as("d"))
      .groupBy("tp").agg(count_distinct(col("d")).as("n_dup_docs"))
    import s.implicits._
    val spine = th.toDF("tp")
    spine.join(np, Seq("tp"), "left").join(nd, Seq("tp"), "left")
      .select(col("tp").as("threshold_permille"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
      .orderBy("threshold_permille")
  }

  private val dedupSweepSql: String =
    s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql(0.05)}),
       | th(tp, t) AS (VALUES (50, 0.05), (100, 0.1), (300, 0.3),
       |                      (600, 0.6), (900, 0.9)),
       | e AS (SELECT th.tp, p.a, p.b FROM pairs p
       |       JOIN th ON p.jaccard >= th.t),
       | np AS (SELECT tp, count(*) AS n_pairs FROM e GROUP BY 1),
       | nd AS (SELECT tp, count(DISTINCT d) AS n_dup_docs FROM (
       |          SELECT tp, a AS d FROM e
       |          UNION ALL SELECT tp, b AS d FROM e) u GROUP BY 1)
       |SELECT CAST(th.tp AS BIGINT) AS threshold_permille,
       |       CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       |       CAST(coalesce(nd.n_dup_docs, 0) AS BIGINT) AS n_dup_docs
       |FROM th LEFT JOIN np USING (tp) LEFT JOIN nd USING (tp)
       |ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("x206_dedup_sweep", dedupSweep, Some(dedupSweepSql)))
}
