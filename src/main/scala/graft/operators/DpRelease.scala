package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x223: differentially-private histogram release (Dwork et al. 2006) —
  * the other half of the governance surface next to x210's k-anonymity:
  * instead of suppressing small cells, EVERY cell ships with calibrated
  * Laplace noise and the release carries its own ε accounting. Two
  * mechanisms compose sequentially (per-type histogram at ε=0.5 under
  * parallel composition across disjoint cells, plus a corpus total at
  * ε=0.5), so the published budget line is ε=1.0 — the bookkeeping a
  * privacy reviewer actually audits. Event-level add/remove adjacency,
  * sensitivity 1 (documented: user-level DP would first clip per-user
  * contributions and scale b accordingly — same plan, bigger b).
  *
  * Determinism (the part a SQL engine must get right): the Laplace draw
  * is inverse-CDF over a HASH-derived uniform — u = first 13 md5 hex
  * chars / 2⁵², exactly representable in a double (52 bits), so
  * 1 − 2|u − ½| is computed EXACTLY in both engines (all dyadic
  * rationals); the single transcendental step ln(·) is rounded to
  * integer micro-nats (the x171 regime) and everything after — scaling
  * by b = 1/ε = 2, adding to the exact count, clamping at zero
  * (post-processing, free under DP) — is pure integer arithmetic.
  * Nothing here is secret from the oracle: DuckDB replays the identical
  * draw, which is exactly what makes a DETERMINISTIC noise fixture
  * testable; production swaps the md5 seed for a real RNG, the plan is
  * unchanged.
  *
  * Scale: one map-side-combinable hash aggregate over events, a 6-row
  * noise computation, no joins, no windows.
  */
object DpRelease {

  /** 2⁵¹ as a double-exact constant. */
  private val Half = 2251799813685248L // 2^51

  private def lapNoiseMicro(seedCol: org.apache.spark.sql.Column) = {
    val k = conv(substring(md5(seedCol.cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val d = k - lit(Half)
    val a = greatest(
      lit(1.0) - abs(d).cast("double") / lit(Half.toDouble),
      lit(1.0) / lit(Half.toDouble))
    val lnMicro = round(log(a) * 1000000).cast("long") // <= 0
    val sign = when(d >= 0, 1L).otherwise(-1L)
    sign * (-lnMicro) * 2L // b = 1/epsilon = 2
  }

  def release(spark: SparkSession, events: DataFrame): DataFrame = {
    val hist = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .select(lit("hist").as("mech"), col("event_type").as("cell"), col("n"))
    val total = events.agg(count(lit(1)).as("n"))
      .select(lit("total").as("mech"), lit("all").as("cell"), col("n"))
    hist.unionByName(total)
      .select(col("mech"), col("cell"),
        greatest(
          col("n") * 1000000L +
            lapNoiseMicro(concat(lit("dp:"), col("mech"), lit(":"),
              col("cell"))),
          lit(0L)).as("noisy_micro"),
        lit(500000L).as("epsilon_micro"))
      .orderBy("mech", "cell")
  }

  private val releaseSql: String =
    s"""WITH cells AS (
       |  SELECT 'hist' AS mech, event_type AS cell,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 2
       |  UNION ALL
       |  SELECT 'total' AS mech, 'all' AS cell, CAST(count(*) AS BIGINT) AS n
       |  FROM events),
       | drawn AS (
       |  SELECT mech, cell, n,
       |         CAST('0x' || substr(md5('dp:' || mech || ':' || cell), 1, 13)
       |           AS BIGINT) AS k
       |  FROM cells),
       | noise AS (
       |  SELECT mech, cell, n,
       |         CASE WHEN k >= $Half THEN 1 ELSE -1 END AS sgn,
       |         CAST(round(ln(greatest(
       |             1.0 - abs(k - $Half) / $Half.0,
       |             1.0 / $Half.0)) * 1000000) AS BIGINT) AS ln_micro
       |  FROM drawn)
       |SELECT mech, cell,
       |       greatest(n * 1000000 + sgn * (-ln_micro) * 2, 0) AS noisy_micro,
       |       CAST(500000 AS BIGINT) AS epsilon_micro
       |FROM noise ORDER BY mech, cell""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x223_dp_release",
      (s, dir) => release(s, Tables.events(s, dir)),
      Some(releaseSql)))
}
