package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** x221: entity resolution (record linkage) with a measured
  * precision/recall report — the Fellegi–Sunter (1969) shape every
  * registry/crawl reconciliation runs: multi-pass BLOCKING to generate
  * candidate pairs (never all-pairs), per-field agreement WEIGHTS summed
  * into a match score, a three-band decision (match / clerical review /
  * non-match), and — because the dirty side is GRAFTED relationally from
  * the clean registry (the x139/x193/x199 idiom, replayed by the oracle)
  * — exact per-band precision and recall against construction-time truth.
  *
  * The dirty registry: every customer gets one corrupted twin
  * (key%3 = 0: one char dropped at an early position — edit distance 1;
  * key%3 = 1: case-mangled — exact after normalization; key%3 = 2: name
  * intact, nation wrong; key%5 = 0 additionally loses its segment), and
  * every 7th key emits a GHOST record (shifted key, near-collision name)
  * that matches nobody — so every decision band is non-vacuous and both
  * false-positive shapes (near-miss ghosts, lookalike neighbors) exist.
  *
  * Blocking, scale-first: two SUFFIX-ANCHORED name keys with
  * complementary failure domains — k1 = last 4 name chars (invariant to
  * the early-position edits; fine-grained: 10⁴ values), k2 = nation ×
  * mid-digits (invariant to last-digit corruption; fails on nation
  * corruption, which k1 covers). Candidates = union of the two
  * equi-joins, deduped. No similarity computation happens outside the
  * blocked candidate set, and no block is corpus-sized by construction —
  * the property that separates record linkage that runs at 100 TB from
  * one that cross-joins.
  *
  * Scoring is ALL integers (agreement weights are the precomputed
  * ln(m/u)-style constants production linkers ship): name exact-normalized
  * +4000 / levenshtein ≤ 1 +2000 / disagree −1000; nation +800/−300;
  * segment +300/−200. Bands: ≥3000 match, ≥2000 review, else non-match.
  * The fixture splits the char-drop class across match/review on the
  * segment weight alone — the clerical-review band exists because the
  * evidence genuinely runs out, not by construction fiat.
  */
object EntityResolution {

  /** Dirty twin + ghost construction, shared by Spark and the oracle.
    *
    * Ghost ids sit at the smallest multiple of 10000 STRICTLY above
    * max(c_custkey) (r11 advice: a fixed +100000 collides with real keys
    * once the table passes 100k rows — sf ≳ 0.7 — and the collided ghost
    * name then EQUALS the real name, silently breaking "ghosts match
    * nobody" in both engines at once). A multiple of 10⁴ keeps the
    * last-4-digit blocking key of the ghost name identical to its seed
    * key's, so the designed near-miss candidates (levenshtein-1 at the
    * ten-thousands digit) survive at any SF where the offset stays one
    * digit wide.
    */
  private def dirty(cust: DataFrame): DataFrame = {
    val name = col("c_name")
    val twinName = when(col("c_custkey") % 3 === 0,
        expr("concat(substr(c_name, 1, CAST(c_custkey % 10 AS INT)), " +
          "substr(c_name, CAST(c_custkey % 10 AS INT) + 2))"))
      .when(col("c_custkey") % 3 === 1, upper(name))
      .otherwise(name)
    val twins = cust.select(
      col("c_custkey").as("did"),
      twinName.as("dname"),
      when(col("c_custkey") % 3 === 2, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("dnation"),
      when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("dseg"))
    val off = cust.agg(
      ((floor(max(col("c_custkey")) / 10000) + 1) * 10000).as("off"))
    val ghosts = cust.filter(col("c_custkey") % 7 === 0)
      .crossJoin(broadcast(off))
      .select(
        (col("c_custkey") + col("off")).as("did"),
        concat(lit("Customer#"),
          lpad((col("c_custkey") + col("off")).cast("string"), 9, "0"))
          .as("dname"),
        ((col("c_nationkey") + 3) % 25).as("dnation"),
        col("c_mktsegment").as("dseg"))
    twins.unionByName(ghosts)
  }

  private def k1(name: Column): Column =
    substring(name, -4, 4)
  // Mid-digit key d4..d7 (suffix-anchored so the early-position edit
  // can't move it). The LOW-mid digits, deliberately: the high digits of
  // a dense key space are all zeros (a key on them collapses to O(1)
  // blocks and the candidate set goes quadratic — measured: 5M pairs at
  // sf0.1 before this choice, ~90k after); d4..d7 yields ~n/100 blocks
  // until n reaches 10⁸, at which point widen the slice (the x207
  // prefix-widening move — the shape is unchanged).
  private def k2mid(name: Column): Column =
    substring(substring(name, -6, 6), 1, 4)

  def resolve(spark: SparkSession, cust: DataFrame): DataFrame = {
    val d = dirty(cust)
    val c = cust.select(col("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_mktsegment"))
    // Pass 1: last-4 name chars. Pass 2: nation x mid-digits.
    val cand1 = d.join(c, k1(col("dname")) === k1(col("c_name")))
    val cand2 = d.join(c,
      col("dnation") === col("c_nationkey") &&
        k2mid(col("dname")) === k2mid(col("c_name")))
    val cand = cand1.unionByName(cand2)
      .select("did", "dname", "dnation", "dseg",
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .distinct()

    val nameScore = when(lower(col("dname")) === lower(col("c_name")),
        lit(4000L))
      .when(levenshtein(lower(col("dname")), lower(col("c_name"))) <= 1,
        lit(2000L))
      .otherwise(lit(-1000L))
    val score = nameScore +
      when(col("dnation") === col("c_nationkey"), 800L).otherwise(-300L) +
      when(col("dseg") === col("c_mktsegment"), 300L).otherwise(-200L)
    val scored = cand.select(
      when(score >= 3000L, "match").when(score >= 2000L, "review")
        .otherwise("nonmatch").as("decision"),
      (col("did") === col("c_custkey")).cast("long").as("is_true"))

    val total = cust.agg(count(lit(1)).as("n_truth"))
    scored.groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"), sum(col("is_true")).as("n_true"))
      .crossJoin(broadcast(total))
      .select(col("decision"), col("n_pairs"), col("n_true"),
        (col("n_pairs") - col("n_true")).as("n_false"),
        expr("n_true * 1000 DIV n_pairs").as("precision_permille"),
        expr("n_true * 1000 DIV n_truth").as("recall_permille"))
      .orderBy("decision")
  }

  private val resolveSql: String =
    """WITH twins AS (
      |  SELECT c_custkey AS did,
      |         CASE WHEN c_custkey % 3 = 0 THEN
      |                substr(c_name, 1, CAST(c_custkey % 10 AS INT))
      |                  || substr(c_name, CAST(c_custkey % 10 AS INT) + 2)
      |              WHEN c_custkey % 3 = 1 THEN upper(c_name)
      |              ELSE c_name END AS dname,
      |         CASE WHEN c_custkey % 3 = 2 THEN (c_nationkey + 1) % 25
      |              ELSE c_nationkey END AS dnation,
      |         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN'
      |              ELSE c_mktsegment END AS dseg
      |  FROM customer),
      | off AS (SELECT (max(c_custkey) // 10000 + 1) * 10000 AS off
      |         FROM customer),
      | ghosts AS (
      |  SELECT c_custkey + off AS did,
      |         'Customer#' || lpad(CAST(c_custkey + off AS VARCHAR), 9, '0')
      |           AS dname,
      |         (c_nationkey + 3) % 25 AS dnation,
      |         c_mktsegment AS dseg
      |  FROM customer CROSS JOIN off WHERE c_custkey % 7 = 0),
      | d AS (SELECT * FROM twins UNION ALL SELECT * FROM ghosts),
      | cand AS (
      |  SELECT DISTINCT did, dname, dnation, dseg,
      |         c_custkey, c_name, c_nationkey, c_mktsegment
      |  FROM (
      |    SELECT d.*, c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment
      |    FROM d JOIN customer c
      |      ON substr(d.dname, length(d.dname) - 3, 4)
      |           = substr(c.c_name, length(c.c_name) - 3, 4)
      |    UNION ALL
      |    SELECT d.*, c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment
      |    FROM d JOIN customer c
      |      ON d.dnation = c.c_nationkey
      |     AND substr(d.dname, length(d.dname) - 5, 4)
      |           = substr(c.c_name, length(c.c_name) - 5, 4)) u),
      | scored AS (
      |  SELECT CASE WHEN s >= 3000 THEN 'match'
      |              WHEN s >= 2000 THEN 'review'
      |              ELSE 'nonmatch' END AS decision,
      |         CASE WHEN did = c_custkey THEN 1 ELSE 0 END AS is_true
      |  FROM (
      |    SELECT did, c_custkey,
      |           (CASE WHEN lower(dname) = lower(c_name) THEN 4000
      |                 WHEN levenshtein(lower(dname), lower(c_name)) <= 1
      |                   THEN 2000
      |                 ELSE -1000 END
      |            + CASE WHEN dnation = c_nationkey THEN 800 ELSE -300 END
      |            + CASE WHEN dseg = c_mktsegment THEN 300 ELSE -200 END) AS s
      |    FROM cand) t),
      | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM customer)
      |SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(sum(is_true) AS BIGINT) AS n_true,
      |       CAST(count(*) - sum(is_true) AS BIGINT) AS n_false,
      |       CAST(sum(is_true) * 1000 // count(*) AS BIGINT)
      |         AS precision_permille,
      |       CAST(sum(is_true) * 1000 // max(n_truth) AS BIGINT)
      |         AS recall_permille
      |FROM scored CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x221_entity_resolution",
      (s, dir) => resolve(s, Tables.customer(s, dir)),
      Some(resolveSql)))
}
