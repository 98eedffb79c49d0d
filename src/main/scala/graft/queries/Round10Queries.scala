package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 additions: k-core decomposition by iterated degree peeling,
  * with per-node peel rounds (the degeneracy-ordering observable).
  *
  * The reference has no graph surface at all (SURVEY.md §2.B); this
  * extends the graph family (triangles x152/x162/x163, PageRank x144,
  * connected components x43/x172) with the standard community-pruning
  * primitive: remove every node of degree < k, repeat to fixpoint — the
  * survivors are the k-core, and the round a node is removed in is its
  * position in the peeling (degeneracy) order.
  *
  * Fixture: the co-purchase graph is dense and near-uniform (min degree
  * 38 at sf0.1 — an Erdős–Rényi-like graph whose k-core collapses
  * all-or-nothing near the threshold, measured: k at the 30th degree
  * percentile already empties it). So, like the x162/x163 hub graft, the
  * fixture PLANTS the pathology the operator exists to handle: one
  * tendril chain of [[ChainLen]] nodes hangs off every 1000th part
  * (fresh node ids above max partkey, derived relationally). At k = 2
  * the chain burns one node per round from its free end — a genuine
  * multi-round cascade (removals at round r create the round-r+1
  * removals) — while the dense base provably survives, so the output
  * carries peel rounds 1..[[ChainLen]] plus the intact core, at every
  * scale factor.
  *
  * Scale shape (100 TB): the loop iterates on the NODE/DEGREE table
  * (|V| rows), never rewriting the edge list: each round scans the
  * once-materialized edge list against the (small) doomed set to emit
  * per-neighbor removal counts, then updates degrees by a left join —
  * the incremental-peeling formulation. Edge data moves zero times per
  * round; checkpointed degree iterates are dropped as consumed
  * (QueryDef.dropCheckpoint, the r9-advice idiom). The DuckDB oracle
  * unrolls the SAME delta algorithm [[Rounds]] times (> max peel round,
  * so trailing rounds are provable no-ops), making every peel round
  * hash-certified.
  */
object Round10Queries {

  private val K = 2
  private[graft] val ChainLen = 10
  private val AnchorMod = 1000
  private val Rounds = 14 // oracle unroll: > ChainLen + 1 (fixpoint confirm)

  /** Co-purchase base + planted tendril chains (u < v everywhere). */
  private def peelFixtureEdges(s: SparkSession, dir: String): DataFrame = {
    val parts = graft.Tables.part(s, dir).select(col("p_partkey").as("p"))
    val mp = parts.agg(max(col("p")).as("m"))
    val chain = parts.filter(col("p") % AnchorMod === 1)
      .crossJoin(broadcast(mp))
      .select(col("p"), col("m"),
        explode(sequence(lit(1), lit(ChainLen))).as("pos"))
      .select(col("p"), col("pos"),
        (col("m") * (col("pos") + 1) + col("p")).as("id"),
        (col("m") * (col("pos") + 2) + col("p")).as("next"))
    val anchorEdges = chain.filter(col("pos") === 1)
      .select(col("p").as("u"), col("id").as("v"))
    val chainEdges = chain.filter(col("pos") < ChainLen)
      .select(col("id").as("u"), col("next").as("v"))
    Round6bQueries.copurchaseEdges(s, dir)
      .unionByName(anchorEdges).unionByName(chainEdges)
  }

  /** k-core with peel rounds; also returns the measured round count (the
    * observable Round10Spec pins against the oracle's unroll bound).
    */
  private[graft] def kcorePeelWithRounds(s: SparkSession, dir: String)
      : (DataFrame, Int) = {
    val e0 = peelFixtureEdges(s, dir).localCheckpoint()
    var deg = e0.select(col("u").as("x"))
      .union(e0.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .localCheckpoint()
    var removed: List[DataFrame] = Nil
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      val doomed = deg.filter(col("d") < K)
        .select(col("x"), lit(rounds.toLong).as("peel_round"))
        .localCheckpoint()
      if (doomed.count() == 0L) {
        converged = true
        graft.QueryDef.dropCheckpoint(doomed)
      } else {
        removed ::= doomed
        // per-survivor removal counts: one scan of the materialized edge
        // list against the (small) doomed set — edges never rewritten
        val delta = e0.join(doomed.select(col("x").as("u")), Seq("u"))
          .select(col("v").as("x"))
          .union(e0.join(doomed.select(col("x").as("v")), Seq("v"))
            .select(col("u").as("x")))
          .groupBy("x").agg(count(lit(1)).as("rm"))
        val next = deg.join(doomed.select("x"), Seq("x"), "left_anti")
          .join(delta, Seq("x"), "left")
          .select(col("x"),
            (col("d") - coalesce(col("rm"), lit(0L))).as("d"))
          .localCheckpoint()
        graft.QueryDef.dropCheckpoint(deg)
        deg = next
      }
    }
    val core = deg.select(col("x").as("node"), lit(0L).as("peel_round"))
    val out = removed.map(_.select(col("x").as("node"), col("peel_round")))
      .reduceOption(_.unionByName(_))
      .fold(core)(core.unionByName(_))
      .orderBy("node")
    (out, rounds)
  }

  private val kcoreSql: String = {
    val base =
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         | be AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
         |        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
         | mp AS (SELECT max(p_partkey) AS m FROM part),
         | cn AS MATERIALIZED (SELECT p.p_partkey AS p, gs.pos,
         |               mp.m * (gs.pos + 1) + p.p_partkey AS id,
         |               mp.m * (gs.pos + 2) + p.p_partkey AS next
         |        FROM part p CROSS JOIN mp
         |        CROSS JOIN (SELECT unnest(generate_series(1, $ChainLen)) AS pos) gs
         |        WHERE p.p_partkey % $AnchorMod = 1),
         | e0 AS MATERIALIZED (SELECT u, v FROM be
         |        UNION ALL SELECT p AS u, id AS v FROM cn WHERE pos = 1
         |        UNION ALL SELECT id AS u, next AS v FROM cn WHERE pos < $ChainLen),
         | d0 AS MATERIALIZED (SELECT x, count(*) AS d
         |        FROM (SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
         |        GROUP BY 1)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      s""" x$r AS MATERIALIZED (SELECT x FROM d${r - 1} WHERE d < $K),
         | d$r AS MATERIALIZED (SELECT s.x, s.d - coalesce(rm.rm, 0) AS d
         |         FROM d${r - 1} s
         |         LEFT JOIN (SELECT x, count(*) AS rm FROM (
         |             SELECT e0.v AS x FROM e0 JOIN x$r ON e0.u = x$r.x
         |             UNION ALL
         |             SELECT e0.u AS x FROM e0 JOIN x$r ON e0.v = x$r.x)
         |           GROUP BY 1) rm USING (x)
         |         WHERE s.x NOT IN (SELECT x FROM x$r))""".stripMargin
    }.mkString(",\n")
    val removedLegs = (1 to Rounds).map(r =>
      s"SELECT x AS node, CAST($r AS BIGINT) AS peel_round FROM x$r")
      .mkString("\n UNION ALL ")
    s"""$base,
       |$rounds
       |SELECT node, peel_round FROM (
       | SELECT x AS node, CAST(0 AS BIGINT) AS peel_round FROM d$Rounds
       | UNION ALL $removedLegs)
       |ORDER BY node""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "x186_kcore_peel",
      (s, dir) => kcorePeelWithRounds(s, dir)._1,
      Some(kcoreSql)))
}
