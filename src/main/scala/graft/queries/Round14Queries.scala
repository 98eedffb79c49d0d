package graft.queries

import graft.QueryDef
import graft.operators.GraphLoops

/** Round-14: the convergence-loop twin of the fixed-unroll BFS (r11
  * verdict #3). x227 runs the x226 body under the frontier-exhaustion
  * loop and is certified by its OWN recursive-CTE oracle: DuckDB's
  * `WITH RECURSIVE` walk enumerates every path length from the source
  * (UNION-deduped on (node, dist), guarded at the same 64-round cap as
  * the Spark loop) and `min(dist)` per node is the exhaustive BFS
  * distance. The first attempt shared x226's unrolled oracle — and the
  * hash gate correctly REJECTED it at sf0.01, where the true eccentricity
  * exceeds the 4-round unroll (layers 5..9 exist that x226 folds into
  * its −1 residual). That measured divergence is the whole point of the
  * twin pair: x226 certifies the budgeted trajectory, x227 certifies the
  * converged one, and the gap between their −1 buckets is the data the
  * budget decision needs.
  *
  * LPA and PageRank loop modes exist too ([[graft.operators.GraphLoops]])
  * but are spec-gated only (GraphLoopSpec): measured on this fixture,
  * min-tie LPA run to its TRUE fixpoint floods to one label per region
  * (a loop-mode query would certify a useless answer), and integer
  * PageRank has no finite fixpoint at all, only a tolerance.
  */
object Round14Queries {

  private def bfsConvergedSql: String =
    s"""WITH RECURSIVE
       | op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |         FROM lineitem),
       | ew AS (SELECT a.p AS src, b.p AS dst, count(*) AS w
       |         FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
       |         GROUP BY 1, 2),
       | edges AS (SELECT src, dst FROM ew WHERE w >= 2),
       | deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       | r0 AS (SELECT min(src) AS node, 0 AS dist FROM deg
       |        WHERE d = (SELECT max(d) FROM deg)),
       | walk AS (
       |   SELECT node, dist FROM r0
       |   UNION
       |   SELECT e.dst AS node, wk.dist + 1 AS dist
       |   FROM walk wk JOIN edges e ON e.src = wk.node
       |   WHERE wk.dist < 64),
       | layers AS (SELECT node, min(dist) AS dist FROM walk GROUP BY 1),
       | nodes AS (SELECT DISTINCT src AS node FROM edges)
       |SELECT CAST(coalesce(l.dist, -1) AS BIGINT) AS dist,
       |       CAST(count(*) AS BIGINT) AS n_nodes,
       |       CAST(min(nodes.node) AS BIGINT) AS min_node
       |FROM nodes LEFT JOIN layers l ON nodes.node = l.node
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "x227_bfs_converged",
      (s, dir) => GraphLoops.bfsConverged(s, dir)._1,
      Some(bfsConvergedSql)))
}
