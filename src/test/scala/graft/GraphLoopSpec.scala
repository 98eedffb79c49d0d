package graft

import graft.operators.GraphLoops

/** r11 verdict #3: the convergence-loop twins must provably compute what
  * the unrolled plans compute on the fixture, and must actually
  * self-terminate (the property the unrolled plans cannot demonstrate).
  */
class GraphLoopSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("x227 BFS loop == unrolled x226 where the graph settles in budget") {
    // At sf0.001 the graph's eccentricity is within the 4-round unroll,
    // so exhaustion and budget agree bitwise. (At sf0.01 they measurably
    // DIVERGE — layers 5..9 exist — which is why x227 carries its own
    // recursive-CTE oracle instead of sharing x226's; the driver's
    // sf0.01 hash gate certifies that divergent case.)
    val (looped, rounds) = GraphLoops.bfsConverged(spark, sfDir)
    val unrolled = SparkEntry.queries("x226_graph_bfs")(spark, sfDir)
    assert(rows(looped) == rows(unrolled),
      "convergence-loop BFS diverged from the unrolled plan at the SF " +
        "where the graph settles inside the budget")
    // <= 4 expansion rounds + one empty-frontier confirm.
    assert(rounds >= 2 && rounds <= 5, s"BFS rounds out of range: $rounds")
  }

  test("LPA loop at the unrolled budget == x201; true fixpoint FLOODS") {
    // At the production budget (3 rounds, the x201 unroll) the loop
    // mechanism must be bitwise the unrolled plan.
    val (looped, rounds) = GraphLoops.lpaConverged(spark, sfDir, maxRounds = 3)
    val unrolled = SparkEntry.queries("x201_lpa_communities")(spark, sfDir)
    assert(rounds == 3, s"fixture fixpointed inside the budget: $rounds")
    assert(rows(looped) == rows(unrolled),
      "loop mechanism changed the LPA trajectory")
    // Run to the TRUE fixpoint: min-tie LPA floods (plurality ties
    // resolve to min, so region-minimum labels keep expanding) — it must
    // terminate well under the cap AND collapse to strictly fewer
    // communities than the budgeted answer. This measured degeneration
    // is the documented reason x201 ships a fixed budget.
    val (flooded, fpRounds) = GraphLoops.lpaConverged(spark, sfDir,
      maxRounds = 64)
    assert(fpRounds < 64, s"LPA never reached a fixpoint: $fpRounds")
    val nBudget = looped.collect().length
    val nFix = flooded.collect().length
    assert(nFix < nBudget,
      s"fixpoint did not flood ($nFix vs $nBudget communities) — " +
        "re-examine whether x201 could share its oracle with a " +
        "convergence-mode twin after all")
  }

  test("pagerank loop at (tol=0, cap=3) is bitwise the unrolled x144") {
    val (looped, rounds) = GraphLoops.pagerankConverged(spark, sfDir,
      tolScaled = 0L, maxRounds = 3)
    val unrolled = SparkEntry.queries("x144_pagerank")(spark, sfDir)
    assert(rounds == 3)
    assert(rows(looped) == rows(unrolled),
      "loop mechanism changed the PageRank arithmetic")
  }

  test("pagerank loop self-terminates at a real tolerance") {
    // 10^6-scaled integer ranks; tol = 5000 means max per-node movement
    // <= 0.5% of the initial mass — a production-grade stopping rule.
    val (converged, rounds) = GraphLoops.pagerankConverged(spark, sfDir,
      tolScaled = 5000L, maxRounds = 50)
    assert(rounds < 50, "PageRank hit the round cap instead of converging")
    info(s"PageRank reached tol=5000 (0.5%) in $rounds rounds")
    assert(converged.collect().length == 20, "top-20 projection broke")
    // Tightening the tolerance can only iterate MORE (monotone stopping
    // rule) — the property that makes the knob a real dial.
    val (_, tighter) = GraphLoops.pagerankConverged(spark, sfDir,
      tolScaled = 500L, maxRounds = 50)
    assert(tighter >= rounds,
      s"tighter tolerance stopped earlier ($tighter < $rounds)")
  }
}
