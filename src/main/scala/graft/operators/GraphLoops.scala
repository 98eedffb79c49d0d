package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Convergence-loop twins of the fixed-unroll graph queries (r11 verdict
  * #3): x144 PageRank, x201 LPA, and x226 BFS unroll a FIXED round count
  * so their trajectories are DuckDB-oracle-replayable; their Scaladocs
  * promised "the same body under the x172 convergence loop" for true
  * 100 TB diameters. This module IS that code: the identical per-round
  * relational body, driven by a data-dependent stopping rule (one cheap
  * driver probe per round — an `isEmpty` on the just-checkpointed
  * iterate, or a 1-row max-delta aggregate), with the x172 hygiene:
  * every iterate localCheckpointed, the PRIOR iterate's blocks dropped
  * (`QueryDef.dropCheckpoint`) the moment the convergence check has
  * consumed them, so the live footprint is O(1) iterates no matter the
  * diameter.
  *
  * Equivalence is spec-gated (GraphLoopSpec) and, where the stopping
  * rule genuinely lands on the unrolled trajectory, oracle-gated too:
  * BFS's frontier-exhaustion loop is the declared query x227 sharing
  * x226's DuckDB oracle verbatim — the hash gate proves the convergence
  * loop computes exactly what the unrolled plan computes (the
  * x172-shares-x43's-oracle precedent). LPA and PageRank have NO
  * useful finite fixpoint (measured: min-tie LPA floods to one label
  * per region at its true fixpoint; integer PageRank keeps moving), so
  * their loop modes are budget/tolerance-driven and spec-gated only:
  * at the unrolled budget they reproduce x201/x144 bitwise, and at
  * production settings they self-terminate with measured round counts.
  *
  * Graph inputs come from [[CoPurchaseGraph]] (the shared per-run edge
  * table), so the loop twins add no derivation cost to the suite.
  */
object GraphLoops {

  /** Single-source BFS layers to frontier exhaustion. Returns the layer
    * report (identical projection to x226) and the number of expansion
    * rounds attempted (the final round is the empty-frontier confirm).
    */
  def bfsConverged(s: SparkSession, dir: String, maxRounds: Int = 64)
      : (DataFrame, Int) = {
    val edges = CoPurchaseGraph.strong(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val maxd = deg.agg(max(col("d")).as("md"))
    val source = deg.join(broadcast(maxd), col("d") === col("md"))
      .agg(min(col("src")).as("node"))
    var reached = source.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var rounds = 0
    var grew = true
    while (grew && rounds < maxRounds) {
      rounds += 1
      val frontier = reached.filter(col("dist") === (rounds - 1).toLong)
        .select(col("node").as("src"))
      val next = edges.join(frontier, "src")
        .select(col("dst").as("node")).distinct()
        .join(reached.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(rounds.toLong))
      val prev = reached
      reached = prev.unionByName(next).localCheckpoint()
      // Convergence probe on the MATERIALIZED iterate (no recompute):
      // the round grew the reached set iff it added a row at this dist.
      grew = !reached.filter(col("dist") === rounds.toLong).isEmpty
      QueryDef.dropCheckpoint(prev)
    }
    val out = edges.select(col("src").as("node")).distinct()
      .join(reached, Seq("node"), "left")
      .select(col("node"), coalesce(col("dist"), lit(-1L)).as("dist"))
      .groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"))
      .orderBy("dist")
    (out, rounds)
  }

  /** Synchronous min-tie label propagation under a budget-with-early-exit
    * loop: stops at label fixpoint OR after `maxRounds`, whichever first.
    * Returns the community report (identical projection to x201) and the
    * rounds run.
    *
    * Measured honesty (GraphLoopSpec): run to its TRUE fixpoint, min-tie
    * LPA on this graph FLOODS — plurality ties resolve to the min label
    * so the min label of each dense region keeps expanding, and the
    * fixpoint is one label per connected region (~connected components),
    * not communities. That is the textbook reason production LPA runs a
    * FIXED round budget (Raghavan et al. use early stopping on change
    * counts for the same reason); the x201 unroll at 3 rounds IS the
    * production stopping rule, and this loop mode contributes the
    * early-exit (a converged graph stops paying for dead rounds) plus
    * the O(1)-iterate checkpoint hygiene for when the budget is large.
    */
  def lpaConverged(s: SparkSession, dir: String, maxRounds: Int = 64)
      : (DataFrame, Int) = {
    val edges = CoPurchaseGraph.strong(s, dir)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      rounds += 1
      val cnt = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val mx = cnt.groupBy("node").agg(max(col("c")).as("mc"))
      val prev = labels
      labels = cnt.join(mx, "node").filter(col("c") === col("mc"))
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      // Fixpoint check on the two materialized iterates (node sets are
      // identical by construction — every node has >= 1 neighbor).
      changed = !labels
        .join(prev.withColumnRenamed("lbl", "plbl"), "node")
        .filter(col("lbl") =!= col("plbl"))
        .isEmpty
      QueryDef.dropCheckpoint(prev)
    }
    val out = labels.groupBy("lbl")
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("first_member"))
      .select(col("lbl").as("community"), col("n_members"),
        col("first_member"))
      .orderBy("community")
    (out, rounds)
  }

  /** PageRank iterated until max |Δ rank_scaled| <= tolScaled (ranks are
    * 10^6-scaled integers, so tolScaled = 10000 means 1%). Returns the
    * top-20 report (identical projection to x144) and the rounds run.
    * With tolScaled = 0 the loop never self-stops and runs exactly
    * `maxRounds` rounds — (0, 3) is the spec's bitwise-equality probe
    * against the unrolled x144 plan.
    */
  def pagerankConverged(s: SparkSession, dir: String, tolScaled: Long,
      maxRounds: Int): (DataFrame, Int) = {
    val edges = CoPurchaseGraph.directed(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var r = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      rounds += 1
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), "src").join(deg, "src")
        .select(col("dst").as("node"), expr("r div outdeg").as("contrib"))
      val prev = r
      r = nodes
        .join(contrib.groupBy("node").agg(sum("contrib").as("sc")),
          Seq("node"), "left")
        .select(col("node"),
          expr("150000 + (850000 * coalesce(sc, 0)) div 1000000").as("r"))
        .localCheckpoint()
      if (tolScaled > 0L) {
        // 1-row driver probe per round (the x172/x43 budget) over the two
        // materialized iterates.
        val delta = r
          .join(prev.withColumnRenamed("r", "pr"), "node")
          .agg(max(abs(col("r") - col("pr"))).as("d"))
          .collect()(0).getLong(0)
        done = delta <= tolScaled
      }
      QueryDef.dropCheckpoint(prev)
    }
    val out = r
      .select(col("node").as("part_id"), col("r").cast("long").as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("part_id")).limit(20)
    (out, rounds)
  }
}
