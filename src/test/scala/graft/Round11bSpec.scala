package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-11b lifecycle operators: the snapshot
  * diff's classes reconcile against the plant schedule, the quality
  * election genuinely diverges from keep-first, and label propagation
  * finds structure strictly finer than one flooded component.
  */
class Round11bSpec extends SparkSuite {

  test("x199 diff classes reconcile exactly with the plant schedule") {
    val out = SparkEntry.queries("x199_snapshot_diff")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val ids = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val removed = ids.count(_ % 13 == 3).toLong
    val changed = ids.count(i => i % 13 != 3 && i % 11 == 5).toLong
    val added = ids.count(_ % 17 == 2).toLong
    val unchanged = ids.length - removed - changed
    assert(out.map(_._2).sum == added, "added total off")
    assert(out.map(_._3).sum == removed, "removed total off")
    assert(out.map(_._4).sum == changed, "changed total off")
    assert(out.map(_._5).sum == unchanged, "unchanged total off")
    Seq(added, removed, changed, unchanged).foreach(n =>
      assert(n > 0, "a diff class is empty — the fixture exercise is vacuous"))
  }

  test("x200 canonical carries its cluster's max quality and beats keep-first somewhere") {
    val out = SparkEntry.queries("x200_quality_canonical")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val quality = graft.operators.TextAnalysis
      .qualityScore(Tables.documents(spark, sfDir))
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (cid, canon, n, best) =>
      assert(n >= 2L, s"cluster $cid has a lone member — not a dup cluster")
      assert(quality(canon) == best,
        s"cluster $cid canonical $canon quality ${quality(canon)} != best $best")
    }
    // The retention policy must be OBSERVABLY different from x43's
    // keep-min-id (cluster_id IS the min member id): somewhere a
    // higher-quality later copy wins.
    assert(out.exists { case (cid, canon, _, _) => canon != cid },
      "every canonical is the min-id doc — quality election is vacuous here")
    // And min-id must still win exact ties: when the min-id member holds
    // the best quality, it is the canonical.
    out.filter { case (cid, _, _, best) => quality(cid) == best }
      .foreach { case (cid, canon, _, _) =>
        assert(canon == cid, s"cluster $cid: min-id member ties best quality but lost")
      }
  }

  test("x201 finds plural communities with plural membership") {
    val out = SparkEntry.queries("x201_lpa_communities")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length > 1,
      "label propagation flooded to one community — the plurality rule did nothing")
    assert(out.exists(_._2 >= 2L), "no community groups more than one node")
    // (No order relation between a community's label and its members: a
    // label is some node's ORIGINAL id, and that node may itself have
    // been relabeled elsewhere by round 3.)
    // Conservation: community sizes sum to the node count of the pruned
    // (w >= 2) graph.
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val nodes = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select("src").distinct().count()
    assert(out.map(_._2).sum == nodes, "community sizes don't partition the node set")
  }
}
