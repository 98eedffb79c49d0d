package graft

/** Round-20 (r14 verdict #4): the stream-maintained ANN segment index —
  * x252's persisted serving index composed with x251's incremental idiom.
  * The stream must actually run (≥ 2 microbatch segments), the probe must
  * answer exactly what the in-memory banded route answers, every segment
  * scan must be bucket-pruned, and the completion-marked build must be
  * reused (not re-streamed) by subsequent probes.
  */
class Round20Spec extends SparkSuite {

  test("x255: stream-built segments == in-memory route; >= 2 segments; pruning per segment; reuse") {
    val emb = Tables.embeddings(spark, sfDir)
    // Force a fresh streamed build: drop every annseg table including the
    // completion marker, so the reuse path cannot satisfy this test.
    graft.operators.StoredTables.sweepStale(spark, "graft_annseg_", _ => false)
    val streamed = graft.operators.Similarity
      .annTopKBandedStreamed(spark, emb, sfDir, 0L, 10)
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = graft.operators.Similarity.annTopKBanded(spark, emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got == mem,
      "stream-maintained segment index diverges from the in-memory route")

    val segs = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_annseg_") && n.contains("_b"))
    assert(segs.length >= 2,
      s"only ${segs.length} segment table(s) — the index was not " +
        "maintained across microbatches")

    val plan = streamed.queryExecution.executedPlan.toString
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(prunes.size >= 2,
      s"expected one bucket-pruned scan PER segment, found " +
        s"${prunes.size}:\n$plan")
    prunes.foreach(m => assert(m.group(1).toInt < m.group(2).toInt,
      s"a segment scan selected all buckets: ${m.group(0)}"))
    assert(!plan.contains("Exchange hashpartitioning(bv"),
      "a segment side was shuffled — the bucketed layout was ignored")

    // Reuse: the committed build serves the second probe without
    // re-streaming — the segment set is unchanged and answers match.
    val again = graft.operators.Similarity
      .annTopKBandedStreamed(spark, emb, sfDir, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val segsAgain = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_annseg_") && n.contains("_b"))
    assert(again == mem, "reused segment index diverges")
    assert(segsAgain.sorted.toSeq == segs.sorted.toSeq,
      "the second probe changed the segment set — reuse re-streamed")
  }
}
