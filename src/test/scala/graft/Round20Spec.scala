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

    // Full-key segment pattern (r15 advice #1): `contains("_b")` also
    // matched the `_zdone` completion marker whenever the content key's
    // hex happened to contain 'b', inflating segRows ~1/16 of corpus
    // versions.
    val segs = spark.catalog.listTables().collect().map(_.name)
      .filter(_.matches("graft_annseg_[0-9a-f]{16}_b\\d+"))
    assert(segs.length >= 2,
      s"only ${segs.length} segment table(s) — the index was not " +
        "maintained across microbatches")

    // AQE's executedPlan string appends an "Initial Plan" rendering —
    // count scans in the FINAL plan only.
    val plan = streamed.queryExecution.executedPlan.toString
      .split("Initial Plan").head
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
      .filter(_.matches("graft_annseg_[0-9a-f]{16}_b\\d+"))
    assert(again == mem, "reused segment index diverges")
    assert(segsAgain.sorted.toSeq == segs.sorted.toSeq,
      "the second probe changed the segment set — reuse re-streamed")
  }

  test("x256: compaction folds the segments losslessly; probe pays ONE pruned scan") {
    val emb = Tables.embeddings(spark, sfDir)
    graft.operators.StoredTables.sweepStale(spark, "graft_anncpt_", _ => false)
    val folded = graft.operators.Similarity
      .annSegmentsCompacted(spark, emb, sfDir, 0L, 10)
    val got = folded.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = graft.operators.Similarity.annTopKBanded(spark, emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got == mem,
      "compacted index diverges from the in-memory route")
    // Lossless fold: compacted table rows == sum over segment tables.
    val segs = spark.catalog.listTables().collect().map(_.name)
      .filter(_.matches("graft_annseg_[0-9a-f]{16}_b\\d+"))
    val cpt = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_anncpt_"))
    assert(cpt.length == 1, s"expected one compacted table, got ${cpt.length}")
    val segRows = segs.map(t => spark.table(t).count()).sum
    assert(spark.table(cpt.head).count() == segRows,
      "compaction changed the index row count — the fold is not lossless")
    // Read amplification: ONE bucket-pruned scan, not one per segment
    // (final plan only — AQE appends an "Initial Plan" duplicate).
    val plan = folded.queryExecution.executedPlan.toString
      .split("Initial Plan").head
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(prunes.size == 1,
      s"expected exactly one pruned scan after compaction, found " +
        s"${prunes.size}")
    assert(prunes.head.group(1).toInt < prunes.head.group(2).toInt,
      s"compacted scan selected all buckets: ${prunes.head.group(0)}")
  }
}
