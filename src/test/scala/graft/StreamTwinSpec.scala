package graft

/** x241/x242: the streaming twins must drain to EXACTLY their batch
  * siblings — same rows, not just same totals (the shared-oracle claim,
  * asserted directly engine-side too).
  */
class StreamTwinSpec extends SparkSuite {

  test("x241 streaming contract drains to the batch contract row for row") {
    val stream = SparkEntry.queries("x241_stream_contract")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = SparkEntry.queries("x240_data_contract")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(stream.toSeq == batch.toSeq,
      "incremental contract diverged from the batch contract")
  }

  test("x242 streaming HLL drains to the batch registers (diff column 0)") {
    val row = SparkEntry.queries("x242_stream_hll")(spark, sfDir)
      .collect().head
    // merge_reg_diff here counts drained-vs-batch register disagreements
    // in BOTH directions — the register-level drained == batch proof.
    assert(row.getLong(5) == 0, s"streaming registers diverged: $row")
    val batch = SparkEntry.queries("x237_hll_certify")(spark, sfDir)
      .collect().head
    assert(row.toSeq == batch.toSeq,
      "streaming HLL certification row diverged from batch")
  }

  test("x248 streaming manifest drains to the batch manifest row for row") {
    val stream = SparkEntry.queries("x248_stream_manifest")(spark, sfDir)
      .collect().map(_.toSeq)
    val batch = SparkEntry.queries("x192_content_manifest")(spark, sfDir)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty, "drained manifest is empty")
    assert(stream.toSeq == batch.toSeq,
      "incrementally-maintained manifest diverged from the batch manifest")
    // The finalize must have had real version churn to resolve: the
    // update-mode sink holds MORE versions than sources (the staged
    // stream drains in 4 microbatches, so sources emit multiple
    // versions and the non-monotone fp_xor genuinely fluctuates —
    // otherwise this test would pass vacuously on a 1-batch drain).
    val versions = spark.table("x248_stream_manifest_sink").count()
    assert(versions > stream.length,
      s"only $versions sink versions for ${stream.length} sources — " +
        "the drain was not incremental")
  }
}
