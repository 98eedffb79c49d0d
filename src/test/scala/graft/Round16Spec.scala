package graft

/** Semantic anchors for x238/x239/x240. */
class Round16Spec extends SparkSuite {

  test("x238 coverage sweep: monotone, complementary, saturating") {
    val rows = SparkEntry.queries("x238_vocab_coverage_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L, 32L))
    rows.foreach { r =>
      assert(r._2 <= r._1, s"kept more types than the budget: $r")
      // coverage + oov = 1000 up to one DIV-truncation unit.
      assert(r._3 + r._4 >= 999 && r._3 + r._4 <= 1000, s"shares drift: $r")
    }
    assert(rows.sliding(2).forall(p => p(0)._3 <= p(1)._3),
      "coverage must be monotone in the vocab budget")
    // The 31-type generator vocabulary saturates at V = 32.
    assert(rows.last._3 == 1000 && rows.last._4 == 0,
      s"full-vocab budget did not reach total coverage: ${rows.last}")
    // Zipf head: the 2-type budget already buys a nontrivial share.
    assert(rows.head._3 > 50, s"head coverage implausibly small: ${rows.head}")
  }

  test("x239 certificate: both partitionings produce the identical fingerprint") {
    // hash_sum is BIGINT since r13 (mod-2⁶³, the x192 idiom — §7.4: the
    // raw DECIMAL(38,0) emission failed the driver's pandas gate in r12).
    val rows = SparkEntry.queries("x239_repartition_invariance")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == Seq("p07", "p32"))
    assert(rows.map(_._2).distinct.length == 1, s"row counts diverged: $rows")
    assert(rows.map(_._3).distinct.length == 1,
      s"fingerprints diverged across partitionings: $rows")
  }

  test("x240 contract: every declared check fires on its class, control clean") {
    val rows = SparkEntry.queries("x240_data_contract")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("1_user_id_nonneg",
      "2_event_type_enum", "3_value_nonneg", "4_ts_freshness",
      "5_user_id_complete"))
    val n = Tables.events(spark, sfDir).count()
    rows.foreach { r =>
      assert(r._3 == n, s"check scanned the wrong row count: $r")
      assert((r._2 == 0) == (r._4 == 1), s"pass flag inconsistent: $r")
    }
    // The four grafted violation classes are all non-vacuous...
    rows.init.foreach { r =>
      assert(r._2 > 0, s"grafted violation class never fired: $r")
    }
    // ...and the completeness control stays clean.
    assert(rows.last._2 == 0, s"control check dirty: ${rows.last}")
    // Exact class accounting for the modulus grafts.
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    assert(rows(0)._2 == ev.filter(col("event_id") % 13 === 5).count())
    assert(rows(1)._2 == ev.filter(col("event_id") % 17 === 3).count())
  }
}
