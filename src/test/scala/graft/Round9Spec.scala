package graft

/** Invariant anchors for the round-9 changes (incl. the r8 advisory
  * fixes: each test pins the edge case the fix exists for).
  */
class Round9Spec extends SparkSuite {

  test("TimeCols.ntzEpochMicros is session-timezone independent") {
    // The stagers and eventsUs bases normalize NTZ event time to epoch
    // micros through TimeCols; the previous CAST-to-TIMESTAMP rendering
    // shifted by the session offset on any non-UTC session. Prove the
    // helper reads the NTZ wall time as UTC on BOTH sessions.
    val utc = Tables.events(spark, sfDir)
      .select(graft.functions.TimeCols.ntzEpochMicros("ts").as("us"))
      .agg(org.apache.spark.sql.functions.min("us"),
        org.apache.spark.sql.functions.max("us")).head()
    val tokyo = spark.newSession()
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    val jst = Tables.events(tokyo, sfDir)
      .select(graft.functions.TimeCols.ntzEpochMicros("ts").as("us"))
      .agg(org.apache.spark.sql.functions.min("us"),
        org.apache.spark.sql.functions.max("us")).head()
    assert(utc == jst, s"session tz leaked into ntzEpochMicros: $utc vs $jst")
    // and the value really is the UTC interpretation, not merely stable:
    val probe = spark.sql(
      "SELECT " + graft.functions.TimeCols.ntzEpochMicrosExpr(
        "TIMESTAMP_NTZ'2024-03-15 12:34:56.789012'")).head().getLong(0)
    assert(probe == 1710506096789012L)
  }

  test("x30/x48 window bucketing is session-timezone independent") {
    // NTZ-native session_window/window: a Tokyo session must produce the
    // identical bucket table (the old CAST path shifted starts by 9h and,
    // for non-whole-hour offsets, realigned sliding buckets entirely).
    val tokyo = spark.newSession()
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    for (q <- Seq("x30_session_window", "x48_sliding_window")) {
      val a = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(q)(tokyo, sfDir).collect().toSeq
      assert(a == b, s"$q drifted on a non-UTC session")
    }
  }

  test("events loader rejects an unrecognized ts encoding loudly") {
    // The former catch-all routed anything non-timestamp to the legacy
    // nanos DIV-1000 branch — a future plain-INT64 micros file would
    // silently shrink every timestamp 1000×. Now: descriptive failure.
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9_enc")
    try {
      Tables.events(spark, sfDir).limit(10)
        .withColumn("ts", org.apache.spark.sql.functions
          .col("ts").cast("string"))
        .write.parquet(s"$tmp/events.parquet")
      val e = intercept[IllegalStateException] {
        Tables.events(spark, tmp.toString).collect()
      }
      assert(e.getMessage.contains("unrecognized encoding"))
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(tmp)
      try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
  }

  test("x157 sink is per-run unique and cleaned up") {
    // The previous keyed delete-then-repopulate store let concurrent
    // invocations delete each other's lines mid-run; now each call stages
    // into a UUID directory removed in the finally — repeated calls agree
    // and leave no graft_x157_lines_* residue behind.
    def sinkDirs(): Set[String] = {
      val tmpdir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(tmpdir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft_x157_lines_")).toSet
      finally s.close()
    }
    val before = sinkDirs()
    val a = SparkEntry.queries("x157_stream_boilerplate")(spark, sfDir)
      .collect().toSeq.sortBy(_.toString)
    val b = SparkEntry.queries("x157_stream_boilerplate")(spark, sfDir)
      .collect().toSeq.sortBy(_.toString)
    assert(a == b, "repeated x157 invocations disagree")
    assert(sinkDirs() == before, "x157 left line-store residue in tmpdir")
  }

  test("x161: multiprobe recall dominates single-probe, strictly on this fixture") {
    val rows = SparkEntry.queries("x161_ann_recall_lift")(spark, sfDir)
      .collect()
    assert(rows.length == 8, "one row per certified probe query")
    rows.foreach { r =>
      val s = r.getAs[Long]("n_hits_single")
      val m = r.getAs[Long]("n_hits_multi")
      // structural: the multiprobe candidate set is a superset, and an
      // exact-top-k member in a candidate set always survives its
      // re-ranked top-k (at most k-1 items can outscore it).
      assert(m >= s, s"qid=${r.getAs[Long]("qid")}: multi $m < single $s")
      // measured on this fixture: the 1-bit probe expansion buys recall
      // on EVERY probe query (the gap x160 quantified).
      assert(m > s, s"qid=${r.getAs[Long]("qid")}: no strict lift ($s -> $m)")
    }
  }

  test("x165: spans are maximal (disjoint, k-separated) and textually real") {
    val k = 8
    val spans = SparkEntry.queries("x165_exact_substring_spans")(spark, sfDir)
      .collect()
    assert(spans.nonEmpty, "exact-substring fixture is vacuous")
    spans.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("span_start"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("dup_tokens") ==
          r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1)
        assert(r.getAs[Long]("dup_tokens") >= k,
          s"doc=$doc span shorter than the gram size")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // maximality: had the gap been <= k the islands would have merged
          assert(b.getAs[Long]("span_start") > a.getAs[Long]("span_end") + 1,
            s"doc=$doc has mergeable adjacent spans")
        case _ =>
      }
    }
    // semantic anchor: a flagged span's first k-gram really does appear
    // verbatim in at least one OTHER document.
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase)
      .toMap
    val probe = spans.head
    val did = probe.getAs[Long]("doc_id")
    val toks = docs(did).split(" ").filter(_.nonEmpty)
    val start = probe.getAs[Long]("span_start").toInt - 1 // 1-based -> 0-based
    val gram = toks.slice(start, start + k).mkString(" ")
    assert(docs.exists { case (od, t) => od != did && t.contains(gram) },
      s"span gram of doc $did not found in any other doc")
  }

  test("x166: PQ-ADC recall integers are consistent and non-vacuous") {
    val rows = SparkEntry.queries("x166_ann_pq_recall")(spark, sfDir).collect()
    assert(rows.length == graft.operators.ProductQuant.PQ.probeSet)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= graft.operators.ProductQuant.PQ.topK)
      assert(r.getAs[Long]("recall_per_10k") ==
        h * 10000 / graft.operators.ProductQuant.PQ.topK)
    }
    // 4 centroids/subspace is a coarse codebook; the certification is
    // meaningful only if ADC actually recovers part of the exact top-k.
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0,
      "PQ route recovered nothing — certification vacuous")
  }

  test("x168: BPE merge frequencies are non-increasing and pairs distinct") {
    val merges = SparkEntry.queries("x168_bpe_train")(spark, sfDir).collect()
    assert(merges.length == graft.operators.BpeTrain.iters)
    assert(merges.map(_.getAs[Int]("it")).toSeq ==
      (1 to graft.operators.BpeTrain.iters))
    // BPE invariant: a pair present at iteration i+1 was a candidate (or a
    // sub-pair of one) at iteration i, so the chosen maxima never increase.
    val freqs = merges.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sorted.reverse,
      s"merge frequencies increased along the trajectory: $freqs")
    assert(freqs.forall(_ > 0))
    val pairs = merges.map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(pairs.distinct.length == pairs.length,
      "the same pair was merged twice — merge did not eliminate it")
  }

  test("x169: IVF-PQ recall integers are consistent and non-vacuous") {
    val rows = SparkEntry.queries("x169_ann_ivfpq_recall")(spark, sfDir)
      .collect()
    assert(rows.length == graft.operators.ProductQuant.PQ.probeSet)
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= graft.operators.ProductQuant.PQ.topK)
      assert(r.getAs[Long]("recall_per_10k") ==
        h * 10000 / graft.operators.ProductQuant.PQ.topK)
    }
    // nprobe=2 of 4 cells + 4 residual codebooks must still recover part
    // of the exact top-k or the composition certifies nothing.
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0,
      "IVF-PQ route recovered nothing — certification vacuous")
  }

  test("x167: re-election agrees with x43's cluster structure") {
    val audit = SparkEntry.queries("x167_deletion_propagation")(spark, sfDir)
      .collect()
    assert(audit.nonEmpty, "deletion fixture is vacuous")
    val clusterIds = SparkEntry.queries("x43_dedup_clusters")(spark, sfDir)
      .collect().map(_.getAs[Long]("cluster_id")).toSet
    audit.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(clusterIds.contains(cid), s"audit row for unknown cluster $cid")
      val before = r.getAs[Long]("n_before"); val after = r.getAs[Long]("n_after")
      assert(after < before, "untouched cluster in the audit")
      assert(r.getAs[Long]("old_canon") == cid,
        "canonical is the min-label by construction")
      if (after == 0) assert(r.isNullAt(r.fieldIndex("new_canon")),
        "wiped cluster must have no re-elected canonical")
      else assert(r.getAs[Long]("new_canon") >= cid,
        "re-elected canonical precedes the old minimum")
    }
  }
}
