package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-11 operators, each pinning the claim
  * the hash gate alone can't express: PMI's support floor and ranking,
  * the vectorizer's collision path and partitioning-invariance, count-
  * min's one-sided error law, novelty's order-attribution semantics, and
  * the streaming funnel's drained-equals-batch contract.
  */
class Round11Spec extends SparkSuite {

  test("x194 pairs respect the support floor and the ranking is verifiable") {
    val out = SparkEntry.queries("x194_pmi_colloc")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_._3 >= 5L), "a pair below the c_ab >= 5 support floor leaked")
    val lifts = out.map(_._4)
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b },
      "top-20 not sorted by lift")
    // Recompute the top pair's lift from independent counts.
    val (w, w2, cab, lift) = out.head
    val toks = graft.operators.TextOps.tokens(Tables.documents(spark, sfDir))
      .select("doc_id", "pos", "w").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val nu = toks.length.toLong
    val byDoc = toks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3))
    val bigrams = byDoc.values.flatMap(ws => ws.zip(ws.tail)).toSeq
    val nb = bigrams.size.toLong
    val cAb = bigrams.count(_ == (w, w2)).toLong
    val cA = toks.count(_._3 == w).toLong
    val cB = toks.count(_._3 == w2).toLong
    assert(cAb == cab, s"c_ab mismatch for ($w,$w2)")
    val want = (BigInt(cAb) * nu * nu * 1000000) / (BigInt(nb) * cA * cB)
    assert(BigInt(lift) == want, s"lift_ppm mismatch for ($w,$w2)")
  }

  test("x195 vector fingerprints are partitioning-invariant; collisions are real") {
    val base = SparkEntry.queries("x195_hash_vectorizer")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(base.forall(_._2 <= 64L), "nnz exceeds the bucket count")
    // l1 must equal the doc's token count exactly (hashing loses identity,
    // never mass).
    val tokCounts = graft.operators.TextOps.tokens(Tables.documents(spark, sfDir))
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.foreach { case (id, _, l1, _) =>
      assert(l1 == tokCounts(id), s"doc $id l1 != token count")
    }
    // The hashing trick's defining hazard must be exercised: >= 1 bucket
    // holding >= 2 distinct tokens at F=64.
    val collisions = graft.operators.TextOps.tokens(Tables.documents(spark, sfDir))
      .select((conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10)
        .cast("long") % 64).as("bkt"), col("w"))
      .groupBy("bkt").agg(count_distinct(col("w")).as("nd"))
      .filter(col("nd") >= 2).count()
    assert(collisions >= 1, "no hash collisions at F=64 — collision path vacuous")
    // Partitioning-invariance (x192 idiom): a scrambled scan must yield
    // identical fingerprints.
    val re = SparkEntry.queries("x195_hash_vectorizer")(spark, sfDir)
    val scrambled = re.sparkSession.createDataFrame(
      re.rdd.coalesce(1), re.schema) // force a different physical layout
    assert(scrambled.collect().map(r => (r.getLong(0), r.getLong(3))).toSet ==
      base.map(t => (t._1, t._4)).toSet, "fingerprints moved under re-layout")
  }

  test("x196 sketch never underestimates and genuinely collides") {
    val out = SparkEntry.queries("x196_countmin_certify")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 20)
    assert(out.forall(r => r._4 >= 0L && r._3 == r._2 + r._4),
      "count-min underestimated — the one-sided error law is broken")
    assert(out.exists(_._4 > 0L),
      "no probe overestimated at W=128 — the collision certification is vacuous")
  }

  test("x197 attributes novelty to the first occurrence, in doc_id order") {
    val out = SparkEntry.queries("x197_gram_novelty")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.forall(r => r._4 >= 0L && r._4 <= 1000L))
    assert(out.forall(r => r._3 <= r._2), "seen_before exceeds gram count")
    // The minimal doc_id can never have seen anything before itself.
    val minDoc = out.minBy(_._1)
    assert(minDoc._3 == 0L, s"doc ${minDoc._1} 'saw' grams before the corpus start")
    assert(out.exists(_._3 > 0L), "no doc repeats earlier content — fixture vacuous")
    // Order-attribution vs x178's symmetric diagnostic: every doc that saw
    // a gram earlier necessarily holds a cross-doc duplicated gram, so it
    // must be in x178's nonzero set.
    val dupDocs = SparkEntry.queries("x178_dup_gram_fraction")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).filter(_._2 > 0L)
      .map(_._1).toSet
    out.filter(_._3 > 0L).foreach { case (id, _, _, _) =>
      assert(dupDocs.contains(id),
        s"doc $id saw earlier grams but x178 reports no duplicated grams")
    }
  }

  test("x198 drained streaming funnel equals the batch funnel exactly") {
    val stream = SparkEntry.queries("x198_stream_funnel")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val batch = SparkEntry.queries("x142_funnel")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(stream.toSeq == batch.toSeq,
      s"drained stream != batch funnel:\n  stream ${stream.toSeq}\n  batch  ${batch.toSeq}")
    // The drain must have been genuinely incremental: at least one user's
    // state advanced across >= 2 microbatches.
    val maxVer = spark.table("x198_stream_funnel_sink")
      .agg(max(col("ver"))).head().getLong(0)
    assert(maxVer >= 2L, "funnel state machine saw a single batch — not incremental")
  }
}
