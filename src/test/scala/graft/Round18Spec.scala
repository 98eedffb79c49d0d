package graft

import org.apache.spark.sql.functions._

/** Round-18 twins (r12 verdict #4/#5): the promised scale paths must
  * compute EXACTLY what their declared twins compute — the oracles are
  * shared verbatim, and these specs additionally pin the structural
  * claims the oracle can't see (candidate budget, rank-table identity).
  */
class Round18Spec extends SparkSuite {

  test("x245: ANN candidate budget strictly sub-cross-product, mutual pairs == x235 row for row") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val scored = graft.operators.Similarity.bitextAnnScored(spark, docs, emb)
    val nCand = scored.count()
    def sideN(lang: String): Long =
      docs.filter(col("lang") === lang)
        .select(col("doc_id").as("vec_id"))
        .join(emb.select("vec_id"), "vec_id").count()
    val cross = sideN("en") * sideN("fr")
    assert(nCand > 0, "no candidates admitted — the index is broken")
    assert(nCand < cross,
      s"scanned $nCand candidate pairs vs cross product $cross — " +
        "the candidate generator is not pruning at all")

    val ann = SparkEntry.queries("x245_bitext_mine_ann")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = SparkEntry.queries("x235_bitext_mine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full.nonEmpty, "x235 mined no mutual pairs — vacuous fixture")
    assert(ann == full,
      s"mutual sets diverge: ann=${ann.size} full=${full.size} — " +
        "the radius-2 candidate set misses an argmax on this fixture")
  }

  test("x246: two-phase rank identical to x238's self-join rank; sweep outputs identical") {
    val vocab = graft.operators.TextOps.tokens(Tables.documents(spark, sfDir))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val twoPhase = graft.queries.Round18Queries.twoPhaseRank(vocab)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val selfJoin = vocab.as("x").join(vocab.as("y"),
        col("y.cnt") > col("x.cnt") ||
          (col("y.cnt") === col("x.cnt") && col("y.w") < col("x.w")),
        "left")
      .groupBy(col("x.w").as("w"), col("x.cnt").as("cnt"))
      .agg(count(col("y.w")).as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(twoPhase.nonEmpty, "empty vocabulary — vacuous fixture")
    assert(twoPhase == selfJoin,
      "two-phase rank diverges from the self-join rank")
    // The rank function itself must be a permutation of 0..n-1 — a bucket
    // offset off by one row would still agree with a self-join bug, so
    // pin exactness independently.
    assert(twoPhase.map(_._3).sorted == (0L until twoPhase.size.toLong),
      "ranks are not a permutation of 0..n-1")

    val a = SparkEntry.queries("x238_vocab_coverage_sweep")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("x246_vocab_sweep_twophase")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "x246's sweep output differs from x238's")
  }

  test("x247: manifest gate non-vacuous, clean sources pass untouched, diff conserves the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val rows = SparkEntry.queries("x247_manifest_pruned_diff")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val allSrcs = docs.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    val cleanSrcs = docs.select(col("source")).distinct()
      .filter(!graft.queries.Round18Queries.movedClass(col("source")))
      .collect().map(_.getString(0)).toSet
    // Both manifest branches must be live — x199's graft touches every
    // source (measured), which is why x247 needed its own split.
    assert(cleanSrcs.nonEmpty && cleanSrcs.size < allSrcs.size,
      s"degenerate source split: ${cleanSrcs.size}/${allSrcs.size} clean")
    assert(rows.map(_._1).toSet == allSrcs,
      "the report must cover every source, pruned or not")
    rows.filter(r => cleanSrcs(r._1)).foreach { r =>
      assert(r._2 == 0 && r._3 == 0 && r._4 == 0 && r._5 > 0,
        s"clean-class source reported activity (manifest gate leaked): $r")
    }
    assert(rows.exists(r => r._2 + r._3 + r._4 > 0),
      "no source reported any activity — the graft is vacuous")
    // Conservation: every OLD doc is exactly one of unchanged/changed/
    // removed, and every addition is one grafted re-key.
    val nDocs = docs.count()
    assert(rows.map(r => r._3 + r._4 + r._5).sum == nDocs,
      "removed + changed + unchanged must partition the old snapshot")
    val expectedAdds = docs.filter(
      graft.queries.Round18Queries.movedClass(col("source")) &&
        col("doc_id") % 17 === 2).count()
    assert(rows.map(_._2).sum == expectedAdds,
      "added total differs from the grafted re-key count")
    // The prune is worth having: the diff join's input is bounded by the
    // moved sources' rows, a strict subset of the corpus.
    val movedDocs = docs.filter(
      graft.queries.Round18Queries.movedClass(col("source"))).count()
    assert(movedDocs < nDocs,
      "manifest prune admits the whole corpus — nothing was skipped")
  }

  test("x249: data card conserves the corpus and every signal is live") {
    val docs = Tables.documents(spark, sfDir)
    val rows = SparkEntry.queries("x249_datacard")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._2).sum == docs.count(),
      "per-source doc counts must partition the corpus")
    assert(rows.map(_._3).sum ==
      docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
        .collect().head.getLong(0),
      "per-source char totals must sum to the corpus total")
    // Exact-dup docs: recompute independently (correct even when the
    // answer is zero — the sf0.001/sf0.01 fixtures plant only NEAR dups,
    // measured; exact raw-text dups exist from sf0.1 up).
    val dupBySource = docs.groupBy(md5(col("text")).as("fp"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("c"))
      .filter(col("c") > 1).select("fp")
      .join(docs.select(col("source"), md5(col("text")).as("fp")), "fp")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r._6 == dupBySource.getOrElse(r._1, 0L),
        s"dup_docs for ${r._1} differs from the independent recomputation")
    }
    // Liveness of the dup signal at the SF where the fixture plants
    // exact dups (sf0.1 — the same cross-SF read FixtureSchemaSpec does).
    val rowsBig = SparkEntry.queries("x249_datacard")(
      spark, "/root/testdata/sf0.1")
      .collect().map(r => (r.getString(0), r.getLong(5)))
    assert(rowsBig.exists(_._2 > 0),
      "no source reports exact-dup docs at sf0.1 — the planted dups vanished")
    assert(rows.forall(r => r._5 >= 1),
      "a source with documents must have at least one language")
    assert(rows.forall(r => r._7 >= 0 && r._7 <= 10000),
      "mean quality must stay inside the score's [0, 10000] range")
    assert(rows.map(_._7).distinct.length > 1,
      "every source reports the same mean quality — the signal is dead")
  }
}
