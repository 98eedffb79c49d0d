package graft

/** Mechanized "would it survive 100×" gate (r8 verdict #5): the tri-SF
  * sweep existed as PERF.md prose; this spec MEASURES the sf0.01→sf0.1
  * wall-clock slope for the dedup/ANN/graph family on every `sbt test`
  * and fails when any member goes superlinear in the data growth.
  *
  * The data grows 10× between the two SFs, so a plan whose cost is
  * linear-ish in the input (band-key equi-joins, prefix filters,
  * cluster-bounded scans — the shapes these queries claim) must stay at
  * slope ≈ 10 or below; an accidental all-pairs/cross term shows up as
  * slope ≈ 100 long before anyone reads a PERF table. The gate allows
  * 3× headroom over linear (slope ≤ 30) because small-SF times carry
  * fixed per-query overheads (plan compile, localCheckpoint setup) that
  * DEFLATE the denominator — a margin violation therefore signals a
  * genuine quadratic term, not timer noise. Times are min-of-2 after a
  * shared warmup, the Bench idiom.
  */
class ScalingSlopeSpec extends SparkSuite {

  private val family = Seq(
    "x02_ngram_jaccard", "x03_minhash_lsh", "x128_ppjoin",
    "x137_incremental_dedup", "x152_triangles",
    // r9 members: the gram-hash inverted index (a hidden all-pairs term
    // would surface exactly here) and the PQ pipeline (trained per
    // subspace — its only corpus-quadratic risk is the certification
    // exact side, which is probeSet-bounded, not corpus-bounded).
    "x165_exact_substring_spans", "x166_ann_pq_recall",
    "x169_ann_ivfpq_recall",
    // r9b members: containment shares x02's inverted-index candidate
    // risk (hot-shingle fan-out); alternating-star CC and the
    // cluster-keyed split both iterate over the LSH pair graph — a
    // superlinear slope here would mean the pair graph itself (not the
    // corpus) grew quadratically.
    "x179_shingle_containment", "x172_cc_alternating_star",
    "x175_leakage_safe_split",
    // r10 members (r9 verdict #4): the skew demonstrator pair — each
    // re-derives its co-purchase graph by design, so they are top suite
    // costs; the gate pins that the cost is the graph DERIVATION (linear
    // joins + aggregates), with no hidden wedge-explosion term. The
    // id-oriented control (x162) is allowed to be slower than x163 —
    // that asymmetry is the demonstrator's point — but both must stay
    // linear-ish in data growth.
    "x162_triangles_skew_id", "x163_triangles_skew_degree",
    // the probe-escalation certification: candidates are probeSet-bounded
    // (≤ |Q|·n), the exact side is the one certification corpus pass —
    // both linear in n, and the gate pins that no radius term went
    // quadratic.
    "x185_ann_rerank_floor",
    // k-core peeling: per-round cost must be |doomed-set| joins against
    // the once-materialized edge list, never an edge-list rewrite — a
    // slope blowup here means a round went edge-quadratic (x187/x188 are
    // sub-second at both SFs, below the gate's 0.2 s denominator floor,
    // so they carry no signal and are left out).
    "x186_kcore_peel",
    // r11 members: x197 rides the x165 gram-hash index (same hidden
    // all-pairs risk surface); x200 iterates the LSH pair graph like
    // x175; x201's per-round joins are edge-bounded — a slope blowup
    // means the w>=2 co-purchase edge set (not the corpus) went
    // quadratic; x202's banded candidate join is the multimodal
    // analog of x03 — band-value buckets exploding would surface here.
    "x197_gram_novelty", "x200_quality_canonical",
    "x201_lpa_communities", "x202_phash_neardup",
    // r14 members: the composed corpus pipeline inherits every member
    // risk at once (x156's bigram pass, the survivor-restricted LSH pair
    // join, the Hamilton fixpoint, the packing prefix sum) — a hidden
    // cross term anywhere in the chain surfaces as the pipeline's slope;
    // the streaming placement adds per-microbatch state IO on top of
    // x137's new×(new∪old) joins, and the gate pins that the generation
    // rewrites stay linear in the corpus. (x252 is sub-second at both
    // SFs — below the 0.2 s denominator floor, no signal, left out like
    // x187/x188.)
    "x250_corpus_pipeline", "x251_stream_incremental_dedup")

  private def timeOnce(name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    dt
  }

  test("dedup/ANN/graph family scales sublinearly-with-margin from sf0.01 to sf0.1") {
    val lo = "/root/testdata/sf0.01"
    val hi = "/root/testdata/sf0.1"
    val slopes = family.map { q =>
      timeOnce(q, lo) // warmup (JIT + codegen caches, both plans compiled)
      val tLo = math.min(timeOnce(q, lo), timeOnce(q, lo))
      val tHi = math.min(timeOnce(q, hi), timeOnce(q, hi))
      // Clamp the denominator at 0.2 s: below that the measurement is
      // dominated by fixed overhead and the ratio is meaningless noise.
      val slope = tHi / math.max(tLo, 0.2)
      info(f"$q%-24s sf0.01=$tLo%5.2fs  sf0.1=$tHi%5.2fs  slope=$slope%5.1f×")
      (q, tLo, tHi, slope)
    }
    slopes.foreach { case (q, tLo, tHi, slope) =>
      assert(slope <= 30.0,
        s"$q went superlinear: sf0.01=$tLo s -> sf0.1=$tHi s " +
          s"(slope $slope× > 30× gate; 10× data growth)")
    }
  }
}
