package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Similarity, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-18: the two scale twins the r12 verdict asked for (#4, #5) —
  * both promised in earlier rounds' Scaladoc as the "at 10⁷/100 TB this
  * becomes ..." swap and now shipped as queries sharing their declared
  * twin's oracle VERBATIM, so the hash gate proves the scale path and
  * the declared path compute the same answer.
  */
object Round18Queries {

  // ---- x245: ANN-candidate bitext mining (x235's scale twin) -------------

  /** x245: x235's mutual-best bitext mining with the crossJoin scored
    * input swapped for the x185 radius-2 escalated banded-LSH candidates
    * (the x230 composition — same constants, same tail; the heavy
    * lifting and the honest coverage discussion live in
    * [[Similarity.bitextAnnScored]]). Shares x235's oracle verbatim;
    * Round18Spec pins the candidate budget strictly sub-cross-product
    * and mutual-pair agreement with x235 row for row.
    */
  private def bitextMineAnn(s: SparkSession, dir: String): DataFrame =
    Similarity.bitextMineAnn(s, Tables.documents(s, dir),
      Tables.embeddings(s, dir))

  // ---- x246: two-phase prefix-sum vocab rank (x238's scale twin) ---------

  /** The two-phase rank over a (w, cnt) vocabulary: rank = number of
    * strictly-greater rows in the total (cnt desc, w asc) order, computed
    * WITHOUT the vocab² self-join — the x207/x187 idiom applied to a
    * skewed key:
    *
    *  1. bucket by (cnt, first char of w) — the bucket key is a PREFIX
    *     of the sort key, so bucket order refines to row order;
    *  2. per-bucket counts → bucket offsets via a join-rank over the
    *     BUCKET table (x70/x187 idiom — buckets²-bounded, and the bucket
    *     table is |distinct cnt| × |alphabet| ≲ √(corpus tokens) · 26,
    *     microscopic next to vocab²; no unpartitioned window exists);
    *  3. rank = offset + (row_number within the bucket) − 1 — the only
    *     vocab-sized window is PARTITIONED by bucket.
    *
    * At a 10⁷-type web vocab the same shape holds with a 2-char prefix
    * (the x207 widening move); x238's self-join would be 10¹⁴ pairs.
    * Exposed for Round18Spec, which proves rank-identical output against
    * x238's self-join rank on the fixture.
    */
  private[graft] def twoPhaseRank(vocab: DataFrame): DataFrame = {
    val b = vocab.withColumn("pfx", substring(col("w"), 1, 1))
    val bc = b.groupBy("cnt", "pfx").agg(count(lit(1)).as("bn"))
    val off = bc.as("x").join(bc.as("y"),
        col("y.cnt") > col("x.cnt") ||
          (col("y.cnt") === col("x.cnt") && col("y.pfx") < col("x.pfx")),
        "left")
      .groupBy(col("x.cnt").as("cnt"), col("x.pfx").as("pfx"))
      .agg(coalesce(sum(col("y.bn")), lit(0L)).as("off"))
    val wIn = Window.partitionBy("cnt", "pfx").orderBy("w")
    b.join(broadcast(off), Seq("cnt", "pfx"))
      .withColumn("rank", col("off") + row_number().over(wIn) - 1)
      .select("w", "cnt", "rank")
  }

  /** x246: x238's vocabulary-budget sweep with the vocab² self-join rank
    * swapped for [[twoPhaseRank]] — the 10⁷-type-regime rank x238's
    * Scaladoc documents (r12 verdict #5). Tail and oracle shared with
    * x238 verbatim: the hash gate proves the two ranks induce the same
    * coverage curve; Round18Spec proves the rank tables themselves are
    * identical row for row.
    */
  private def vocabCoverageTwoPhase(s: SparkSession, dir: String)
      : DataFrame = {
    val vocab = TextOps.tokens(Tables.documents(s, dir))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // 3 consumers: bucket counts, rank join, total
    Round16Queries.coverageSweepTail(s, vocab, twoPhaseRank(vocab))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("x245_bitext_mine_ann", bitextMineAnn,
      Some(Round15bQueries.bitextMineSql)),
    QueryDef("x246_vocab_sweep_twophase", vocabCoverageTwoPhase,
      Some(Round16Queries.vocabCoverageSweepSql)))
}
