package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse lexical retrieval over the documents table — BM25 ranked top-k.
  *
  * The reference pipeline library has no retrieval surface at all
  * (SURVEY.md §2.B); this is part of the LLM-data-pipeline extension: BM25
  * is the standard first-stage retriever for decontamination screens,
  * eval-set leakage audits, and RAG corpus construction.
  *
  * Scale shape (100 TB): the statistics tables (df per term, doc length,
  * corpus aggregates) are hash aggregates over the token stream — uniform
  * keys, map-side partials. The query set is tiny and BROADCASTS to the
  * postings; only postings matching some query term survive the join, so
  * the scored row count is Σ_t df(t) over query terms, never |corpus|.
  * Per-query top-k is a rank window that Spark prunes to per-partition
  * heaps (WindowGroupLimit) before the shuffle.
  *
  * Determinism: every arithmetic step except `ln` is an exactly-rounded
  * IEEE op evaluated in the same order on both engines; `ln` can differ by
  * an ulp between libm implementations, so the per-term score is rounded
  * to 6 decimals (established x89 idiom) and the per-doc sum runs in
  * DECIMAL(18,6) — exact and aggregation-order-independent (QueryDef.dsum
  * rationale). Ranking compares the decimal sums, so ranks agree too.
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10

  /** (qid, term) probe queries — vocabulary from FIXTURES.md. */
  private val QueryTerms: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join",
    2L -> "window", 2L -> "agg",
    3L -> "fast", 3L -> "scan", 3L -> "slow")

  /** BM25 top-k per query over [[TextOps.tokens]] tokenization.
    *
    * idf is the Lucene/ATIRE variant ln(1 + (N - df + 0.5)/(df + 0.5)) —
    * always positive, so high-df terms degrade gracefully instead of
    * flipping sign.
    *
    * The df table is QUERY-SIZED by construction: postings are semi-joined
    * to the (broadcast, tiny) query-term set BEFORE the per-term document
    * frequencies are aggregated, so `dfreq` holds ≤ |query terms| rows no
    * matter how large the corpus vocabulary grows — the full-vocab
    * `groupBy("w")` is never computed. df values for the surviving terms
    * are identical to the full-vocab aggregate (the semi-join only drops
    * terms no query ever scores), so the oracle is unchanged.
    */
  def bm25TopK(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val toks = TextOps.tokens(docs)
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      sum(col("dl")).cast("double").as("tot"))
    val q = QueryTerms.toDF("qid", "w")
    // Query-term postings only: every downstream table (df, scored rows)
    // is bounded by Σ_t df(t) over query terms, never the vocabulary.
    val tfQ = tf.join(broadcast(q.select("w").distinct()), Seq("w"),
      "left_semi")
    val dfreq = tfQ.groupBy("w").agg(count(lit(1)).cast("double").as("df"))

    // Single broadcast-joined projection: query-term postings ⋈ query
    // terms ⋈ df ⋈ dl ⋈ corpus stats. Written so both engines evaluate the
    // identical left-associated double expression tree.
    val avgdl = col("tot") / col("nd")
    val idf = log(lit(1.0) + (col("nd") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val denom = tfD + lit(K1) *
      (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / avgdl)
    val score = round(idf * (tfD * lit(K1 + 1)) / denom, 6)

    val perTerm = tfQ.join(broadcast(q), "w")
      .join(broadcast(dfreq), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        score.cast(DecimalType(18, 6)).as("s"))

    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("doc_id"))
    perTerm.groupBy("qid", "doc_id")
      .agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("rn").cast("long").as("rank"), col("doc_id"),
        col("score").cast("double").as("score"))
      .orderBy("qid", "rank")
  }

  private val bm25Sql: String = {
    val values = QueryTerms
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH toks AS (${TextOps.tokensSql}),
       | tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | stats AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
       |                  CAST(sum(dl) AS DOUBLE) AS tot FROM dl),
       | dfreq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df
       |           FROM tf GROUP BY 1),
       | q(qid, w) AS (VALUES $values),
       | per_term AS (
       |   SELECT q.qid, tf.doc_id,
       |          CAST(round(
       |            ln(1.0 + (stats.nd - dfreq.df + 0.5) / (dfreq.df + 0.5))
       |            * (CAST(tf.tf AS DOUBLE) * ${K1 + 1})
       |            / (CAST(tf.tf AS DOUBLE) + $K1 *
       |               (1.0 - $B + $B * CAST(dl.dl AS DOUBLE)
       |                / (stats.tot / stats.nd))), 6)
       |            AS DECIMAL(18,6)) AS s
       |   FROM tf JOIN q USING (w) JOIN dfreq USING (w)
       |        JOIN dl USING (doc_id) CROSS JOIN stats),
       | scored AS (SELECT qid, doc_id, sum(s) AS score
       |            FROM per_term GROUP BY 1, 2)
       |SELECT qid, CAST(rn AS BIGINT) AS rank, doc_id,
       |       CAST(score AS DOUBLE) AS score
       |FROM (SELECT qid, doc_id, score,
       |             row_number() OVER (PARTITION BY qid
       |               ORDER BY score DESC, doc_id) AS rn
       |      FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rank""".stripMargin
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x170_bm25_topk",
      (s, dir) => bm25TopK(s, Tables.documents(s, dir)),
      Some(bm25Sql)))
}
