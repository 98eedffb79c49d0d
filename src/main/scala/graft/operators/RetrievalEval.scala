package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval evaluation (x213) — per-query reciprocal rank and recall@10
  * for the x170 BM25 ranker against a labeled relevance set: the eval
  * harness every retrieval deployment (decontamination screens, RAG
  * corpora) runs before trusting its ranker, and the quantitative twin of
  * x185's ANN recall certification for the LEXICAL path.
  *
  * Relevance is GRAFTED relationally (the x139/x204 idiom, replayed by
  * the oracle): per query q ∈ {1,2,3}, relevant docs (doc_id % (14+q) ==
  * q) get the marker term `relq<q>` three times; DISTRACTOR docs
  * (doc_id % (18+q) == 2q, and not relevant) get it once — so the
  * ranking is decided by BM25's tf saturation and length normalization,
  * not by trivial term presence, and the metrics are honest: recall@10
  * is bounded by 10/n_rel and the distractor pollution is real (spec
  * asserts distractors actually outscore nothing relevant only where the
  * math says so).
  *
  * Scale: identical to x170 — query-sized df/postings by construction
  * (the semi-join-before-aggregate shape), per-query ranks via a
  * WindowGroupLimit-prunable rank window; the metric aggregates are
  * query-count-sized. Integer metrics via DIV (x171 regime).
  */
object RetrievalEval {

  private val K1 = 1.2
  private val B = 0.75

  private def grafted(docs: DataFrame): DataFrame = {
    val marked = (1 to 3).foldLeft(col("text")) { (t, q) =>
      val rel = col("doc_id") % (14 + q) === q
      val dis = col("doc_id") % (18 + q) === 2 * q && !rel
      val m = lit(s" relq$q")
      when(rel, concat(t, m, m, m)).otherwise(when(dis, concat(t, m)).otherwise(t))
    }
    docs.withColumn("text", marked)
  }

  /** (qid, n_rel, first_rel_rank, rr_permille, recall10_permille). */
  def bm25Eval(spark: SparkSession, docs0: DataFrame): DataFrame = {
    import spark.implicits._
    val docs = grafted(docs0)
    val toks = TextOps.tokens(docs)
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("nd"),
      sum(col("dl")).cast("double").as("tot"))
    val q = (1 to 3).map(i => (i.toLong, s"relq$i")).toDF("qid", "w")
    val tfQ = tf.join(broadcast(q.select("w").distinct()), Seq("w"), "left_semi")
    val dfreq = tfQ.groupBy("w").agg(count(lit(1)).cast("double").as("df"))

    val avgdl = col("tot") / col("nd")
    val idf = log(lit(1.0) + (col("nd") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val denom = tfD + lit(K1) *
      (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / avgdl)
    val score = round(idf * (tfD * lit(K1 + 1)) / denom, 6)

    val ranked = tfQ.join(broadcast(q), "w")
      .join(broadcast(dfreq), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        score.cast(DecimalType(18, 6)).as("s"))
      .groupBy("qid", "doc_id").agg(sum(col("s")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("score"), asc("doc_id")))
        .cast("long"))

    val rel = ((col("qid") === 1 && col("doc_id") % 15 === 1) ||
      (col("qid") === 2 && col("doc_id") % 16 === 2) ||
      (col("qid") === 3 && col("doc_id") % 17 === 3)).cast("long")
    ranked.withColumn("rel", rel)
      .groupBy("qid")
      .agg(sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"),
        sum(when(col("rel") === 1 && col("rank") <= 10, 1L).otherwise(0L))
          .as("hits10"))
      .select(col("qid"), col("n_rel"), col("first_rel_rank"),
        expr("1000 DIV first_rel_rank").as("rr_permille"),
        expr("hits10 * 1000 DIV n_rel").as("recall10_permille"))
      .orderBy("qid")
  }

  private val bm25EvalSql: String = {
    val graftCase = """CASE
      | WHEN doc_id % 15 = 1 THEN ' relq1 relq1 relq1'
      | WHEN doc_id % 19 = 2 THEN ' relq1' ELSE '' END ||
      |CASE
      | WHEN doc_id % 16 = 2 THEN ' relq2 relq2 relq2'
      | WHEN doc_id % 20 = 4 THEN ' relq2' ELSE '' END ||
      |CASE
      | WHEN doc_id % 17 = 3 THEN ' relq3 relq3 relq3'
      | WHEN doc_id % 21 = 6 THEN ' relq3' ELSE '' END""".stripMargin
    val toksSql = TextOps.tokensSql.replace("FROM documents", "FROM g")
    s"""WITH g AS (SELECT doc_id, text || ($graftCase) AS text FROM documents),
       | toks AS ($toksSql),
       | tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
       | dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       | stats AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
       |                  CAST(sum(dl) AS DOUBLE) AS tot FROM dl),
       | dfreq AS (SELECT w, CAST(count(*) AS DOUBLE) AS df
       |           FROM tf GROUP BY 1),
       | q(qid, w) AS (VALUES (CAST(1 AS BIGINT), 'relq1'),
       |                      (CAST(2 AS BIGINT), 'relq2'),
       |                      (CAST(3 AS BIGINT), 'relq3')),
       | ranked AS (
       |   SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
       |            ORDER BY score DESC, doc_id) AS rank
       |   FROM (
       |     SELECT q.qid, tf.doc_id, sum(
       |            CAST(round(
       |              ln(1.0 + (stats.nd - dfreq.df + 0.5) / (dfreq.df + 0.5))
       |              * (CAST(tf.tf AS DOUBLE) * ${K1 + 1})
       |              / (CAST(tf.tf AS DOUBLE) + $K1 *
       |                 (1.0 - $B + $B * CAST(dl.dl AS DOUBLE)
       |                  / (stats.tot / stats.nd))), 6)
       |              AS DECIMAL(18,6))) AS score
       |     FROM tf JOIN q USING (w) JOIN dfreq USING (w)
       |          JOIN dl USING (doc_id) CROSS JOIN stats
       |     GROUP BY 1, 2) s),
       | lab AS (
       |   SELECT qid, doc_id, rank,
       |          CASE WHEN (qid = 1 AND doc_id % 15 = 1)
       |                 OR (qid = 2 AND doc_id % 16 = 2)
       |                 OR (qid = 3 AND doc_id % 17 = 3)
       |               THEN 1 ELSE 0 END AS rel
       |   FROM ranked),
       | m AS (
       |   SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel,
       |          CAST(min(CASE WHEN rel = 1 THEN rank END) AS BIGINT)
       |            AS first_rel_rank,
       |          CAST(sum(CASE WHEN rel = 1 AND rank <= 10 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS hits10
       |   FROM lab GROUP BY 1)
       |SELECT qid, n_rel, first_rel_rank,
       |       CAST(1000 // first_rel_rank AS BIGINT) AS rr_permille,
       |       CAST(hits10 * 1000 // n_rel AS BIGINT) AS recall10_permille
       |FROM m ORDER BY qid""".stripMargin
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x213_bm25_eval",
      (s, dir) => bm25Eval(s, Tables.documents(s, dir)),
      Some(bm25EvalSql)))
}
