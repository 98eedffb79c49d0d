package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join (SymSpell-style blocking): find all
  * pairs within Levenshtein distance 1 between a query set and a corpus
  * of short strings, WITHOUT a quadratic comparison.
  *
  * Blocking lemma: if lev(u, v) <= 1 then D1(u) ∩ D1(v) ≠ ∅, where
  * D1(s) = {s} ∪ {s minus one character}. (Equality shares s itself; a
  * single insert/delete shares the shorter string; a substitution shares
  * the common deletion at the substituted position.) The converse does
  * NOT hold — e.g. "ab"/"ba" share deletions {a,b} at distance 2 — so
  * candidates are verified with the exact `levenshtein` (codegen'd in
  * both Spark and DuckDB), the same generate-then-verify contract as the
  * MinHash-LSH and PPJoin dedup paths.
  *
  * Scale shape: each string of length L emits L+1 blocking keys — the
  * key exchange is linear in total corpus characters, the equi-join on
  * the key is hash-partitioned, and the verify runs only on candidate
  * pairs. For a 100 TB entity-resolution pass this is the standard
  * short-string recipe (names, titles, codes); for distance k > 1 the
  * neighborhood generalizes to k deletions at L-choose-k keys, which is
  * why it's reserved for short strings — exactly how SymSpell documents
  * it.
  *
  * The fixture derives both sides from `documents` (the x133 pattern —
  * identically expressible in DuckDB): the corpus is each doc's 7-word
  * title; the query set corrupts the title of every doc_id % 5 == 0 doc
  * by deleting the character at position doc_id % 20 (beyond-length
  * positions leave the title intact, harmlessly).
  */
object FuzzyJoin {

  /** All (query, corpus, distance) pairs with lev <= 1.
    *
    * @param queries (q_id, q) — short strings to resolve
    * @param corpus  (doc_id, title) — short strings to resolve against
    */
  def lev1Join(queries: DataFrame, corpus: DataFrame): DataFrame = {
    // Idempotent rule injection (the AsofJoin pattern): the verify filter
    // below is WRITTEN as `levenshtein(q, title) <= 1`; the rule rewrites
    // it to the banded early-exit kernel `graft_lev_leq` in the optimized
    // plan (PlanAudit asserts this on x143).
    val spark = queries.sparkSession
    if (!spark.experimental.extraOptimizations
        .contains(graft.functions.RewriteLevenshteinBound))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.functions.RewriteLevenshteinBound
    // The deletion positions guard on length > 0: Spark's `sequence(1, 0)`
    // is DESCENDING ([1, 0]), so an empty string would otherwise emit two
    // phantom deletion keys (masked today only by the downstream distinct).
    def withKeys(df: DataFrame, s: String): DataFrame =
      df.selectExpr(df.columns :+
        (s"explode(concat(array($s), if(length($s) > 0, " +
          s"transform(sequence(1, length($s)), " +
          s"i -> concat(left($s, i - 1), substring($s, i + 1))), " +
          s"array()))) AS k"): _*)
    val cand = withKeys(queries, "q")
      .join(withKeys(corpus, "title"), "k")
      .select("q_id", "doc_id", "q", "title").distinct()
    cand.filter(levenshtein(col("q"), col("title")) <= 1)
      .select(col("q_id"), col("doc_id"),
        levenshtein(col("q"), col("title")).cast("long").as("dist"))
      .orderBy("q_id", "doc_id")
  }

  private def titles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(slice(filter(split(col("text"), " "),
        (w: Column) => w =!= ""), 1, 7), " ").as("title"))

  private def corrupted(t: DataFrame): DataFrame =
    t.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("k", pmod(col("doc_id"), lit(20)).cast("int"))
      .selectExpr("doc_id AS q_id",
        "concat(left(title, k), substring(title, k + 2)) AS q")

  private val fuzzySql =
    """WITH titles AS (
      |  SELECT doc_id,
      |         array_to_string(list_filter(string_split(text, ' '), x -> x <> '')[1:7], ' ') AS title
      |  FROM documents),
      |queries AS (
      |  SELECT doc_id AS q_id,
      |         left(title, CAST(doc_id % 20 AS INT)) ||
      |           substring(title, CAST(doc_id % 20 AS INT) + 2) AS q
      |  FROM titles WHERE doc_id % 5 = 0),
      |qkeys AS (
      |  SELECT q_id, q,
      |         unnest([q] || list_transform(generate_series(1, length(q)),
      |                i -> left(q, i-1) || substring(q, i+1))) AS k
      |  FROM queries),
      |tkeys AS (
      |  SELECT doc_id, title,
      |         unnest([title] || list_transform(generate_series(1, length(title)),
      |                i -> left(title, i-1) || substring(title, i+1))) AS k
      |  FROM titles),
      |cand AS (SELECT DISTINCT q_id, doc_id, q, title FROM qkeys JOIN tkeys USING (k))
      |SELECT q_id, doc_id, CAST(levenshtein(q, title) AS BIGINT) AS dist
      |FROM cand WHERE levenshtein(q, title) <= 1
      |ORDER BY q_id, doc_id""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("x143_fuzzy_join",
      (s, dir) => {
        val t = titles(Tables.documents(s, dir))
        lev1Join(corrupted(t), t)
      },
      Some(fuzzySql)))
}
