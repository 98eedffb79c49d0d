package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._

/** Shared text primitives for dedup / text-analysis operators.
  *
  * Tokenization is the contract between the Spark plans and the DuckDB
  * oracle SQL: lowercase, split on single space, drop empties. Keep the two
  * renderings in lock-step or every downstream hash check breaks.
  */
object TextOps {

  /** One row per (doc_id, pos, w) token. Narrow transform — stays inside
    * whole-stage codegen; no shuffle.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      posexplode(filter(split(lower(col("text")), " "), (w: Column) => w =!= ""))
        .as(Seq("pos", "w")))

  /** Oracle-side rendering of [[tokens]] (DuckDB zips parallel unnests). */
  val tokensSql: String =
    """SELECT doc_id,
      |       generate_subscripts(list_filter(string_split(lower(text), ' '), x -> x <> ''), 1) AS pos,
      |       unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
      |FROM documents""".stripMargin

  /** Distinct word k-shingles per doc.
    *
    * NARROW since r17 (guide §2.4 — remove shuffles outright): the
    * k-gram at position i is a pure function of the token ARRAY, so it
    * is glued inside one codegen'd projection (transform over the valid
    * start positions) and exploded — no exchange, no sort. The previous
    * window rendering (lead(w, i) OVER (PARTITION BY doc_id ORDER BY
    * pos)) shuffled the ENTIRE token stream and sorted it per doc on
    * every shingle pass — and the suite runs dozens of shingle passes
    * (x02/x03/x43/x137/x175/x200/x206/x208/x250/x251 each shingle 1-5
    * times). Output is identical row-for-row: split() preserves text
    * order (= the window's ORDER BY pos), and docs with fewer than k
    * tokens emit nothing (the window version's NULL-propagating concat
    * dropped exactly those trailing partials). The only shuffle left is
    * the per-doc DISTINCT that was always downstream.
    */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), (w: Column) => w =!= "")
    val glue = (i: Column) => (0 until k)
      .map(j => element_at(col("toks"), i + lit(j + 1)))
      .reduce((a, b) => concat(a, lit(" "), b))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k), glue))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  /** One row per k-gram OCCURRENCE — (doc_id, pos, gram), pos 1-BASED
    * start-token position (matching DuckDB's generate_subscripts).
    * NARROW (r17): same zero-shuffle construction as [[shingles]], with
    * the start position carried in a struct instead of re-deriving it
    * from a window. Shared by the span/decontamination queries
    * (x126/x129/x165), whose previous lead()-over-window gram builds
    * each exchanged and sorted the full token stream.
    */
  def positionedGrams(docs: DataFrame, k: Int): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), (w: Column) => w =!= "")
    val glue = (i: Column) => (0 until k)
      .map(j => element_at(col("toks"), i + lit(j + 1)))
      .reduce((a, b) => concat(a, lit(" "), b))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= k,
          transform(sequence(lit(1), size(col("toks")) - (k - 1)),
            p => struct(p.as("pos"), glue(p - 1).as("gram"))))
          .otherwise(array().cast("array<struct<pos:int,gram:string>>")))
          .as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
  }

  /** One row per adjacent-token pair occurrence (doc-interior bigrams,
    * doc tails dropped). NARROW (r17): zip of the token array with its
    * own 1-shift — no exchange, no sort; the previous
    * lead(w, 1)-over-window rendering shuffled the token stream per use.
    */
  def bigramPairs(docs: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), (w: Column) => w =!= "")
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 2,
          zip_with(slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Oracle-side rendering of [[shingles]] (k=3). */
  val shinglesSql: String =
    s"""SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id,
       |         w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
       |  FROM ($tokensSql) toks
       |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)) raw
       |WHERE shingle IS NOT NULL""".stripMargin
}
