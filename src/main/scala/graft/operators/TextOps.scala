package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Distinct word k-shingles per doc. Window-based: the lead() calls run
    * inside one per-doc sort — at scale this partitions by doc_id, and doc
    * text length is bounded, so no skew concern. NULL-propagating concat
    * (not concat_ws) so trailing partial shingles drop, matching the SQL
    * `w || ' ' || lead(w,1) ...` NULL semantics.
    */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val parts = (0 until k).map {
      case 0 => col("w")
      case i => lead(col("w"), i).over(win)
    }
    val glued = parts.reduce((a, b) => concat(a, lit(" "), b))
    tokens(docs)
      .select(col("doc_id"), glued.as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()
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
