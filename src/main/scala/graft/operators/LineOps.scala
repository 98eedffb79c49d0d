package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus hygiene — the Gopher repetition filters and
  * RefinedWeb-style cross-document boilerplate-line removal that every
  * web-scale training corpus pass runs before tokenization.
  *
  * The synthetic `documents` table is single-line word soup, so the line
  * structure is DERIVED deterministically (the x133/x134 fixture pattern,
  * identically expressible in Spark and DuckDB): tokens are chunked into
  * 12-word lines, then docs with `doc_id % 4 == 0` get a shared
  * newsletter-footer line appended (the cross-doc boilerplate x140/x141
  * exist to find) and docs with `doc_id % 6 == 0` get a copy of their own
  * first line appended (the within-doc repetition x139 exists to find).
  * The two injections are orthogonal axes: x139's stats ignore cross-doc
  * frequency; x140's removal ignores within-doc counts.
  *
  * Determinism: every emitted metric is integer arithmetic (counts and
  * per-10k ratios via integer floor-division) — the house rule that keeps
  * the oracle hash engine-independent. The floor(a*10000/b) double path on
  * the Spark side is exact: numerators stay far below 2^53 and IEEE
  * division of exactly-representable ints floors identically to DuckDB's
  * `//`.
  *
  * Scale shape (the 100 TB question, per query):
  *  - x139 is two hash aggregations keyed (doc, line) then (doc) — the
  *    partial/map-side combine collapses within-doc duplicates before any
  *    exchange, and no corpus-global state exists at all.
  *  - x140/x141 shuffle on the LINE key. Boilerplate lines are by
  *    definition the hot keys of that exchange, but both sides of the
  *    pattern are safe: the frequency aggregate collapses map-side (one
  *    row per line per map task), and the join back fans each line's
  *    count to exactly its occurrence list — linear in corpus size, never
  *    quadratic. The per-doc re-assembly (`array_sort(collect_list)`)
  *    is bounded by document length, not corpus size.
  */
object LineOps {

  /** The injected cross-doc boilerplate line (13 words, ASCII). */
  private val boiler =
    "subscribe to our newsletter for updates and exclusive offers today join now"

  /** Derived line-structured corpus: doc_id, source, lines array<string>. */
  def linedDocs(docs: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), (w: Column) => w =!= "")
    val withToks = docs.select(col("doc_id"), col("source"), toks.as("toks"))
    val nl = floor((size(col("toks")) + lit(11)) / lit(12)).cast("int")
    val firstLine = array_join(slice(col("toks"), lit(1), lit(12)), " ")
    val emptyArr = array().cast("array<string>")
    withToks.select(col("doc_id"), col("source"),
      concat(
        // Guard on size > 0: Spark's `sequence(0, -1)` is DESCENDING
        // ([0, -1]), so an empty/whitespace-only doc would emit two phantom
        // empty "lines" here while DuckDB's generate_series(0, -1) emits
        // none — a latent oracle divergence if the fixture ever contains
        // one.
        when(size(col("toks")) > 0,
          transform(sequence(lit(0), nl - 1),
            i => array_join(slice(col("toks"), i * 12 + 1, lit(12)), " ")))
          .otherwise(emptyArr),
        when(pmod(col("doc_id"), lit(4)) === 0, array(lit(boiler)))
          .otherwise(emptyArr),
        when(pmod(col("doc_id"), lit(6)) === 0, array(firstLine))
          .otherwise(emptyArr)).as("lines"))
  }

  /** DuckDB twin of [[linedDocs]] as a `lined` CTE. Embedded into each
    * query's own stripMargin string, so no line here may start with `|`
    * (the list-concat `||` operators sit at end-of-line for that reason).
    */
  private val linedSql =
    s"""WITH toksrc AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |lined AS (
       |  SELECT doc_id, source,
       |         list_transform(generate_series(0, CAST((len(toks)+11)//12 AS INT) - 1),
       |                        i -> array_to_string(toks[i*12+1 : i*12+12], ' ')) ||
       |         CASE WHEN doc_id % 4 = 0 THEN ['$boiler'] ELSE [] END ||
       |         CASE WHEN doc_id % 6 = 0 THEN [array_to_string(toks[1:12], ' ')] ELSE [] END
       |         AS lines
       |  FROM toksrc)""".stripMargin

  /** Gopher-style per-doc line-repetition stats: duplicate-line fraction
    * and duplicate-line CHARACTER fraction (occurrences beyond the first,
    * weighted by line length), as per-10k integer ratios, plus the keep
    * decision at Gopher's 30%/20% thresholds.
    */
  def lineRepetition(docs: DataFrame): DataFrame = {
    val perLine = linedDocs(docs)
      .select(col("doc_id"), explode(col("lines")).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("c"))
      .withColumn("ln", length(col("line")).cast("long"))
    val dupLine10k =
      floor((col("dup_lines") * 10000) / col("n_lines")).cast("long")
    val dupChar10k =
      floor((col("dup_chars") * 10000) / col("n_chars")).cast("long")
    perLine.groupBy("doc_id")
      .agg(sum(col("c")).as("n_lines"),
        (sum(col("c")) - count(lit(1))).as("dup_lines"),
        sum((col("c") - 1) * col("ln")).as("dup_chars"),
        sum(col("c") * col("ln")).as("n_chars"))
      .select(col("doc_id"), col("n_lines"), col("dup_lines"),
        dupLine10k.as("dup_line_per_10k"), dupChar10k.as("dup_char_per_10k"),
        (dupLine10k <= 3000 && dupChar10k <= 2000).as("keep"))
      .orderBy("doc_id")
  }

  /** Public: composed into x156's filter-report oracle. */
  val lineRepetitionSql: String =
    s"""$linedSql,
       |ex AS (SELECT doc_id, unnest(lines) AS line FROM lined),
       |pl AS (SELECT doc_id, line, count(*) AS c, length(line) AS ln
       |       FROM ex GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |       CAST(sum(c) - count(*) AS BIGINT) AS dup_lines,
       |       CAST((sum(c) - count(*)) * 10000 // sum(c) AS BIGINT) AS dup_line_per_10k,
       |       CAST(sum((c-1)*ln) * 10000 // sum(c*ln) AS BIGINT) AS dup_char_per_10k,
       |       ((sum(c) - count(*)) * 10000 // sum(c) <= 3000
       |        AND sum((c-1)*ln) * 10000 // sum(c*ln) <= 2000) AS keep
       |FROM pl GROUP BY 1 ORDER BY 1""".stripMargin

  /** RefinedWeb-style boilerplate removal: any line appearing in >= 5
    * DISTINCT docs corpus-wide is boilerplate; rebuild every doc from its
    * surviving lines in original order.
    */
  def boilerplateRemoval(docs: DataFrame): DataFrame =
    boilerplateRemovalFromLined(linedDocs(docs))

  /** The removal tail over an already-lined corpus (doc_id, lines) —
    * shared by the batch path ([[boilerplateRemoval]]) and x157's
    * streaming twin, whose drained line store feeds the exact same
    * relational tail so the two provably share one oracle.
    */
  def boilerplateRemovalFromLined(lined: DataFrame): DataFrame = {
    val ex = lined.select(col("doc_id"),
      posexplode(col("lines")).as(Seq("pos", "line")))
    val freq = ex.groupBy("line")
      .agg(countDistinct("doc_id").as("n_docs"))
    val keptAgg = ex.join(freq, "line").filter(col("n_docs") < 5)
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    lined.select(col("doc_id"), size(col("lines")).cast("long").as("total"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
      .orderBy("doc_id")
  }

  /** Public: the x140 oracle, shared verbatim by x157's streaming twin
    * (StreamingOps.streamingBoilerplate) — the hash gate proves the
    * drained incremental line store reduces to the batch removal.
    */
  val boilerplateRemovalSql: String =
    s"""$linedSql,
       |ex AS (SELECT doc_id, generate_subscripts(lines, 1) AS pos,
       |              unnest(lines) AS line FROM lined),
       |freq AS (SELECT line, count(DISTINCT doc_id) AS n_docs FROM ex GROUP BY 1),
       |kept AS (SELECT e.doc_id, e.pos, e.line
       |         FROM ex e JOIN freq f USING (line) WHERE f.n_docs < 5)
       |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
       |       CAST(d.total - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
       |FROM (SELECT doc_id, len(lines) AS total FROM lined) d
       |LEFT JOIN (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS clean_text,
       |                  count(*) AS n_kept FROM kept GROUP BY 1) k USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** The removed-boilerplate report: which lines, how widespread. */
  def boilerplateReport(docs: DataFrame): DataFrame =
    linedDocs(docs)
      .select(col("doc_id"), col("source"), explode(col("lines")).as("line"))
      .groupBy("line")
      .agg(countDistinct("doc_id").as("n_docs"),
        countDistinct("source").as("n_sources"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 5)
      .orderBy(col("n_docs").desc, col("line"))

  private val boilerplateReportSql =
    s"""$linedSql,
       |ex AS (SELECT doc_id, source, unnest(lines) AS line FROM lined)
       |SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |       CAST(count(*) AS BIGINT) AS n_occurrences
       |FROM ex GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5
       |ORDER BY n_docs DESC, line""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("x139_line_repetition",
      (s, dir) => lineRepetition(Tables.documents(s, dir)),
      Some(lineRepetitionSql)),
    QueryDef("x140_line_boilerplate",
      (s, dir) => boilerplateRemoval(Tables.documents(s, dir)),
      Some(boilerplateRemovalSql)),
    QueryDef("x141_boilerplate_report",
      (s, dir) => boilerplateReport(Tables.documents(s, dir)),
      Some(boilerplateReportSql)))
}
