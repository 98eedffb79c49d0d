package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson–Lindenstrauss random projection with a hash-gated distortion
  * certificate — the dimensionality-reduction step ANN pipelines run
  * before indexing (64-d → 16-d here): JL guarantees pairwise distances
  * survive the projection up to (1±ε), and this operator CERTIFIES that
  * on a deterministic probe-pair set instead of citing the lemma.
  *
  * The projection matrix is CONTENT-DERIVED pseudorandom (the x06
  * hyperplane idiom — [[Similarity]]'s multiply/xor-shift chain rendered
  * here in plain Spark SQL bitwise ops, whole-stage codegen'd, no JVM RNG
  * anywhere), so the DuckDB oracle replays the matrix, both projections,
  * and every ratio bit for bit.
  *
  * Determinism: per-plane projected differences are exactly-rounded IEEE
  * chains written identically on both engines (dot(p,a) − dot(p,b), each
  * dot accumulating ascending); their squares round to 6 decimals and sum
  * in DECIMAL (aggregation-order independent — the dsum rationale);
  * original distances are single ascending graft_dot passes. Everything
  * DOWNSTREAM of the two rounds is integer micro-units: the 12/k rescale
  * (entries are uniform(−.5,.5): variance 1/12, k planes) is an exact
  * decimal multiply + integer DIV, the ratio is an integer permille, and
  * the JL band test is a cross-multiplication — a double
  * `round(decimal·0.75, 6)` lands on 8-decimal MIDPOINTS where Java
  * shortest-string HALF_UP and C binary rounding disagree (the x171
  * lesson, reproduced here at sf0.001 pair 15 before the integer
  * rendering).
  *
  * Scale: the matrix is k·d doubles — broadcast-trivial; projecting the
  * corpus is one narrow pass (the 100 TB path feeds the 16-d output into
  * the IVF/PQ indexes, cutting every downstream distance 4×); the
  * certificate touches only the probe pairs.
  */
object RandomProjection {

  private val K = 16 // projected dims
  private val Dim = 64 // source dims
  private val NPairs = 16 // certification probe pairs: (2i, 2i+1)

  /** The [[Similarity.planeComponent]] chain as a codegen'd SQL column
    * over plane-element index `i`.
    */
  private def hvExpr(i: Column): Column = {
    val s0 = (i + 1L) * 2654435761L % 2147483648L
    val s2 = (s0.bitwiseXOR(shiftright(s0, 15))) * 2246822519L % 2147483648L
    val s4 = (s2.bitwiseXOR(shiftright(s2, 13))) * 3266489917L % 2147483648L
    s4.bitwiseXOR(shiftright(s4, 16)).cast("double") / 2147483648.0 - 0.5
  }

  /** (p, pv): one k-element plane list per projected dim, hash-derived. */
  private def planes(spark: SparkSession): DataFrame =
    spark.range(K.toLong * Dim)
      .select((col("id") / Dim).cast("long").as("p"),
        (col("id") % Dim).cast("int").as("d"), hvExpr(col("id")).as("hv"))
      .groupBy("p")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("hv")))),
        (s: Column) => s.getField("hv")).as("pv"))

  /** Per probe pair: original squared L2 distance, the JL estimate from
    * the 16-d projection, their ratio, and an in-band flag (ε = 1 at
    * k=16 — the lemma's √(2/k) ≈ 0.35 rsd makes [0.3, 2.0] a ≈4σ band).
    */
  def jlCertificate(spark: SparkSession, emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val toD = (c: Column) => transform(c, (x: Column) => x.cast("double"))
    val pairs = emb.filter(col("vec_id") < 2L * NPairs && col("vec_id") % 2 === 0)
      .select((col("vec_id") / 2).cast("long").as("pair"),
        toD(col("embedding")).as("a"))
      .join(emb.select(col("vec_id").as("bid"),
        toD(col("embedding")).as("b")),
        col("bid") === col("pair") * 2 + 1)
    val perPlane = pairs.crossJoin(broadcast(planes(spark)))
      .select(col("pair"), col("a"), col("b"),
        (call_function("graft_dot", col("pv"), col("a")) -
          call_function("graft_dot", col("pv"), col("b"))).as("dd"))
      .select(col("pair"), col("a"), col("b"),
        round(col("dd") * col("dd"), 6).cast(DecimalType(28, 6)).as("ddsq"))
    perPlane.groupBy("pair")
      .agg(first(col("a")).as("a"), first(col("b")).as("b"),
        sum(col("ddsq")).as("proj_sum"))
      .select(col("pair"),
        round(call_function("graft_dot",
          zip_with(col("a"), col("b"), (x, y) => x - y),
          zip_with(col("a"), col("b"), (x, y) => x - y)) * 1000000)
          .cast("long").as("orig_usq"),
        (col("proj_sum") * 12000000).cast("long").as("proj_u12"))
      .select(col("pair"), col("orig_usq"),
        expr(s"proj_u12 DIV $K").as("est_usq"))
      .select(col("pair"), col("orig_usq"), col("est_usq"),
        // NULLIF guard: on an identical probe pair (orig_usq = 0) Spark's
        // DIV returns NULL but DuckDB's // RAISES — the run would crash
        // asymmetrically instead of cleanly comparing (r9 advice). Both
        // engines now yield NULL for that row.
        expr("est_usq * 1000 DIV nullif(orig_usq, 0)").as("ratio_permille"),
        (col("est_usq") * 10 >= col("orig_usq") * 3 &&
          col("est_usq") <= col("orig_usq") * 2).as("in_band"))
      .orderBy("pair")
  }

  private val jlSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       | h AS (
       |  SELECT i, xor(s4, s4 >> 16) / 2147483648.0 - 0.5 AS hv
       |  FROM (SELECT i, (xor(s2, s2 >> 13) * 3266489917) % 2147483648 AS s4
       |        FROM (SELECT i, (xor(s0, s0 >> 15) * 2246822519) % 2147483648 AS s2
       |              FROM (SELECT i, ((i + 1) * 2654435761) % 2147483648 AS s0
       |                    FROM (SELECT unnest(generate_series(0, ${K * Dim - 1})) AS i))))),
       | pl AS (SELECT i // $Dim AS p, list(hv ORDER BY i % $Dim) AS pv
       |        FROM h GROUP BY 1),
       | pairs AS (
       |  SELECT CAST(x.vec_id / 2 AS BIGINT) AS pair, x.v AS a, y.v AS b
       |  FROM e x JOIN e y ON y.vec_id = x.vec_id + 1
       |  WHERE x.vec_id < ${2 * NPairs} AND x.vec_id % 2 = 0),
       | per_plane AS (
       |  SELECT pair,
       |         CAST(round((list_dot_product(pl.pv, a)
       |                     - list_dot_product(pl.pv, b))
       |                    * (list_dot_product(pl.pv, a)
       |                       - list_dot_product(pl.pv, b)), 6)
       |           AS DECIMAL(28,6)) AS ddsq
       |  FROM pairs CROSS JOIN pl),
       | agg AS (
       |  SELECT p.pair,
       |         CAST(round(list_dot_product(
       |           list_transform(generate_series(1, $Dim), i -> p.a[i] - p.b[i]),
       |           list_transform(generate_series(1, $Dim), i -> p.a[i] - p.b[i]))
       |           * 1000000) AS BIGINT) AS orig_usq,
       |         CAST(CAST(s.proj_sum * 12000000 AS BIGINT) // $K AS BIGINT)
       |           AS est_usq
       |  FROM pairs p JOIN (SELECT pair, sum(ddsq) AS proj_sum
       |                     FROM per_plane GROUP BY 1) s USING (pair))
       |SELECT pair, orig_usq, est_usq,
       |       CAST(est_usq * 1000 // NULLIF(orig_usq, 0) AS BIGINT)
       |         AS ratio_permille,
       |       est_usq * 10 >= orig_usq * 3 AND est_usq <= orig_usq * 2
       |         AS in_band
       |FROM agg ORDER BY pair""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef(
      "x182_jl_projection",
      (s, dir) => jlCertificate(s, Tables.embeddings(s, dir)),
      Some(jlSql)))
}
