package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ANN ops).
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute-force — the correctness baseline. One
  *    broadcast of the query vector, one codegen'd map over all rows, one
  *    TakeOrdered. Linear scan, embarrassingly parallel: this *is* the
  *    right plan even at scale when k is small and no index exists.
  *  - [[annTopK]]: random-hyperplane LSH pruning — signature computation is
  *    a narrow map; candidate filtering happens before any full-width dot
  *    product. The scale path when the corpus no longer fits a full scan.
  *
  * All dot products run as `aggregate(zip_with(...))` over DOUBLE-cast
  * arrays — Catalyst expressions (codegen), no Scala UDF in the hot path,
  * and sequential accumulation matching DuckDB's list_dot_product order so
  * results are bit-identical for the oracle hash.
  */
object Similarity {

  private def toDouble(c: Column): Column =
    transform(c, (x: Column) => x.cast("double"))

  /** Codegen'd native dot product ([[graft.functions.DotProduct]]) — same
    * ascending accumulation as the interpreted `aggregate(zip_with(...))`
    * rendering and DuckDB's list_dot_product, but fused into whole-stage
    * codegen. Callers must register [[graft.functions.GraftFunctions]] on
    * the session first (done in [[withCosine]]/[[annTopK]]).
    */
  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** cos(e, q) for all rows against the single-row `query` DF (broadcast). */
  private def withCosine(emb: DataFrame, query: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(dot(col("e"), col("q"))
          / (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("q"), col("q")))), 6)
          .as("cos_sim"))
  }

  /** Exact top-k by cosine against the embedding of `queryId`. */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val query = emb.filter(col("vec_id") === queryId)
      .select(toDouble(col("embedding")).as("q"))
    withCosine(emb, query)
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Approximate top-k: 16-bit random-hyperplane signatures; candidates are
    * rows whose signature is within `maxBits` hamming of the query's, then
    * exact cosine + top-k over candidates only.
    *
    * Hyperplanes are derived from a fixed-seed RNG → fully deterministic
    * across runs and JVMs. At 100 TB the signature (a 16-bit int) becomes
    * the bucketing/partition key: group vectors by signature, route the
    * query to hamming-adjacent buckets, never scan the rest.
    */
  def annTopK(spark: SparkSession, emb: DataFrame, queryId: Long, k: Int,
      planes: Int = 16, maxBits: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val dim = 64
    val rnd = new scala.util.Random(42)
    val hp = Array.fill(planes, dim)(rnd.nextGaussian())
    val hpB = spark.sparkContext.broadcast(hp)
    val sigUdf = udf { (e: Seq[Double]) =>
      val h = hpB.value
      var sig = 0
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        while (d < dim && d < e.length) { s += h(p)(d) * e(d); d += 1 }
        if (s > 0) sig |= (1 << p)
        p += 1
      }
      sig
    }
    val sigs = emb
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("sig", sigUdf(col("e")))
    val query = sigs.filter(col("vec_id") === queryId)
      .select(col("e").as("q"), col("sig").as("qsig"))
    sigs.crossJoin(broadcast(query))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= maxBits)
      .select(col("vec_id"),
        round(dot(col("e"), col("q"))
          / (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("q"), col("q")))), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // ---- declared queries -------------------------------------------------

  val queries: Seq[QueryDef] = Seq(
    // Q18 of SURVEY §2.C: exact brute-force cosine top-10 for vec_id=0.
    QueryDef(
      "q18_similarity_topk",
      (s, dir) => cosineTopK(Tables.embeddings(s, dir), 0L, 10),
      Some("""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
             |SELECT vec_id,
             |       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
             |         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
             |          * sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
             |FROM embeddings e, q
             |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // Hyperplane signatures are seed-derived → no DuckDB rendering;
    // rows-only check (its own spec asserts parity with the exact top-k).
    QueryDef(
      "x06_ann_topk",
      (s, dir) => annTopK(s, Tables.embeddings(s, dir), 0L, 10),
      None)
  )
}
