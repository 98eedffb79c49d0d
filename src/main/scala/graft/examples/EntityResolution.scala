package graft.examples

import graft.Tables
import graft.operators.FuzzyJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution flow — the third pipeline example: resolve a stream
  * of NEAR-IDENTICAL short strings (titles, names, product codes) against
  * a canonical corpus and produce survivorship assignments, composing the
  * round-6 fuzzy-join operator end-to-end:
  *
  *   incoming titles (typo'd)         canonical titles
  *        │                                │
  *        └──► deletion-neighborhood ◄─────┘   lev<=1 blocking + verify
  *                fuzzy join                   ([[FuzzyJoin.lev1Join]],
  *                    │                        banded graft_lev_leq kernel)
  *                    ├─→ resolved: each incoming id → the SMALLEST
  *                    │   matching canonical id (deterministic
  *                    │   survivorship, the dedup keep-first policy)
  *                    └─→ unresolved: incoming ids with no canonical
  *                        match within distance 1 (new-entity queue)
  *
  * Scale shape: the only exchange is the blocking-key equi-join (linear
  * in total characters); survivorship is one min-aggregate on the match
  * output; the unresolved side is an anti join on the resolved ids. No
  * stage is quadratic, no driver materialization anywhere.
  */
object EntityResolution {

  private def title: Column =
    array_join(slice(filter(split(col("text"), " "),
      (w: Column) => w =!= ""), 1, 7), " ")

  /** (resolved, unresolved): survivorship assignment for every incoming
    * title, split by whether a canonical entity within lev<=1 exists.
    */
  def resolve(incoming: DataFrame, canonical: DataFrame)
      : (DataFrame, DataFrame) = {
    val matches = FuzzyJoin.lev1Join(incoming, canonical)
    val resolved = matches.groupBy("q_id")
      .agg(min("doc_id").as("entity_id"))
    val unresolved = incoming
      .join(resolved, Seq("q_id"), "left_anti").select("q_id", "q")
    (resolved, unresolved)
  }

  /** The documents-table rendering: canonical = each doc's 7-word title;
    * incoming = titles of doc_id % 5 == 0 docs with one character deleted
    * (the x143 fixture), PLUS synthetic never-seen strings (doc_id + 10^6,
    * reversed title with a marker) exercising the unresolved path.
    */
  def run(sfDir: String, spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, sfDir)
    val canonical = docs.select(col("doc_id"), title.as("title"))
    resolve(incomingOf(canonical), canonical)
  }

  private def incomingOf(canonical: DataFrame): DataFrame = {
    val corrupted = canonical.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("k", pmod(col("doc_id"), lit(20)).cast("int"))
      .selectExpr("doc_id AS q_id",
        "concat(left(title, k), substring(title, k + 2)) AS q")
    val novel = canonical.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 1000000L).as("q_id"),
        concat(lit("zzz "), reverse(col("title"))).as("q"))
    corrupted.unionByName(novel)
  }

  /** The same flow as a [[graft.pipeline.PipeGraph]] pipeline (the
    * reference's dataflow surface): one producer, a resolve stage, a
    * routing split into resolved / unresolved, two parquet consumers.
    * Both query sides derive from the canonical pipe inside the stage —
    * the reference's one-reader-per-pipe law holds.
    */
  def build(sfDir: String, outDir: String): graft.pipeline.PipeGraph =
    graft.pipeline.PipeGraph.builder
      .producer("canonical")(s =>
        Tables.documents(s, sfDir).select(col("doc_id"), title.as("title")))
      .stage("canonical", "matched") { canonical =>
        val (resolved, unresolved) = resolve(incomingOf(canonical), canonical)
        resolved.withColumn("status", lit("resolved"))
          .unionByName(unresolved
            .select(col("q_id"), lit(null).cast("long").as("entity_id"))
            .withColumn("status", lit("unresolved")))
      }
      .branchingStage("matched", Seq("resolved", "unresolved")) { m =>
        Seq(m.filter(col("status") === "resolved").drop("status"),
          m.filter(col("status") === "unresolved").select("q_id"))
      }
      .consumer("resolved")(df => df.orderBy("q_id")
        .write.mode("overwrite").parquet(s"$outDir/resolved"))
      .consumer("unresolved")(df => df.orderBy("q_id")
        .write.mode("overwrite").parquet(s"$outDir/unresolved"))
      .build() match {
        case Right(g) => g
        case Left(err) => sys.error(err)
      }
}
