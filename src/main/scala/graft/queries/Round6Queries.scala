package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{dsum, dsumSql}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-6 queries: the SKEWED-corpus fixtures that turn last round's
  * argued scale claims into measured ones.
  *
  * The boilerplate fixture (x133/x134) answers VERDICT r5 §wrong-2
  * head-on: x128's prefix filter was 4× slower than its naive twin on the
  * *uniform* corpus, with the crossover only argued. Here the same
  * deterministic transformation — a 25-word legal footer appended to the
  * 30% of docs with doc_id % 10 < 3, identically expressible in Spark and
  * DuckDB — plants exactly the skew the prefix filter exists for: each of
  * the footer's 23 3-shingles acquires document frequency 0.3·|docs|, so
  * the naive inverted-index self-join pays 23·(0.3n)² rows (51M at
  * sf0.1) while every prefix ranks those shingles LAST and never joins
  * on them. Both queries share one oracle (the naive SQL on the same
  * fixture), so the bench delta is attributable to the plan alone.
  */
object Round6Queries {

  /** 25 words → 23 hot 3-shingles on every boilerplated doc. */
  private val boiler =
    "this document is provided as is without warranty of any kind " +
      "either express or implied including but not limited to the " +
      "implied warranty of fitness for purpose"

  /** The deterministic skew fixture: doc_id % 10 < 3 gets the footer. */
  private def skewedDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(10)) < 3,
        concat(col("text"), lit(" " + boiler)))
        .otherwise(col("text")).as("text"))

  /** DuckDB twin of [[skewedDocs]]: a `skdocs` CTE over the base table,
    * with every embedded shingle rendering retargeted at it (DuckDB
    * forbids a CTE shadowing the table it reads from).
    */
  private def skewedSql(inner: String): String =
    s"""WITH skdocs AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 10 < 3 THEN text || ' $boiler'
       |              ELSE text END AS text
       |  FROM documents)
       |${inner.replace("FROM documents", "FROM skdocs")}""".stripMargin

  // (helpers above `all` — object vals initialize in declaration order)

  /** ×32-amplified events with even user_ids folded onto hot key 1.
    *
    * The seed is hash-repartitioned (content-derived key → retry-safe)
    * BEFORE the explode, for two reasons that both matter at scale: the
    * amplification runs in 32 parallel tasks instead of one-per-input-
    * file, and the downstream join exchange gets 32 map tasks — AQE's
    * skew split operates on map-output ranges, so a single-mapper
    * exchange is structurally unsplittable no matter how skewed (found
    * empirically: the sf0.01 events file is one scan task).
    */
  private def amplifiedEvents(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("value"))
      .repartition(32, col("event_id"))
      .withColumn("rep", explode(sequence(lit(0L), lit(31L))))
      .withColumn("huid",
        when(pmod(col("user_id"), lit(2)) === 0, lit(1L))
          .otherwise(col("user_id")))

  private def hotkeyJoin(s: org.apache.spark.sql.SparkSession, dir: String,
      salted: Boolean): DataFrame = {
    val amp = amplifiedEvents(Tables.events(s, dir))
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val joined =
      if (!salted)
        amp.join(cust.hint("merge"), col("huid") === col("c_custkey"))
      else {
        val fact = amp.withColumn("salt",
          pmod(xxhash64(col("event_id"), col("rep")), lit(32L)))
        val dim = cust.withColumn("d_salt", explode(sequence(lit(0L), lit(31L))))
        fact.join(dim.hint("merge"),
          col("huid") === col("c_custkey") && col("salt") === col("d_salt"))
      }
    joined.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
      .orderBy("c_mktsegment")
  }

  private val hotkeyJoinSql =
    s"""WITH amp AS (
       |  SELECT e.event_id, e.value, r.rep,
       |         CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE e.user_id END AS huid
       |  FROM events e
       |  CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS rep) r)
       |SELECT c_mktsegment, count(*) AS n,
       |       ${dsumSql("value")} AS val_sum
       |FROM amp JOIN customer ON huid = c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // The naive inverted-index join on the boilerplate-skewed corpus —
    // the d² fan-out demonstrator (23 shingles × 1500² rows at sf0.1).
    QueryDef(
      "x133_jaccard_skew_naive",
      (s, dir) => Dedup.ngramJaccardPairs(skewedDocs(Tables.documents(s, dir)), 0.8)
        .orderBy("a", "b"),
      Some(skewedSql(Dedup.ngramJaccardPairsSql(0.8)))),

    // The PPJoin path on the identical fixture and oracle: hot shingles
    // rank last in every prefix, so the skew never reaches the join.
    // BENCH_r06's x134 < x133 is the measured crossover claim.
    QueryDef(
      "x134_jaccard_skew_ppjoin",
      (s, dir) => Dedup.prefixFilteredJaccardPairs(skewedDocs(Tables.documents(s, dir)), 0.8)
        .orderBy("a", "b"),
      Some(skewedSql(Dedup.ngramJaccardPairsSql(0.8)))),

    // ---- hot-key JOIN fixture (VERDICT r5 §missing-2) ------------------
    //
    // ×32-amplified events with every even user_id folded onto key 1 —
    // HALF the 3.2M fact rows share one join key. The dim (customer) is
    // merge-hinted on BOTH twins, modeling the 100 TB regime where the
    // dim outgrows the broadcast threshold and the join must shuffle on
    // the skewed key: unsalted, key 1's 1.6M rows sort in ONE task;
    // salted, they spread over 32. Same oracle on both — the bench delta
    // (PERF.md's salted-vs-unsalted table) is the plan's alone. AQE's
    // automatic skew-split on this same plan is asserted by PlanAudit
    // (thresholds scaled to fixture bytes; the default 256 MB trigger is
    // sized for real clusters).
    QueryDef(
      "x135_hotkey_join_plain",
      (s, dir) => hotkeyJoin(s, dir, salted = false),
      Some(hotkeyJoinSql)),

    // Explicit salting (x115's recipe at fixture scale that actually
    // hurts): content-derived fact salt (retry-deterministic, the
    // SPARK-23207 argument), dim replicated ×32, equi-join on
    // (key, salt) — the hot key now sorts in 32 parallel tasks. The salt
    // cancels algebraically, so the oracle is the PLAIN join.
    QueryDef(
      "x136_hotkey_join_salted",
      (s, dir) => hotkeyJoin(s, dir, salted = true),
      Some(hotkeyJoinSql)))
}
