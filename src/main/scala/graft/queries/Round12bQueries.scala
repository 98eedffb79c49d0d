package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-12b: training-order shuffling, privacy-preserving release, and a
  * character-entropy quality signal.
  */
object Round12bQueries {

  // ---- x207: deterministic epoch shuffle --------------------------------

  /** x207: deterministic pseudo-random training order, two epochs — the
    * global-shuffle step every epoch of LLM training consumes. Order key =
    * md5("ep" ‖ epoch ‖ ":" ‖ doc_id): reproducible from the seed alone,
    * epoch-decorrelated, and uniform — which is what makes the SCALE
    * rendering work. Global positions are assigned WITHOUT a global sort
    * or single-partition window via the two-phase idiom (x86/x159): the
    * first 2 hex chars of the key bucket the space into 256 ordered
    * ranges (the bucket is a PREFIX of the key, so bucket order refines
    * to key order); per-bucket counts → running offsets over 256×epochs
    * rows (tiny window); position = bucket offset + rank within the
    * bucket (per-bucket window, state 1/256th of the epoch). At 100 TB
    * widen the prefix (4 hex chars = 65k ranges) — the shape is
    * unchanged; this is exactly the manual rendering of Spark's
    * range-partitioned orderBy, with positions attached.
    */
  private def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val epochs = broadcast(Seq(1, 2).toDF("epoch"))
    val keyed = Tables.documents(s, dir).select("doc_id").crossJoin(epochs)
      .select(col("epoch"), col("doc_id"),
        md5(concat(lit("ep"), col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")).cast("binary")).as("k"))
      .withColumn("bkt", substring(col("k"), 1, 2))
    val offs = keyed.groupBy("epoch", "bkt").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.partitionBy("epoch").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("epoch", "bkt", "off")
    keyed.join(broadcast(offs), Seq("epoch", "bkt"))
      .select(col("epoch"),
        (col("off") + row_number().over(
          Window.partitionBy("epoch", "bkt").orderBy("k", "doc_id"))
          .cast("long")).as("pos"),
        col("doc_id"))
      .orderBy("epoch", "pos")
  }

  private val epochShuffleSql: String =
    """WITH e(epoch) AS (VALUES (1), (2)),
      | k AS (SELECT e.epoch, d.doc_id,
      |              md5('ep' || e.epoch || ':' || d.doc_id) AS k
      |       FROM documents d CROSS JOIN e)
      |SELECT epoch,
      |       CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
      |            AS BIGINT) AS pos,
      |       doc_id
      |FROM k ORDER BY epoch, pos""".stripMargin

  // ---- x210: k-anonymity suppressed release -----------------------------

  /** x210: minimum-cell-size release (k-anonymity suppression, k = 10) of
    * the per-(event_type, user) activity table — the data-governance
    * gate run before any per-user aggregate leaves the pipeline. Cells
    * with fewer than k rows are withheld and generalized into one
    * per-event-type rollup row (user_id = −1) carrying the suppressed
    * row total and cell count, so the release stays exactly additive to
    * the raw total while no small cell survives.
    *
    * Scale: one hash aggregate over events (map-side combinable), one
    * tiny per-type aggregate of the suppressed cells; nothing row-bounded
    * by users ever leaves the executors. The events fixture keeps
    * per-user volume SF-invariant, so BOTH branches (released and
    * suppressed) are non-vacuous at every scale — asserted by spec.
    */
  private def kanonRelease(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val cells = Tables.events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n_rows"))
    val released = cells.filter(col("n_rows") >= k)
      .select(col("event_type"), col("user_id"), col("n_rows"),
        lit(1L).as("n_cells"))
    val rollup = cells.filter(col("n_rows") < k)
      .groupBy("event_type")
      .agg(sum(col("n_rows")).as("n_rows"), count(lit(1)).as("n_cells"))
      .select(col("event_type"), lit(-1L).as("user_id"), col("n_rows"),
        col("n_cells"))
    released.unionByName(rollup).orderBy("event_type", "user_id")
  }

  private val kanonReleaseSql: String =
    """WITH cells AS (
      |  SELECT event_type, user_id, count(*) AS n_rows
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, user_id, CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(1 AS BIGINT) AS n_cells
      |FROM cells WHERE n_rows >= 10
      |UNION ALL
      |SELECT event_type, CAST(-1 AS BIGINT) AS user_id,
      |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
      |       CAST(count(*) AS BIGINT) AS n_cells
      |FROM cells WHERE n_rows < 10 GROUP BY event_type
      |ORDER BY event_type, user_id""".stripMargin

  // ---- x211: character-entropy quality filter ---------------------------

  /** x211: per-document Shannon entropy of the character distribution —
    * the gibberish/degenerate-text signal the Gopher-style rule stack
    * (x08) lacks: repeated-character and tiny-alphabet documents score
    * near 0 nats regardless of length, where x08's length/punct ratios
    * pass them. H = ln n − (Σ_c cnt_c · ln cnt_c)/n over exact integer
    * counts; each ln is rounded to 6 decimals and scaled to integer
    * micro-nats BEFORE the sum, and the division is integer DIV (the
    * x171 midpoint regime), so the output is engine-exact.
    *
    * Degenerate docs are GRAFTED relationally (the x139/x204 idiom,
    * oracle-replayed): doc_id % 13 == 5 becomes a single-character run
    * of its own length — entropy exactly 0 — so the sub-1.5-nat flag is
    * non-vacuous at every SF while organic salad docs sit near ln(27).
    *
    * Scale: two hash aggregates (doc × char counts, then per-doc sum) —
    * both map-side combinable; the char explode is a narrow codegen
    * transform. No windows, no driver actions.
    */
  private def charEntropy(s: SparkSession, dir: String): DataFrame = {
    val unat = (x: org.apache.spark.sql.Column) =>
      (round(x, 6).cast(DecimalType(18, 6)) * 1000000).cast("long")
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 13 === 5,
        expr("repeat('a', CAST(n_chars AS INT))"))
        .otherwise(lower(col("text"))).as("t"))
    val chars = docs.select(col("doc_id"),
      explode(filter(split(col("t"), ""), c => c =!= "")).as("ch"))
    val cc = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    cc.groupBy("doc_id")
      .agg(sum(col("c")).as("n"),
        sum(col("c") * unat(log(col("c").cast("double")))).as("t"))
      .select(col("doc_id"), col("n").as("n_chars_counted"),
        (unat(log(col("n").cast("double"))) -
          expr("t DIV n")).as("entropy_unat"))
      .withColumn("flagged",
        (col("entropy_unat") < 1500000L).cast("int"))
      .orderBy("doc_id")
  }

  private val charEntropySql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 5 THEN repeat('a', n_chars)
      |              ELSE lower(text) END AS t
      |  FROM documents),
      | chars AS (
      |   SELECT doc_id, unnest(list_filter(string_split(t, ''),
      |                                     x -> x <> '')) AS ch
      |   FROM d),
      | cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
      | agg AS (
      |   SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |          CAST(sum(c * CAST(CAST(round(ln(CAST(c AS DOUBLE)), 6)
      |                AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS t
      |   FROM cc GROUP BY 1),
      | ent AS (
      |   SELECT doc_id, n,
      |          CAST(CAST(CAST(round(ln(CAST(n AS DOUBLE)), 6)
      |               AS DECIMAL(18,6)) * 1000000 AS BIGINT) - t // n
      |            AS BIGINT) AS h
      |   FROM agg)
      |SELECT doc_id, n AS n_chars_counted, h AS entropy_unat,
      |       CAST(CASE WHEN h < 1500000 THEN 1 ELSE 0 END AS INT) AS flagged
      |FROM ent ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("x207_epoch_shuffle", epochShuffle, Some(epochShuffleSql)),
    QueryDef("x210_kanon_release", kanonRelease, Some(kanonReleaseSql)),
    QueryDef("x211_char_entropy", charEntropy, Some(charEntropySql)))
}
