package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10c additions: dataset content fingerprinting (the
  * incremental-rebuild primitive) and PII redaction with an exact audit
  * trail — two pipeline stages every production training-data flow runs
  * that the suite didn't yet cover as first-class operators.
  *
  * The reference has neither (SURVEY.md §2.B — no storage, no text
  * surface); these extend the ingest/hygiene family (snapshot dedup x137,
  * deletion propagation x167, schema-drift ingest x182).
  */
object Round10cQueries {

  /** x192: order-independent per-source content manifest — the primitive
    * behind "skip the partitions that didn't change": n rows, two content
    * fingerprints, and total chars per source, where the fingerprints are
    * COMMUTATIVE aggregates of a per-row 60-bit md5 so any partitioning,
    * shuffle order, or merge tree yields the identical manifest (what a
    * table-equality check needs; a concat-in-order hash would be
    * partition-order-dependent and useless distributed).
    *
    * Two fingerprints on purpose: bit_xor cancels on duplicate-row PAIRS
    * (xor's known blind spot), the mod-2⁶³ sum doesn't; a collision now
    * needs to fool both simultaneously. Both are map-side combinable hash
    * aggregates — the whole operator is one corpus scan, zero joins, and
    * a |sources|-row result. Exactness: the sum rides DECIMAL(38,0)
    * (order-exact) and is emitted mod 2⁶³ as an integer (§7.4).
    */
  /** The manifest aggregate shared by x192 (batch) and x248 (its
    * streaming twin) — ONE definition of the row hash and the three
    * commutative fingerprint aggregates, so the twins cannot drift
    * (the r12 advice-#3 discipline). Works on a batch OR streaming
    * documents frame: every aggregate here is map-side/microbatch
    * mergeable, which is exactly what makes the manifest maintainable
    * incrementally.
    *
    * FINGERPRINT-FORMAT BREAK (r13, recorded per r13 advice #3): the row
    * hash's separator changed in round 13 from `concat_ws("")` to the
    *  separator below, aligning Spark with the chr(1) SQL oracle.
    * Every x192/x248 fingerprint value produced before that change is
    * INVALID against post-change manifests — a manifest persisted from
    * r12 or earlier must be REGENERATED, not diffed, or every source
    * reads as "changed". Hash-verified green since the change; only
    * cross-round manifest persistence is affected.
    */
  private[graft] def manifestAgg(docs: DataFrame): DataFrame = {
    val h = conv(substring(md5(concat_ws("\u0001",
        col("doc_id").cast("string"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")
    docs.withColumn("h", h)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("fp_xor"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 9223372036854775808 AS BIGINT)")
          .as("fp_sum"),
        sum(col("n_chars")).as("chars"))
  }

  private def contentManifest(s: SparkSession, dir: String): DataFrame =
    manifestAgg(graft.Tables.documents(s, dir)).orderBy("source")

  private[graft] val contentManifestSql: String =
    """WITH h AS (SELECT source, n_chars,
      |  CAST('0x' || substr(md5(concat_ws(chr(1),
      |         CAST(doc_id AS VARCHAR), text, lang, source,
      |         CAST(n_chars AS VARCHAR))), 1, 15) AS BIGINT) AS h
      |  FROM documents)
      |SELECT source, count(*) AS n, bit_xor(h) AS fp_xor,
      |       CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775808 AS BIGINT)
      |         AS fp_sum,
      |       CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- x193: PII redaction with exact audit ------------------------------

  /** Simple-by-design email shape: both engines (Java regex / RE2) agree
    * on greedy character-class matching and non-overlapping leftmost
    * replace-all for it; fancier PII patterns (lookarounds, lazy
    * quantifiers) are exactly where the two engines diverge and are
    * deliberately out of scope for the hash-gated twin.
    */
  private val EmailRe = "[a-z0-9.]+@[a-z0-9.]+"

  /** x193: PII redaction (the pre-training scrub step) with an exact
    * audit trail: replace every email with `<EMAIL>` and emit, per doc,
    * the redaction COUNT and a fingerprint of the scrubbed text — the
    * operator a compliance pipeline needs (prove what was removed, and
    * that nothing else changed).
    *
    * The word-salad fixture carries no organic PII, so the hazard is
    * GRAFTED relationally (the x139/x162/x186 fixture idiom): every 7th
    * doc gets a contact line derived from the customer dim (name
    * canonicalized to [a-z0-9]), every 21st a second address — so
    * redaction counts 0/1/2 all occur and the oracle plants identically.
    * Scale shape: one equi-join to the customer dim (shuffle-safe, no
    * broadcast assumption on a corpus-sized dim), then narrow per-row
    * regex work at the scan — no state, no window.
    */
  private def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    val cust = graft.Tables.customer(s, dir).select(
      col("c_custkey").as("ck"),
      regexp_replace(lower(col("c_name")), "[^a-z0-9]", "").as("uname"))
    val mc = cust.agg(max(col("ck")).as("mc"))
    val planted = docs.crossJoin(broadcast(mc))
      .withColumn("ck", col("doc_id") % col("mc") + 1)
      .join(cust, "ck")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact "), col("uname"),
            lit("@example.com"),
            when(col("doc_id") % 21 === 0,
              concat(lit(" or "), col("uname"), lit("@backup.example.org")))
              .otherwise(lit(""))))
          .otherwise(col("text")).as("text2"))
    planted.select(col("doc_id"),
        regexp_count(col("text2"), lit(EmailRe)).cast("long").as("n_redacted"),
        conv(substring(md5(
            regexp_replace(col("text2"), EmailRe, "<EMAIL>").cast("binary")),
          1, 15), 16, 10).cast("long").as("scrub_fp"))
      .orderBy("doc_id")
  }

  private val piiScrubSql: String =
    s"""WITH mc AS (SELECT max(c_custkey) AS mc FROM customer),
       | cu AS (SELECT c_custkey AS ck,
       |               regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')
       |                 AS uname
       |        FROM customer),
       | pl AS (SELECT d.doc_id,
       |          CASE WHEN d.doc_id % 7 = 0
       |               THEN d.text || ' contact ' || cu.uname || '@example.com'
       |                    || CASE WHEN d.doc_id % 21 = 0
       |                            THEN ' or ' || cu.uname || '@backup.example.org'
       |                            ELSE '' END
       |               ELSE d.text END AS text2
       |        FROM documents d, mc
       |        JOIN cu ON cu.ck = d.doc_id % mc.mc + 1)
       |SELECT doc_id,
       |       len(regexp_extract_all(text2, '$EmailRe')) AS n_redacted,
       |       CAST('0x' || substr(md5(
       |              regexp_replace(text2, '$EmailRe', '<EMAIL>', 'g')),
       |            1, 15) AS BIGINT) AS scrub_fp
       |FROM pl ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "x192_content_manifest",
      contentManifest,
      Some(contentManifestSql)),
    QueryDef(
      "x193_pii_scrub",
      piiScrub,
      Some(piiScrubSql)))
}
