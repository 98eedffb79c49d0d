package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 queries: corpus statistics a training-data pipeline mines
  * before and during curation — collocation association (PMI), the
  * hashing-trick vectorizer, count-min heavy-hitter certification, and
  * first-occurrence novelty attribution. The reference has no text or
  * aggregation surface at all (SURVEY §2.B: `/root/reference/src/lib.rs`
  * is channel plumbing; its one text-shaped intent, the Enron test, is
  * unimplemented — `/root/reference/tests/enron_test.rs:1-2`), so these
  * extend the engine the same way x168/x170/x178 do: standard published
  * algorithms rendered as Spark plans with DuckDB oracle twins.
  *
  * House determinism rules throughout (SURVEY §7.4): every rational-
  * valued output is emitted as a scaled integer via DIV (never a raw
  * double), every fingerprint is a 60-bit md5 prefix (cross-engine
  * bit-identical), ties in every top-k are broken by a total key.
  */
object Round11Queries {

  /** 60-bit md5 prefix as a BIGINT — the house cross-engine hash
    * (DuckDB twin: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)).
    */
  private def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Adjacent-token bigram stream: one row per (doc_id-interior) token
    * pair, NULL-dropped at doc tails. The lead() window partitions by
    * doc_id — per-partition state is one doc's tokens, bounded by doc
    * length at any corpus size.
    */
  private def bigramStream(docs: DataFrame): DataFrame =
    // NARROW since r17: shared zip construction (TextOps.bigramPairs) —
    // the lead() window exchanged + sorted the token stream per use.
    TextOps.bigramPairs(docs).select(col("w1").as("w"), col("w2"))

  // ---- x194: PMI collocations -------------------------------------------

  /** x194: top-20 bigram collocations by pointwise mutual information
    * (Church & Hanks 1990) — the association miner behind phrase/entity
    * vocabularies and tokenizer seeding. PMI compares the observed
    * bigram rate to the independence baseline:
    * lift = p(ab) / (p(a)·p(b)) = c_ab·N_u² / (N_b·c_a·c_b).
    *
    * Determinism: the lift is emitted as an exact integer ppm via one
    * DECIMAL(38,0) multiply chain + integral DIV (HUGEINT // in the
    * oracle) — log() never enters the plan (PMI's log is monotone, so
    * the ranking is identical), and ties break on (w, w2).
    *
    * Scale: the min-support filter (c_ab ≥ 5 — the standard Church-
    * Hanks floor) runs BEFORE the normalization joins, so the joined
    * table is support-bounded, not vocab²; unigram counts and totals
    * are map-side-combinable hash aggregates; the two c_a/c_b lookups
    * are equi-joins the optimizer broadcasts when the surviving
    * bigram table is small. DECIMAL(38,0) keeps c_ab·N_u²·10⁶ exact
    * past int64 at real corpus sizes (~10¹⁷ tokens² already overflows
    * a long at sf0.1-scale counts).
    */
  private def pmiColloc(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = TextOps.tokens(docs)
    val big = bigramStream(docs)
    val cab = big.groupBy("w", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val cu = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val nu = toks.agg(count(lit(1)).as("nu"))
    val nb = big.agg(count(lit(1)).as("nb"))
    cab
      .join(cu.select(col("w"), col("c").as("c_a")), "w")
      .join(cu.select(col("w").as("w2j"), col("c").as("c_b")),
        col("w2") === col("w2j"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w"), col("w2"), col("c_ab"),
        expr("""CAST(CAST(c_ab AS DECIMAL(38,0)) * nu * nu * 1000000
               |     DIV (CAST(nb AS DECIMAL(38,0)) * c_a * c_b)
               |     AS BIGINT)""".stripMargin).as("lift_ppm"))
      .orderBy(desc("lift_ppm"), col("w"), col("w2"))
      .limit(20)
  }

  private val pmiSql: String =
    s"""WITH toks AS (${TextOps.tokensSql}),
       | big AS (SELECT w, lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
       |                  AS w2
       |         FROM toks),
       | cab AS (SELECT w, w2, count(*) AS c_ab FROM big
       |         WHERE w2 IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 5),
       | cu AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
       | nu AS (SELECT count(*) AS nu FROM toks),
       | nb AS (SELECT count(*) AS nb FROM big WHERE w2 IS NOT NULL)
       |SELECT cab.w, cab.w2, CAST(c_ab AS BIGINT) AS c_ab,
       |       CAST(CAST(c_ab AS HUGEINT) * nu.nu * nu.nu * 1000000
       |            // (CAST(nb.nb AS HUGEINT) * a.c * b.c) AS BIGINT)
       |         AS lift_ppm
       |FROM cab JOIN cu a ON cab.w = a.w JOIN cu b ON cab.w2 = b.w, nu, nb
       |ORDER BY lift_ppm DESC, cab.w, cab.w2 LIMIT 20""".stripMargin

  // ---- x195: hashing-trick vectorizer -----------------------------------

  /** x195: feature hashing (Weinberger et al. 2009, the "hashing trick")
    * — bag-of-words folded into F=64 fixed buckets, the vectorizer that
    * needs NO vocabulary pass, no dictionary broadcast, and no schema
    * change as the vocabulary grows. Per doc: nnz (occupied buckets),
    * l1 (token count), and a commutative fingerprint of the sparse
    * vector (bit_xor over 60-bit hashes of bucket:count pairs — order-
    * and partitioning-independent, the x192 idiom), so two docs with
    * identical hashed vectors — including pure collision aliases —
    * compare equal by one BIGINT.
    *
    * Scale: two hash aggregates, both map-side combinable; the bucket
    * hash is a narrow codegen projection at the scan. F=64 is sized to
    * the fixture's 31-word vocabulary so the collision path (several
    * buckets hold ≥2 tokens) is genuinely exercised — production F is
    * 2¹⁸-2²⁰ with identical plan shape.
    */
  private def hashVectorizer(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(Tables.documents(s, dir))
    val v = toks
      .select(col("doc_id"), (h60(col("w")) % 64).as("bkt"))
      .groupBy("doc_id", "bkt").agg(count(lit(1)).as("c"))
    v.groupBy("doc_id")
      .agg(count(lit(1)).as("nnz"), sum(col("c")).as("l1"),
        expr("bit_xor(" +
          "CAST(conv(substring(md5(CAST(concat(CAST(bkt AS STRING), ':', " +
          "CAST(c AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT))")
          .as("vec_fp"))
      .orderBy("doc_id")
  }

  private val hashVectorizerSql: String =
    s"""WITH toks AS (${TextOps.tokensSql}),
       | v AS (SELECT doc_id,
       |              CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64
       |                AS bkt,
       |              count(*) AS c
       |       FROM toks GROUP BY 1, 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS nnz,
       |       CAST(sum(c) AS BIGINT) AS l1,
       |       bit_xor(CAST('0x' || substr(md5(
       |           CAST(bkt AS VARCHAR) || ':' || CAST(c AS VARCHAR)),
       |         1, 15) AS BIGINT)) AS vec_fp
       |FROM v GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- x196: count-min certified heavy hitters --------------------------

  /** x196: count-min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    * certification — the fixed-memory frequency structure a 100 TB
    * token stream is actually monitored with. Build: d=4 hash rows ×
    * W=128 buckets over the BIGRAM count table (the vocab-sized
    * aggregate, never the corpus stream — Heaps-sublinear, the x168
    * observation); estimate(x) = min over rows of cell[j][h_j(x)].
    *
    * The certification is the sketch's one-sided error law, hash-gated:
    * for the top-20 exact bigrams the query emits exact count, sketch
    * estimate, and overest = est − exact, which is provably ≥ 0 —
    * DuckDB replays the identical sketch (same md5-derived row hashes),
    * so any drift in either engine's build hash-mismatches. W=128 is
    * sized to the fixture's ~916 distinct bigrams so collisions are
    * real (every probe overestimates at sf0.001); production sizes
    * W = ⌈e/ε⌉ with the identical plan.
    *
    * Scale: the sketch is 512 cells whatever the corpus; cells and
    * probes are both broadcast-trivial; the only corpus-touching work
    * is the bigram hash aggregate the probes and sketch share (Spark
    * reuses the exchange).
    */
  private def countMinCertify(s: SparkSession, dir: String): DataFrame = {
    val big = bigramStream(Tables.documents(s, dir))
      .select(concat(col("w"), lit(" "), col("w2")).as("bg"))
    val tc = big.groupBy("bg").agg(count(lit(1)).as("c"))
    val rows = s.range(4).select(col("id").cast("int").as("j"))
    def bucket(bg: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      h60(concat(j.cast("string"), lit(":"), bg)) % 128
    val cells = tc.crossJoin(rows)
      .select(col("j"), bucket(col("bg"), col("j")).as("b"), col("c"))
      .groupBy("j", "b").agg(sum(col("c")).as("cell"))
    val probe = tc.orderBy(desc("c"), col("bg")).limit(20)
    probe.crossJoin(rows)
      .select(col("bg"), col("c"), col("j"), bucket(col("bg"), col("j")).as("b"))
      .join(broadcast(cells), Seq("j", "b"))
      .groupBy("bg", "c").agg(min(col("cell")).as("est"))
      .select(col("bg"), col("c").as("exact"), col("est"),
        (col("est") - col("c")).as("overest"))
      .orderBy(desc("exact"), col("bg"))
  }

  private val countMinSql: String =
    s"""WITH toks AS (${TextOps.tokensSql}),
       | big AS (SELECT w || ' ' || lead(w, 1)
       |                  OVER (PARTITION BY doc_id ORDER BY pos) AS bg
       |         FROM toks),
       | tc AS (SELECT bg, count(*) AS c FROM big
       |        WHERE bg IS NOT NULL GROUP BY 1),
       | rws AS (SELECT j FROM generate_series(0, 3) t(j)),
       | cells AS (SELECT j,
       |                  CAST('0x' || substr(md5(
       |                      CAST(j AS VARCHAR) || ':' || bg), 1, 15)
       |                    AS BIGINT) % 128 AS b,
       |                  sum(c) AS cell
       |           FROM tc, rws GROUP BY 1, 2),
       | probe AS (SELECT bg, c FROM tc ORDER BY c DESC, bg LIMIT 20),
       | est AS (SELECT p.bg, min(cl.cell) AS est
       |         FROM probe p, rws r
       |         JOIN cells cl ON cl.j = r.j
       |          AND cl.b = CAST('0x' || substr(md5(
       |                CAST(r.j AS VARCHAR) || ':' || p.bg), 1, 15)
       |              AS BIGINT) % 128
       |         GROUP BY 1)
       |SELECT p.bg, CAST(p.c AS BIGINT) AS exact,
       |       CAST(e.est AS BIGINT) AS est,
       |       CAST(e.est - p.c AS BIGINT) AS overest
       |FROM probe p JOIN est e ON p.bg = e.bg
       |ORDER BY exact DESC, p.bg""".stripMargin

  // ---- x197: first-occurrence novelty -----------------------------------

  /** x197: first-occurrence novelty attribution — per doc, the share of
    * its positioned 8-gram occurrences whose gram was FIRST seen in an
    * earlier document (ingestion order = doc_id). x178 answers the
    * symmetric question ("is this gram duplicated anywhere?"); this is
    * the ORDER-SENSITIVE one a streaming curator needs: "how much of
    * this newly-arrived doc is already in the corpus?" — the original
    * copy of a duplicated gram scores novel here, every later copy
    * scores seen. Emits occurrence counts and an integer novelty
    * permille (house DIV rule).
    *
    * Scale: the only corpus-wide shuffle groups by gram hash (uniform,
    * map-side combinable min); the back-join fans out exactly the gram
    * stream (x165's shape). Boilerplate grams with huge df skew the
    * gram groups — the documented mitigation (PERF.md) is the df cap
    * before the join; the min aggregate itself is skew-immune.
    */
  private def gramNovelty(s: SparkSession, dir: String): DataFrame = {
    val g = Round9Queries.positionedGrams(Tables.documents(s, dir), 8)
      .select(col("doc_id"), md5(col("gram")).as("gh"))
    val first = g.groupBy("gh").agg(min(col("doc_id")).as("fd"))
    g.join(first, "gh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("fd") < col("doc_id"), 1L).otherwise(0L)).as("seen_before"))
      .select(col("doc_id"), col("n_grams"), col("seen_before"),
        expr("(n_grams - seen_before) * 1000 DIV n_grams").as("novel_permille"))
      .orderBy("doc_id")
  }

  private val gramNoveltySql: String = {
    val k = 8
    val leads = (1 until k)
      .map(i => s"lead(w,$i) OVER win").mkString(" || ' ' || ")
    s"""WITH toks AS (${TextOps.tokensSql}),
       | grams AS (
       |   SELECT doc_id, w || ' ' || $leads AS gram
       |   FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
       | g AS (SELECT doc_id, md5(gram) AS gh FROM grams
       |       WHERE gram IS NOT NULL),
       | fst AS (SELECT gh, min(doc_id) AS fd FROM g GROUP BY 1)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(sum(CASE WHEN f.fd < g.doc_id THEN 1 ELSE 0 END)
       |            AS BIGINT) AS seen_before,
       |       CAST((count(*) - sum(CASE WHEN f.fd < g.doc_id
       |                            THEN 1 ELSE 0 END)) * 1000 // count(*)
       |            AS BIGINT) AS novel_permille
       |FROM g JOIN fst f ON g.gh = f.gh
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("x194_pmi_colloc", pmiColloc, Some(pmiSql)),
    QueryDef("x195_hash_vectorizer", hashVectorizer, Some(hashVectorizerSql)),
    QueryDef("x196_countmin_certify", countMinCertify, Some(countMinSql)),
    QueryDef("x197_gram_novelty", gramNovelty, Some(gramNoveltySql)),
    // x198: streaming funnel — x142's three-stage conversion funnel as a
    // bounded-state streaming state machine (O(1) per user: three
    // timestamps), exact under the staged source's time-ordered batches;
    // drained ≡ batch, so it shares x142's oracle verbatim (the streaming
    // family contract, x44/x176/x183).
    QueryDef("x198_stream_funnel",
      (s, dir) => graft.streaming.StreamingOps
        .streamingFunnel(s, dir, "x198_stream_funnel_sink"),
      Some(Round6bQueries.funnelSql)))
}
