package graft

import org.apache.spark.sql.functions._

/** Invariant anchors for the round-10c operators: the content manifest is
  * genuinely order/partitioning-independent and change-sensitive, and the
  * PII scrub's planted hazard exercises every redaction count while the
  * scrub fingerprint proves the non-contact text survived untouched.
  */
class Round10cSpec extends SparkSuite {

  test("x192 manifest is partitioning-invariant and change-sensitive") {
    val base = SparkEntry.queries("x192_content_manifest")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // Invariance: recompute over a deliberately reshuffled, re-partitioned
    // scan — commutative aggregates must yield the identical manifest.
    val docs = Tables.documents(spark, sfDir)
      .repartition(17, col("n_chars")) // scramble row/partition order
    val h = conv(substring(md5(concat_ws("",
        col("doc_id").cast("string"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")
    val re = docs.withColumn("h", h).groupBy("source")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp_xor"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 9223372036854775808 AS BIGINT)").as("fp_sum"),
        sum(col("n_chars")).as("chars"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(re.toSeq == base.toSeq,
      "manifest changed under repartitioning — aggregates not commutative")
    // Sensitivity: mutate ONE row's text and both fingerprints must move
    // for that source while every other source's row is untouched.
    val mutated = Tables.documents(spark, sfDir)
      .withColumn("text", when(col("doc_id") === 7L,
        concat(col("text"), lit("!"))).otherwise(col("text")))
    val victim = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 7L).select("source").head().getString(0)
    val mut = mutated.withColumn("h", h).groupBy("source")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp_xor"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 9223372036854775808 AS BIGINT)").as("fp_sum"),
        sum(col("n_chars")).as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val orig = base.map(t => t._1 -> (t._3, t._4)).toMap
    assert(mut(victim)._1 != orig(victim)._1 && mut(victim)._2 != orig(victim)._2,
      "single-row edit left a fingerprint unchanged — manifest is change-blind")
    (orig.keySet - victim).foreach { s =>
      assert(mut(s) == orig(s), s"unrelated source $s moved on a foreign edit")
    }
  }

  test("x193 planted redaction counts cover {0,1,2}; clean docs keep their text byte-identical") {
    val out = SparkEntry.queries("x193_pii_scrub")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = out.map(_._2).toSet
    assert(Set(0L, 1L, 2L).subsetOf(counts),
      s"fixture should exercise redaction counts 0/1/2, saw $counts")
    // doc_id % 7 != 0 → nothing planted, nothing redacted, and the scrub
    // fingerprint equals the md5 of the ORIGINAL text (scrub is a no-op).
    val origFp = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_._1 % 7 != 0).foreach { case (id, n, fp) =>
      assert(n == 0L, s"clean doc $id reports $n redactions")
      assert(fp == origFp(id), s"clean doc $id text mutated by the scrub")
    }
    // planted docs: count exactly matches the plant schedule
    out.filter(_._1 % 7 == 0).foreach { case (id, n, _) =>
      val want = if (id % 21 == 0) 2L else 1L
      assert(n == want, s"doc $id expected $want redactions, saw $n")
    }
  }
}
