package graft

import graft.operators.LineOps
import org.apache.spark.sql.functions._

/** Line-level corpus hygiene: the two injected-signal axes are orthogonal
  * and each query finds exactly its own.
  */
class LineOpsSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("x139 flags within-doc repetition exactly where injected") {
    val rep = LineOps.lineRepetition(docs).collect()
    // Every doc_id % 6 == 0 doc carries an injected copy of its first line.
    rep.filter(_.getLong(0) % 6 == 0).foreach { r =>
      assert(r.getAs[Long]("dup_lines") >= 1, s"doc ${r.getLong(0)}")
    }
    // The cross-doc boilerplate footer alone (doc_id % 4 == 0, % 6 != 0)
    // is NOT within-doc repetition.
    rep.filter(r => r.getLong(0) % 4 == 0 && r.getLong(0) % 6 != 0)
      .foreach { r =>
        assert(r.getAs[Long]("dup_lines") == 0, s"doc ${r.getLong(0)}")
      }
  }

  test("x140 removes the footer from every injected doc and only boilerplate") {
    val cleaned = LineOps.boilerplateRemoval(docs)
    // No cleaned text contains the footer's signature token.
    assert(cleaned.filter(col("clean_text").contains("newsletter")).count() == 0)
    // Every doc_id % 4 == 0 doc had at least the footer removed; others
    // lose nothing unless a natural line crosses the >= 5-doc threshold.
    val m = cleaned.collect().map(r => r.getLong(0) -> r.getAs[Long]("n_removed")).toMap
    m.foreach { case (id, rm) =>
      if (id % 4 == 0) assert(rm >= 1, s"doc $id")
    }
    // Cross-check vs x141: total lines removed corpus-wide equals the
    // total occurrence count of reported boilerplate lines — x140 removes
    // exactly the lines x141 reports, at any scale factor.
    val removedTotal = m.values.sum
    val reportedTotal = LineOps.boilerplateReport(docs)
      .agg(sum(col("n_occurrences"))).collect().head.getLong(0)
    assert(removedTotal == reportedTotal)
  }

  test("x140 reconstruction law: unaffected docs reassemble to their exact original text") {
    // A doc with neither injection and nothing removed must round-trip
    // through chunk-into-lines → reassemble-in-order BYTE-IDENTICALLY
    // (the corpus is single-spaced, so join(split(text)) == text).
    val cleaned = LineOps.boilerplateRemoval(docs)
      .filter(col("n_removed") === 0).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("clean_text")).toMap
    assert(cleaned.nonEmpty)
    val originals = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0 &&
        pmod(col("doc_id"), lit(6)) =!= 0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    cleaned.foreach { case (id, clean) =>
      originals.get(id).foreach { text =>
        val normalized = text.split(" ").filter(_.nonEmpty).mkString(" ")
        assert(clean == normalized, s"doc $id did not round-trip")
      }
    }
  }

  test("x141 report lists the footer with full source spread") {
    val rep = LineOps.boilerplateReport(docs).collect()
    val footer = rep.find(_.getString(0).startsWith("subscribe to our newsletter"))
    assert(footer.isDefined)
    val nDocs = footer.get.getAs[Long]("n_docs")
    val expected = docs.filter(pmod(col("doc_id"), lit(4)) === 0).count()
    assert(nDocs == expected)
  }

  test("x140 round-trip: cleaned docs re-scored by x139 lose injected footers only") {
    // Feed x140's output back through the line fixture derivation on a doc
    // with both injections (doc 0): footer gone, self-dup of first line
    // still present (it is within-doc, below the cross-doc threshold).
    val cleaned = LineOps.boilerplateRemoval(docs)
      .filter(col("doc_id") === 0).collect().head
    assert(!cleaned.getAs[String]("clean_text").contains("newsletter"))
    assert(cleaned.getAs[Long]("n_removed") == 1)
  }
}
