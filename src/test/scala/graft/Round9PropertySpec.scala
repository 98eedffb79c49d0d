package graft

import graft.operators.{ConnectedComponents, LangModel, Retrieval}
import graft.queries.Round9cQueries
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks for the round-9 operators: each compared against
  * an INDEPENDENT plain-Scala reference over generated inputs — the axis
  * the DuckDB oracles (fixed corpus) don't cover. Generators mirror the
  * operators' input contracts (2-decimal cents, the fixture vocabulary).
  */
class Round9PropertySpec extends SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  /** Spark's HALF_UP double rounding at 6dp (what round(x, 6) does). */
  private def r6(d: Double): BigDecimal =
    BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("property: alternatingStar == union-find reference on arbitrary graphs") {
    val edge = Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))
      .suchThat { case (a, b) => a != b }
    val edges = Gen.listOfN(12, edge)
    check(Prop.forAll(edges) { es =>
      import spark.implicits._
      val got = ConnectedComponents.alternatingStar(es.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val want = nodes.groupBy(find).flatMap { case (_, members) =>
        val label = members.min
        members.map(_ -> label)
      }.toMap
      got == want
    })
  }

  test("property: ksStatistic == brute-force ECDF reference") {
    val row = Gen.zip(Gen.choose(0L, 50L), Gen.oneOf("click", "purchase"))
    // Always at least one sample per side — D is undefined on an empty
    // sample (the operator's real input filter guarantees both types).
    val rows = Gen.listOfN(24, row)
      .map(xs => (3L, "click") :: (7L, "purchase") :: xs)
    check(Prop.forAll(rows) { xs =>
      import spark.implicits._
      val got = Round9cQueries.ksStatistic(xs.toDF("cents", "event_type"))
        .collect().head
      val clicks = xs.filter(_._2 == "click").map(_._1)
      val purchases = xs.filter(_._2 == "purchase").map(_._1)
      val (n1, n2) = (clicks.size.toLong, purchases.size.toLong)
      val pooled = xs.map(_._1).distinct.sorted
      val (dNum, atCents) = pooled.map { v =>
        val c1 = clicks.count(_ <= v).toLong
        val c2 = purchases.count(_ <= v).toLong
        (math.abs(c1 * n2 - c2 * n1), v)
      }.maxBy { case (d, v) => (d, -v) } // max diff, min cents tie-break
      got.getDouble(0) == atCents.toDouble / 100.0 &&
        got.getLong(1) == dNum && got.getLong(2) == n1 * n2 &&
        got.getLong(3) == n1 && got.getLong(4) == n2
    })
  }

  test("property: bm25TopK == plain-Scala BM25 reference") {
    val vocab = Seq("hash", "join", "window", "agg", "fast", "scan",
      "slow", "data", "table", "row")
    val doc = Gen.choose(3, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpus = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val queryTerms = Seq(1L -> "hash", 1L -> "join", 2L -> "window",
      2L -> "agg", 3L -> "fast", 3L -> "scan", 3L -> "slow")
    check(Prop.forAll(corpus) { docs =>
      import spark.implicits._
      val got = Retrieval.bm25TopK(spark, docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      // reference
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      val nd = docs.size.toDouble
      val tot = toks.values.map(_.size).sum.toDouble
      val avgdl = tot / nd
      val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
        .map { case (w, g) => w -> g.size.toDouble }
      val want = queryTerms.groupBy(_._1).toSeq.flatMap { case (qid, qs) =>
        val scored = docs.flatMap { case (id, _) =>
          val ws = toks(id)
          val s = qs.map(_._2).flatMap { w =>
            val tf = ws.count(_ == w).toDouble
            if (tf == 0) None
            else {
              val df = dfm(w)
              val idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
              val denom = tf + 1.2 * (1.0 - 0.75 + 0.75 * ws.size / avgdl)
              Some(r6(idf * (tf * 2.2) / denom))
            }
          }.sum
          if (s == BigDecimal(0) && !qs.map(_._2).exists(ws.contains)) None
          else Some((id, s))
        }
        scored.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
          .map { case ((id, s), i) => (qid, (i + 1).toLong, id, s.toDouble) }
      }
      got.toSet == want.toSet
    })
  }

  test("property: bigramNll == plain-Scala add-one LM reference") {
    val vocab = Seq("a", "b", "c", "d")
    val doc = Gen.choose(2, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check(Prop.forAll(corpus) { docs =>
      import spark.implicits._
      val got = LangModel.bigramNll(spark, docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }
      val bis = toks.flatMap { case (id, ws) =>
        ws.zip(ws.drop(1)).map(id -> _) }
      val c2 = bis.groupBy(_._2).map { case (k, g) => k -> g.size }
      val c1 = bis.groupBy(_._2._1).map { case (k, g) => k -> g.size }
      val v = toks.flatMap(_._2).distinct.size.toDouble
      val want = bis.groupBy(_._1).map { case (id, g) =>
        val sum = g.map { case (_, bg) =>
          r6(-math.log((c2(bg) + 1).toDouble / (c1(bg._1) + v)))
        }.sum
        val sumUnat = (sum * 1000000).toLongExact
        (id, g.size.toLong, sumUnat / g.size)
      }.toSeq.sorted
      got == want
    })
  }
}
