package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class Round6bSpec extends SparkSuite {

  test("x142 funnel: step counts are monotonically non-increasing") {
    val rows = SparkEntry.queries("x142_funnel")(spark, sfDir).collect()
    assert(rows.length == 3)
    val users = rows.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("users"))
    assert(users.sliding(2).forall(p => p(0) >= p(1)))
    assert(rows.find(_.getAs[Int]("step") == 1)
      .get.getAs[Long]("conv_per_10k") == 10000L)
  }

  test("x143 fuzzy join: every corrupted query recovers its own doc") {
    val pairs = SparkEntry.queries("x143_fuzzy_join")(spark, sfDir).collect()
    val self = pairs.filter(r => r.getLong(0) == r.getLong(1))
    val nQueries = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(5)) === 0).count()
    assert(self.length == nQueries)
    assert(pairs.forall(_.getAs[Long]("dist") <= 1))
  }

  test("x144 pagerank: top-20, descending, rank mass concentrated above the uniform start") {
    val rows = SparkEntry.queries("x144_pagerank")(spark, sfDir).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Long]("rank_scaled"))
    assert(ranks.sliding(2).forall(p => p(0) >= p(1)))
    // The top co-purchased part must sit above the uniform 10^6 start —
    // damping redistributes mass toward hubs.
    assert(ranks.head > 1000000L)
  }

  test("edge cases: empty inputs flow through the new operators without error") {
    import spark.implicits._
    val noDocs = Tables.documents(spark, sfDir).filter(col("doc_id") < 0)
    assert(graft.operators.LineOps.boilerplateRemoval(noDocs).count() == 0)
    assert(graft.operators.LineOps.lineRepetition(noDocs).count() == 0)
    val noQ = Seq.empty[(Long, String)].toDF("q_id", "q")
    val c = Seq((1L, "abc")).toDF("doc_id", "title")
    assert(FuzzyJoin.lev1Join(noQ, c).count() == 0)
    // Empty-string queries still block and verify correctly (lev("", t)).
    val empty = Seq((9L, "")).toDF("q_id", "q")
    val short = Seq((1L, "a"), (2L, "ab")).toDF("doc_id", "title")
    val got = FuzzyJoin.lev1Join(empty, short).collect().map(_.getLong(1)).toSet
    assert(got == Set(1L))
  }

  test("x146 markov rows are a stochastic matrix (per-src per-10k sums land in (10000-k, 10000])") {
    val rows = SparkEntry.queries("x146_markov")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // floor-division loses < 1/10000 per destination: each src row-sum is
    // within (10000 - #dsts, 10000]
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p_per_10k")).sum
      assert(s <= 10000 && s > 10000 - rs.length)
    }
  }

  test("x149 drained stream equals an independent batch min-neighbor computation") {
    val streamed = SparkEntry.queries("x149_stream_fuzzy")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Batch recomputation through a DIFFERENT code path: the x143 join on
    // titles-vs-titles, reduced to min over {self} ∪ neighbors.
    val titles = Tables.documents(spark, sfDir).select(col("doc_id"),
      array_join(slice(filter(split(col("text"), " "),
        (w: org.apache.spark.sql.Column) => w =!= ""), 1, 7), " ").as("title"))
    val pairs = FuzzyJoin.lev1Join(
      titles.select(col("doc_id").as("q_id"), col("title").as("q")), titles)
      .filter(col("q_id") =!= col("doc_id")).collect()
    val neighbors = pairs.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).min).toMap
    val batch = titles.select("doc_id").collect().map(_.getLong(0))
      .map(id => id -> math.min(id, neighbors.getOrElse(id, id))).toMap
    assert(streamed == batch)
    assert(streamed.exists { case (id, e) => e != id }) // fixture has real merges
  }

  test("lev1Join completeness law: 60 seeded random single-edit pairs are all found") {
    import spark.implicits._
    // The blocking lemma's promise is NO false negatives at lev <= 1:
    // generate strings and one random edit each (delete / insert /
    // substitute), batch them into one join, and require every pair back.
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val cases = (0 until 60).map { i =>
      val s = randStr(5 + rnd.nextInt(10))
      val pos = rnd.nextInt(s.length)
      val t = rnd.nextInt(3) match {
        case 0 => s.substring(0, pos) + s.substring(pos + 1)
        case 1 => s.substring(0, pos) + alpha(rnd.nextInt(5)) + s.substring(pos)
        case _ => s.substring(0, pos) + alpha(rnd.nextInt(5)) + s.substring(pos + 1)
      }
      (i.toLong, s, t)
    }
    val q = cases.map { case (i, s, _) => (i, s) }.toDF("q_id", "q")
    val c = cases.map { case (i, _, t) => (i, t) }.toDF("doc_id", "title")
    val found = FuzzyJoin.lev1Join(q, c)
      .filter(col("q_id") === col("doc_id")).count()
    assert(found == 60)
  }

  test("graft_lev_leq kernel ≡ levenshtein(a,b) <= k on 200 random pairs, k in 0..3") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // Mix of near pairs (single edits), far pairs (independent), and
    // length-gap pairs (the no-DP fast path).
    val pairs = (0 until 200).map { i =>
      val s = randStr(3 + rnd.nextInt(12))
      val t = i % 3 match {
        case 0 => val p = rnd.nextInt(s.length); s.substring(0, p) + s.substring(p + 1)
        case 1 => randStr(3 + rnd.nextInt(12))
        case _ => randStr(s.length + 4 + rnd.nextInt(4))
      }
      (s, t)
    }.toDF("a", "b")
    (0 to 3).foreach { k =>
      val mismatch = pairs.filter(
        expr(s"graft_lev_leq(a, b, $k) != (levenshtein(a, b) <= $k)")).count()
      assert(mismatch == 0, s"k=$k")
    }
  }

  test("RewriteLevenshteinBound puts the banded kernel into the optimized plan") {
    import spark.implicits._
    // lev1Join injects the rule idempotently; its own verify filter is
    // WRITTEN as levenshtein <= 1 and must come out rewritten.
    val q = Seq((1L, "abcde")).toDF("q_id", "q")
    val c = Seq((2L, "abde")).toDF("doc_id", "title")
    val joined = FuzzyJoin.lev1Join(q, c)
    assert(joined.collect().map(_.getLong(1)).toSet == Set(2L))
    assert(joined.queryExecution.optimizedPlan.toString.contains("graft_lev_leq"))
  }

  test("lev1Join blocking is generate-then-verify: shared-deletion distance-2 pairs rejected") {
    import spark.implicits._
    // "ab" and "ba" share both 1-deletion variants {a, b} but sit at
    // Levenshtein distance 2 — the candidate survives blocking and MUST
    // die in the verify.
    val q = Seq((1L, "ab")).toDF("q_id", "q")
    val c = Seq((2L, "ba"), (3L, "ab"), (4L, "abc")).toDF("doc_id", "title")
    val got = FuzzyJoin.lev1Join(q, c).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((3L, 0L), (4L, 1L)))
  }
}
