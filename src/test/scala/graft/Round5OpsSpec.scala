package graft

import graft.operators.{KMeansLite, ZOrder}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Round-5 operators: k-means assignment/recompute laws, z-order
  * interleave invertibility and layout disjointness, bloom-filter
  * no-false-negative invariant.
  */
class Round5OpsSpec extends SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("property: kmeans assign() picks the argmin centroid (ties to lowest cid)") {
    import spark.implicits._
    val vec = Gen.listOfN(4, Gen.choose(-100, 100).map(_ / 10.0))
    val data = Gen.zip(Gen.listOfN(12, vec), Gen.listOfN(3, vec))
    check(Prop.forAll(data) { case (vs, cs) =>
      val vecs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v")
      val cents = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("cid", "cv")
      val got = KMeansLite.assign(vecs, cents)
        .select("vec_id", "cid")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = vs.zipWithIndex.map { case (v, i) =>
        val d2 = cs.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        i.toLong -> d2.zipWithIndex.minBy { case (d, ci) => (d, ci) }._2.toLong
      }.toMap
      got == want
    })
  }

  test("kmeans recompute() is the exact elementwise mean") {
    import spark.implicits._
    val assigned = Seq(
      (1L, 0L, Seq(1.0, 2.0)), (2L, 0L, Seq(3.0, 5.0)),
      (3L, 1L, Seq(10.0, -2.0)))
      .toDF("vec_id", "cid", "v")
    val got = KMeansLite.recompute(assigned)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(0L) == Seq(2.0, 3.5) && got(1L) == Seq(10.0, -2.0))
  }

  test("property: zvalue() interleave is invertible (de-interleave recovers x and y)") {
    import spark.implicits._
    val xy = Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))
    check(Prop.forAll(Gen.listOfN(16, xy)) { pts =>
      val df = pts.toDF("x", "y")
        .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
      df.collect().forall { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val xr = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
        val yr = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
        xr == x && yr == y
      }
    })
  }

  test("zorderRepartition: partition z-ranges are disjoint (file-prunable layout)") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i % 20, i / 20)).toDF("x", "y")
    val parted = ZOrder.zorderRepartition(df,
      ZOrder.zvalue(col("x"), col("y")), partitions = 8)
    val ranges = parted.select("zval").rdd
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.min, zs.max, zs == zs.sorted))
      }.collect().sortBy(_._1)
    assert(ranges.nonEmpty)
    assert(ranges.forall(_._3), "rows sorted by z within every partition")
    assert(ranges.sliding(2).forall {
      case Array(prev, next) => prev._2 <= next._1 // ranges don't interleave
      case _ => true
    }, s"partition z-ranges overlap: ${ranges.mkString(", ")}")
  }

  test("bloom filter screen has no false negatives on inserted keys") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"key_$i")
    val df = keys.toDF("k")
    val bf = df.stat.bloomFilter("k", 2000L, 0.01)
    assert(keys.forall(bf.mightContainString), "every inserted key must test positive")
  }

  test("semdedup pairs are a non-vacuous subset of the exact all-pairs result") {
    val sem = SparkEntry.queries("x122_semdedup")(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("x05_embedding_neardup")(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.nonEmpty, "no in-cluster near-dup pairs in fixture")
    assert(sem.subsetOf(exact),
      s"semdedup produced pairs the exact scan lacks: ${sem -- exact}")
  }
}
