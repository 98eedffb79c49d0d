package graft

import org.apache.spark.sql.functions._

/** Property-style pipeline-algebra laws the reference implies (SURVEY §5.2):
  * stage ≡ branching-stage-with-one-output (`builder.rs:215-223`),
  * flatten∘wrap ≡ identity, union is commutative on bags,
  * Option-drop ≡ filter. Sampled over seeded random inputs (the
  * scalatest/scalacheck bridge isn't in the offline cache, so sampling is
  * hand-rolled and deterministic).
  */
class PipelineLawsSpec extends SparkSuite {

  private val rnd = new scala.util.Random(42)
  private def samples: Seq[List[Int]] =
    Seq.fill(5)(List.fill(rnd.nextInt(30) + 1)(rnd.nextInt(101) - 50))

  test("law: Option-drop semantics ≡ filter (R5)") {
    samples.foreach { xs =>
      import spark.implicits._
      val ds = xs.toDS()
      val viaFlatMap = ds.flatMap(v => if (v % 2 == 0) Some(v) else None).collect().sorted
      val viaFilter = ds.filter(col("value") % 2 === 0).collect().sorted
      assert(viaFlatMap.toSeq == viaFilter.toSeq)
    }
  }

  test("law: flatten ∘ wrap ≡ identity (R8)") {
    samples.foreach { xs =>
      import spark.implicits._
      val roundTrip = xs.toDS().select(array(col("value")).as("a"))
        .select(explode(col("a"))).as[Int].collect().sorted
      assert(roundTrip.toSeq == xs.sorted)
    }
  }

  test("law: flattenerSeq ∘ wrap ≡ identity through the DSL (R8 generic form)") {
    import graft.pipeline.PipeGraph
    samples.foreach { xs =>
      import spark.implicits._
      var seen: Seq[Int] = Nil
      val g = PipeGraph.builder
        .inputs("wrapped", s => { import s.implicits._; Seq(xs.toSeq).toDS().toDF() })
        .flattenerSeq[Int]("wrapped", "flat")
        .consumer("flat")(df => seen = df.as[Int].collect().toSeq)
        .build().fold(e => fail(e), identity)
      g.run(spark)
      assert(seen.sorted == xs.sorted)
    }
  }

  test("law: union is commutative on bags (R10)") {
    samples.zip(samples.reverse).foreach { case (xs, ys) =>
      import spark.implicits._
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      val ab = a.union(b).collect().map(_.getInt(0)).sorted.toSeq
      val ba = b.union(a).collect().map(_.getInt(0)).sorted.toSeq
      assert(ab == ba)
    }
  }

  test("law: stage ≡ branching stage with one output (R5/R6 lowering)") {
    import graft.pipeline.PipeGraph
    samples.foreach { xs =>
      var viaStage: Seq[Int] = Nil
      var viaBranching: Seq[Int] = Nil
      def src(s: org.apache.spark.sql.SparkSession) = {
        import s.implicits._; xs.toDF("v")
      }
      PipeGraph.builder.inputs("in", src)
        .stage("in", "out")(df => df.select((col("v") * 2).as("v")))
        .consumer("out")(df => viaStage = df.collect().map(_.getInt(0)).sorted.toSeq)
        .build().toOption.get.run(spark)
      PipeGraph.builder.inputs("in", src)
        .branchingStage("in", Seq("out"))(df => Seq(df.select((col("v") * 2).as("v"))))
        .consumer("out")(df => viaBranching = df.collect().map(_.getInt(0)).sorted.toSeq)
        .build().toOption.get.run(spark)
      assert(viaStage == viaBranching)
    }
  }
}
