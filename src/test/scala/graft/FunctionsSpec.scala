package graft

import graft.functions.GraftFunctions
import graft.operators.Skew
import graft.pipeline.PipeGraph
import org.apache.spark.sql.functions._

/** Native expression, skew utility, and DSL-to-analytics integration. */
class FunctionsSpec extends SparkSuite {

  test("graft_dot equals interpreted aggregate/zip_with bit-for-bit") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val out = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("interp"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_dot null array yields null; mismatched lengths use min") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]),
      (Option(Seq(1.0, 2.0, 99.0)), Option(Seq(3.0, 4.0)))).toDF("a", "b")
    val out = df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 1.0 * 3.0 + 2.0 * 4.0)
  }

  test("graft_dot rejects wrong input types at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("a", "b")
    val e = intercept[Exception](
      df.select(call_function("graft_dot", col("a"), col("b"))).collect())
    assert(e.getMessage.contains("graft_dot requires two array<double>"))
  }

  test("salted aggregation equals direct groupBy (skew mitigation)") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("user_id").as("k"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("total"),
        count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(ev, col("user_id"), col("value"))
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("wordcount through the PipeGraph DSL matches the operator (Enron intent)") {
    var dslTop: Seq[(String, Long)] = Nil
    val g = PipeGraph.builder
      .producer("docs")(s => Tables.documents(s, sfDir))
      .stage("docs", "words")(df =>
        df.select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word") =!= ""))
      .stage("words", "counts")(df =>
        df.groupBy("word").agg(count(lit(1)).as("c")))
      .consumer("counts")(df =>
        dslTop = df.orderBy(col("c").desc, col("word"))
          .limit(5).collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
      .build().toOption.get
    g.run(spark)
    val direct = operators.TextAnalysis.wordcountTopK(Tables.documents(spark, sfDir), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dslTop == direct)
  }
}
