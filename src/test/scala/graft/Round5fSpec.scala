package graft

/** x126 duplicated-span law: full driver-side recomputation (grams →
  * cross-doc spread → island merge) compared row-for-row, plus the span
  * geometry invariant.
  */
class Round5fSpec extends SparkSuite {

  test("dup spans equal a driver-side reference computation") {
    val k = 5
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = texts.map { case (id, t) =>
      val ts = t.toLowerCase.split(" ").filter(_.nonEmpty)
      id -> ts.indices.dropRight(k - 1).map(p =>
        p -> ts.slice(p, p + k).mkString(" "))
    }
    val docsOf = grams.flatMap { case (id, gs) => gs.map { case (_, g) => g -> id } }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
    val want = grams.map { case (id, gs) =>
      val dupPos = gs.collect { case (p, g) if docsOf(g) > 1 => p }.sorted
      // island merge: new span when gap > k
      var spans = List.empty[(Int, Int)] // (start, lastPos)
      dupPos.foreach { p =>
        spans match {
          case (s0, last) :: rest if p <= last + k => spans = (s0, p) :: rest
          case _ => spans = (p, p) :: spans
        }
      }
      val lens = spans.map { case (s0, last) => last + k - s0 }
      id -> ((spans.size.toLong, lens.map(_.toLong).sum))
    }.toMap
    val got = SparkEntry.queries("x126_dup_spans")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // geometry: every span covers at least k tokens
    assert(got.values.forall { case (n, tok) => tok >= n * k })
    assert(got.values.map(_._1).sum > 0, "fixture should contain dup spans")
  }

  test("decontam rewrite: untouched docs reproduce their original token stream") {
    import org.apache.spark.sql.functions._
    val res = SparkEntry.queries("x129_decontam_rewrite")(spark, sfDir)
    val bad = res.filter(col("n_kept") > col("n_tokens")).count()
    assert(bad == 0)
    // docs with nothing removed must hash to exactly the original
    // (lowercased, space-normalized) token stream
    val orig = Tables.documents(spark, sfDir).filter(col("doc_id") >= 20)
      .select(col("doc_id"), md5(array_join(filter(
        split(lower(col("text")), " "),
        w => w =!= ""), " ")).as("orig_md5"))
    val mismatch = res.filter(col("n_kept") === col("n_tokens"))
      .join(orig, "doc_id")
      .filter(col("clean_md5") =!= col("orig_md5")).count()
    assert(mismatch == 0)
    assert(res.filter(col("n_kept") < col("n_tokens")).count() > 0,
      "fixture should contain contaminated docs")
  }

  test("prefix-filtered join equals the full inverted-index join exactly") {
    val pp = SparkEntry.queries("x128_ppjoin")(spark, sfDir).collect().toSeq
    val full = SparkEntry.queries("x02_ngram_jaccard")(spark, sfDir)
      .collect().toSeq
    assert(pp.nonEmpty && pp == full)
  }
}
