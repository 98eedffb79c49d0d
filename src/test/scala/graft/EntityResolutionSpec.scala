package graft

import graft.examples.EntityResolution
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSuite {

  test("every corrupted title resolves to its own entity; novel strings stay unresolved") {
    val (resolved, unresolved) = EntityResolution.run(sfDir, spark)
    val r = resolved.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    val docs = Tables.documents(spark, sfDir)
    val corruptedIds = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Every corrupted incoming id resolves, and survivorship picks an
    // entity at distance <= 1 — for the single-deletion fixture the
    // smallest such canonical id is the source doc itself unless an even
    // smaller doc's title is also within distance 1 (min-id policy).
    assert(corruptedIds.subsetOf(r.keySet))
    assert(r.forall { case (q, e) => e <= q || !corruptedIds.contains(q) })

    // The never-seen strings (marker prefix + reversed) all land in the
    // unresolved queue, none in resolved.
    val novelIds = unresolved.collect().map(_.getLong(0)).filter(_ >= 1000000L)
    val expectedNovel = docs.filter(pmod(col("doc_id"), lit(7)) === 0).count()
    assert(novelIds.length == expectedNovel)
    assert(r.keySet.forall(_ < 1000000L))

    // Partition property: resolved ∪ unresolved = incoming, disjoint.
    assert(r.size + unresolved.count() ==
      corruptedIds.size + expectedNovel)
  }

  test("PipeGraph rendering writes the same resolved/unresolved split to its sinks") {
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_er_spec").toString
    EntityResolution.build(sfDir, out).run(spark)
    val (resolved, unresolved) = EntityResolution.run(sfDir, spark)
    val sinkR = spark.read.parquet(s"$out/resolved")
    val sinkU = spark.read.parquet(s"$out/unresolved")
    assert(sinkR.orderBy("q_id").collect().toSeq ==
      resolved.orderBy("q_id").collect().toSeq)
    assert(sinkU.select("q_id").orderBy("q_id").collect().toSeq ==
      unresolved.select("q_id").orderBy("q_id").collect().toSeq)
  }
}
