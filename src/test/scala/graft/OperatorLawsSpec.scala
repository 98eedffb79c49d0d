package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Invariants the dedup/cluster/near-dup operators must satisfy regardless
  * of data: idempotence, parameter-independence of exact results, and
  * orientation/order-independence of graph clustering. These are the
  * properties that make the operators safe to re-run, re-partition, and
  * re-tune in a production pipeline without changing outputs.
  */
class OperatorLawsSpec extends SparkSuite {

  test("law: exact dedup is idempotent") {
    val docs = Tables.documents(spark, sfDir)
    val once = Dedup.exactKeepFirst(docs)
    val survivors = docs.join(once, "doc_id")
    val twice = Dedup.exactKeepFirst(survivors)
    assert(once.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq)
  }

  test("law: cluster labels are invariant under pair orientation and order") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L)).toDF("a", "b")
    val flipped = Seq((9L, 8L), (3L, 2L), (9L, 7L), (2L, 1L)).toDF("a", "b")
    val x = Dedup.dedupClusters(pairs).orderBy("doc_id").collect().toSeq
    val y = Dedup.dedupClusters(flipped).orderBy("doc_id").collect().toSeq
    assert(x == y)
  }

  test("law: distributed near-dup output is independent of the block count") {
    val emb = Tables.embeddings(spark, sfDir)
    val b3 = Dedup.embeddingNearDupPairsDist(emb, 0.45, numBlocks = 3)
      .orderBy("a", "b").collect().toSeq
    val b8 = Dedup.embeddingNearDupPairsDist(emb, 0.45, numBlocks = 8)
      .orderBy("a", "b").collect().toSeq
    assert(b3.nonEmpty && b3 == b8)
  }

  test("law: DF cap above the max document frequency is a no-op") {
    val docs = Tables.documents(spark, sfDir)
    val uncapped = Dedup.ngramJaccardPairs(docs, 0.8)
      .orderBy("a", "b").collect().toSeq
    val capped = Dedup.ngramJaccardPairs(docs, 0.8, maxDocFreq = Some(1000000L))
      .orderBy("a", "b").collect().toSeq
    assert(capped == uncapped)
  }
}
