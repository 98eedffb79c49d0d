package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Crash atomicity for the third streaming state class (r12 verdict #6):
  * x119's parquet-backed MV with the generation-swap commit — state that
  * lives OUTSIDE the state store (StreamRecoverySpec covers engine-managed
  * window state, QuotaRecoverySpec covers custom flatMapGroupsWithState
  * state). The checkpointed leg ([[graft.streaming.StreamingOps.mvLeg]])
  * is killed in BOTH crash windows of the swap protocol:
  *
  *  (a) after the new generation's parquet write, before the pointer
  *      swap — the restart must REPLAY the batch against the old
  *      generation (nothing was published, nothing double-applies);
  *  (b) after the pointer swap, before the checkpoint commit — the
  *      restart replays the batch and must SKIP it (pointer.batchId
  *      already records it; without the idempotence guard every count
  *      in that batch double-applies).
  *
  * Either way the drained MV must equal the batch aggregate row for row.
  */
class MvRecoverySpec extends SparkSuite {

  private def stage(srcDir: String): Unit = {
    Tables.events(spark, sfDir)
      .withColumn("ts", graft.functions.TimeCols.ntzEpochMicros("ts"))
      .repartition(6, col("event_id"))
      .write.mode("overwrite").parquet(srcDir)
    // Ascending mtimes: maxFilesPerTrigger=1 drains one file per batch in
    // a deterministic order, so "kill at batch 2" is reproducible.
    val s = Files.list(Paths.get(srcDir))
    val parts =
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toVector.sortBy(_.getFileName.toString)
      finally s.close()
    assert(parts.size == 6)
    val t0 = System.currentTimeMillis() - 3600_000L
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L))
    }
  }

  private def commits(ckptDir: String): Int = {
    val d = Paths.get(ckptDir, "commits")
    if (!Files.isDirectory(d)) 0
    else {
      val s = Files.list(d)
      try s.iterator().asScala.count(p =>
        p.getFileName.toString.forall(_.isDigit))
      finally s.close()
    }
  }

  private def batchAgg(srcDir: String): Seq[(Long, String, Long, String)] =
    spark.read.parquet(srcDir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).toPlainString))
      .toSeq.sorted

  private def drained(stateDir: String): Seq[(Long, String, Long, String)] =
    graft.streaming.StreamingOps.mvCurrent(spark, stateDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).toPlainString))
      .toSeq.sorted

  private def runScenario(name: String, failAfterSwap: Boolean,
      expectedPointerAfterCrash: Long): Unit = {
    val work = Files.createTempDirectory(s"graft_mv_recovery_$name").toString
    val srcDir = s"$work/src"
    val ckptDir = s"$work/ckpt"
    val stateDir = s"$work/state"
    Files.createDirectories(Paths.get(stateDir))
    stage(srcDir)

    // Leg 1: dies in the injected window of batch 2 (committed: 0, 1).
    graft.streaming.StreamingOps.mvLeg(
      spark, srcDir, ckptDir, stateDir, failAtBatch = Some(2L), failAfterSwap)
    assert(commits(ckptDir) == 2,
      s"$name leg 1 committed ${commits(ckptDir)} batches — expected 2")
    val (ptr, _) = graft.streaming.StreamingOps.readMvPointer(stateDir)
    assert(ptr == expectedPointerAfterCrash,
      s"$name crash window wrong: pointer batchId $ptr after the kill " +
        s"(expected $expectedPointerAfterCrash) — the fault did not land " +
        "in the intended window")

    // Leg 2: same checkpoint + state dir, no fault — replays batch 2 and
    // drains the rest.
    graft.streaming.StreamingOps.mvLeg(
      spark, srcDir, ckptDir, stateDir, failAtBatch = None,
      failAfterSwap = false)
    assert(commits(ckptDir) >= 6,
      s"$name leg 2 finished with ${commits(ckptDir)} commits — expected 6")

    val batch = batchAgg(srcDir)
    val mv = drained(stateDir)
    assert(batch.nonEmpty, "batch aggregate is empty — vacuous fixture")
    assert(mv.length == batch.length,
      s"$name: ${mv.length} MV rows vs batch ${batch.length}")
    assert(mv == batch,
      s"$name: drained MV differs from the batch aggregate — " +
        "the generation swap double- or under-applied a batch")
  }

  test("kill after generation write, before pointer swap: replay applies once") {
    // Window (a): the pointer must still record batch 1 when the leg dies.
    runScenario("afterWrite", failAfterSwap = false,
      expectedPointerAfterCrash = 1L)
  }

  test("kill after pointer swap, before checkpoint commit: replay skips") {
    // Window (b): the pointer already records batch 2 when the leg dies —
    // the replayed batch MUST hit the idempotence guard or every row of
    // batch 2 double-counts.
    runScenario("afterSwap", failAfterSwap = true,
      expectedPointerAfterCrash = 2L)
  }
}
