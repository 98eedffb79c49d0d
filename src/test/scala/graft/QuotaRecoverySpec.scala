package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Checkpoint recovery for the hardest state class (r11 verdict #7):
  * `flatMapGroupsWithState` with a CUSTOM Scala state object (x203's
  * per-user Map[day -> admitted count]) — not an engine-managed window.
  * The quota leg crashes at the start of batch 2's commit (its sink
  * write landed, the commit did not; 4 of 6 files unread), a fresh query
  * instance restarts from the same checkpoint, and the drained
  * admissions must equal the batch quota rule row for row.
  *
  * This is strictly harder than StreamRecoverySpec's sessionization:
  * admission is ORDER- and HISTORY-dependent (whether event e is
  * admitted depends on how many same-day events its user already got
  * through in EARLIER batches), so any state loss or replay double-count
  * changes the admitted set, not just its grouping.
  */
class QuotaRecoverySpec extends SparkSuite {

  test("quota killed mid-drain resumes from checkpoint: admissions == batch rule") {
    val work = Files.createTempDirectory("graft_quota_recovery_").toString
    val srcDir = s"$work/src"
    val ckptDir = s"$work/ckpt"
    val outDir = s"$work/out"
    val perDay = 3

    // Stage 6 ts-range files with ascending mtimes: chronological arrival
    // is the x203 exactness precondition (equal timestamps land in one
    // range partition, so the (ts, event_id) admission order is total).
    Tables.events(spark, sfDir)
      .withColumn("ts", graft.functions.TimeCols.ntzEpochMicros("ts"))
      .repartitionByRange(6, col("ts"))
      .write.mode("overwrite").parquet(srcDir)
    val base = Paths.get(srcDir)
    val parts = {
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toVector.sortBy(_.getFileName.toString)
      finally s.close()
    }
    assert(parts.size == 6)
    val t0 = System.currentTimeMillis() - 3600_000L
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L))
    }

    // Leg 1: dies at batch 2 (committed: 0, 1).
    graft.streaming.StreamingOps.quotaLeg(
      spark, srcDir, ckptDir, outDir, failAtBatch = Some(2L), perDay)
    def entries(sub: String): Int = {
      val d = Paths.get(ckptDir, sub)
      if (!Files.isDirectory(d)) 0
      else {
        val s = Files.list(d)
        try s.iterator().asScala.count(p =>
          p.getFileName.toString.forall(_.isDigit))
        finally s.close()
      }
    }
    assert(entries("commits") == 2,
      s"leg 1 committed ${entries("commits")} batches — expected 2 before the crash")
    assert(entries("offsets") < 6,
      s"leg 1 logged ${entries("offsets")} offsets — the crash did not stop the drain")

    // Leg 2: same checkpoint, no fault — must replay batch 2 against the
    // restored state and drain the rest.
    graft.streaming.StreamingOps.quotaLeg(
      spark, srcDir, ckptDir, outDir, failAtBatch = None, perDay)
    assert(entries("commits") >= 6,
      s"leg 2 finished with ${entries("commits")} commits — expected all 6")

    val drained = spark.read.parquet(outDir)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    // Batch rule: first perDay events per (user, event-time day) in
    // (ts, event_id) order — x203's oracle shape.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), expr("ts div 86400000000"))
      .orderBy(col("ts"), col("event_id"))
    val batch = spark.read.parquet(srcDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perDay)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    assert(batch.nonEmpty, "batch quota admitted nothing")
    assert(batch.length < spark.read.parquet(srcDir).count(),
      "quota rejected nothing — the gate is vacuous at this SF")
    assert(drained.length == batch.length,
      s"exactly-once violated: ${drained.length} admissions vs batch ${batch.length}")
    assert(drained.toSeq == batch.toSeq,
      "admitted set differs from the batch rule after checkpoint recovery")
  }
}
