package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Checkpoint-recovery proof (r9 verdict #6): a stateful streaming
  * sessionization CRASHES mid-drain (fault injected at the start of
  * microbatch 2, with 4 of 6 source files still unread), then a fresh
  * query instance restarts from the same checkpoint directory and drains
  * the rest — and the union of committed output equals the batch
  * sessionization of the full input, row for row. That is exactly-once
  * across restart: no session lost (state store restored, offsets
  * resumed, the interrupted batch replayed) and none duplicated
  * (batchId-keyed idempotent sink writes).
  *
  * Sessions that SPAN the crash point (the source files are ts-range
  * partitioned, so user sessions cross file boundaries) only come out
  * right if the session-window state survives the restart.
  */
class StreamRecoverySpec extends SparkSuite {

  test("sessionization killed mid-drain resumes from checkpoint: drained == batch, exactly once") {
    val work = Files.createTempDirectory("graft_recovery_").toString
    val srcDir = s"$work/src"
    val ckptDir = s"$work/ckpt"
    val outDir = s"$work/out"

    // ---- stage: 4 ts-range files with ascending mtimes + 2 far-future
    // sentinel files (the x176 idiom: the 2031 batch applies the 2030
    // watermark inside a real data batch, so every session is evicted —
    // i.e. EMITTED — before the final drain returns).
    val src = Tables.events(spark, sfDir)
      .withColumn("ts", graft.functions.TimeCols.ntzEpochMicros("ts"))
    src.repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(srcDir)
    val base = Paths.get(srcDir)
    val parts = {
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toVector.sortBy(_.getFileName.toString)
      finally s.close()
    }
    assert(parts.size == 4)
    val t0 = System.currentTimeMillis() - 3600_000L
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L))
    }
    import spark.implicits._
    Seq(1893456000000000L, 1924992000000000L).zipWithIndex.foreach {
      case (us, i) =>
        val tmp = Paths.get(s"$work/sent$i")
        Seq((-1L - i, us, -1L, "sentinel", 0.0, ""))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.parquet(tmp.toString)
        val part = {
          val s = Files.list(tmp)
          try s.iterator().asScala
            .filter(_.getFileName.toString.startsWith("part-")).next()
          finally s.close()
        }
        val dest = base.resolve(s"part-zzz$i-sentinel.parquet")
        Files.move(part, dest)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(t0 + (10 + i) * 1000L))
    }

    // ---- leg 1: injected crash in microbatch 2, after its (uncommitted)
    // sink write — batches 0-1 committed, batch 2's output on disk but
    // not in the commit log, files 3-5 untouched
    graft.streaming.StreamingOps.sessionizeLeg(
      spark, srcDir, ckptDir, outDir, failAtBatch = Some(2L))
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
      s"leg 1 committed ${entries("commits")} batches — expected exactly 2 before the crash")
    assert(entries("offsets") < 6,
      s"leg 1 logged ${entries("offsets")} offsets — the crash did not stop the drain")

    // ---- leg 2: fresh query instance, same checkpoint, no fault --------
    graft.streaming.StreamingOps.sessionizeLeg(
      spark, srcDir, ckptDir, outDir, failAtBatch = None)
    // >= 6: all data batches committed (the engine may append a no-data
    // batch after the last file to apply the final watermark)
    assert(entries("commits") >= 6,
      s"leg 2 finished with ${entries("commits")} commits — expected all 6 data batches")

    // ---- drained output (batchId-keyed idempotent writes) vs batch -----
    val drained = spark.read.parquet(outDir)
      .filter(col("user_id") >= 0)
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = spark.read.parquet(srcDir)
      .filter(col("user_id") >= 0)
      .withColumn("ts", expr("timestamp_micros(ts)"))
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(sw.start)").as("start_us"),
        expr("unix_micros(sw.end)").as("end_us"), col("n_events"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(batch.nonEmpty, "batch sessionization produced no sessions")
    assert(drained.length == batch.length,
      s"exactly-once violated: drained ${drained.length} sessions vs batch ${batch.length}")
    assert(drained.toSeq == batch.toSeq,
      "drained sessions differ from batch after checkpoint recovery")
  }
}
