package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * r15 verdict #1 — CORRECTNESS_r15.json landed EMPTY because this gate
  * (sequential dump 12.1 min + single-threaded compare 7.7 min) outgrew
  * the driver window, exactly like BENCH_r14 before the bench got its
  * deadline machinery. This rewrite puts the dump on the same "the record
  * always lands" footing:
  *
  *  1. `oracle_sql.json` is written FIRST — a cut-off run still delivers
  *     the full oracle map, so every undumped query reads as an explicit
  *     named failure in the compare instead of a silent `{}`.
  *  2. [[Prebuild]] stages stream fixtures / persisted indexes up front
  *     (one-time costs leave the per-query path; parallel workers can't
  *     race a build).
  *  3. The 275 queries are independent — a small worker pool dumps them
  *     concurrently, each worker on its own `spark.newSession()` CLONE
  *     (shared SparkContext + external catalog, but private SQLConf /
  *     temp views / experimental strategies, so per-query `conf.set`
  *     scopes and temp-view registrations cannot cross-talk). Longest
  *     queries (by the committed quiet basis) are dequeued first to
  *     minimize makespan.
  *  4. A wall-clock deadline (`SPARK_GRAFT_VERIFY_DEADLINE_SEC`, default
  *     600 s) checked before each query: past it, remaining queries are
  *     SKIPPED with a manifest line naming them — precision degrades
  *     before the record vanishes.
  *  5. `verify_manifest.jsonl` is appended per query (ok/fail/skipped +
  *     seconds), so even a SIGKILL mid-run leaves a parseable account of
  *     what completed.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wall0) / 1e9
    val sfDir = args(0)
    val outDir = args(1)
    // Optional 3rd arg: comma-separated query names — local dev iteration
    // only (the driver always runs the full set with 2 args).
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    val deadlineSec = sys.env.getOrElse(
      "SPARK_GRAFT_VERIFY_DEADLINE_SEC", "600").toDouble
    val par = math.max(1, sys.env.getOrElse(
      "SPARK_GRAFT_VERIFY_PAR", "6").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val manifest = Paths.get(s"$outDir/verify_manifest.jsonl")
    Files.deleteIfExists(manifest)
    val noteLock = new Object
    def note(name: String, status: String, sec: Double): Unit =
      noteLock.synchronized {
        Files.writeString(manifest,
          s"""{"name":${q(name)},"status":"$status","sec":${
            BigDecimal(sec).setScale(1, BigDecimal.RoundingMode.HALF_UP)}}""" +
            "\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }

    val spark = Sessions.local(cpus)
    // Dev-filtered runs skip the setup phase: a single query self-builds
    // what it needs (lazily, as before) and there's nothing to race.
    if (only.isEmpty) {
      val preSec = Prebuild.run(spark, sfDir)
      note("_prebuild", "ok", preSec)
    }

    // Longest-first (committed quiet basis; basis-blind queries first —
    // unknown cost may be large) so the pool's makespan isn't one slow
    // straggler behind a drained queue.
    val basis: Map[String, Double] = {
      val f = new java.io.File("BENCH_BASIS.json")
      if (!f.isFile) Map.empty
      else {
        val txt = new String(Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        """"([qx]?\d+)":(\d+(?:\.\d+)?)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    def shortId(k: String): String = {
      val id = k.takeWhile(_ != '_')
      val digits = id.tail.dropWhile(_ == '0')
      val s = s"${id.head}${if (digits.isEmpty) "0" else digits}"
      if (s.head == 'x') s.tail else s
    }
    val ordered = names.sortBy(n => -basis.getOrElse(shortId(n), 1e9))
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    ordered.foreach(queue.add)
    val nOk = new AtomicInteger(0)
    val nFail = new AtomicInteger(0)
    val nSkip = new AtomicInteger(0)

    def worker(): Unit = {
      // Per-worker session clone: shared context/catalog, private conf.
      val sess = spark.newSession()
      // UDF registrations are per-session: on the old shared session a
      // query could ride an earlier query's register() — a clone can't.
      graft.functions.GraftFunctions.register(sess)
      var n = queue.poll()
      while (n != null) {
        if (elapsedSec > deadlineSec) {
          nSkip.incrementAndGet()
          note(n, "skipped", 0.0)
          System.err.println(s"[verify] deadline: skipped $n")
        } else {
          val t0 = elapsedSec
          try {
            SparkEntry.queries(n)(sess, sfDir).coalesce(1)
              .write.mode("overwrite").parquet(s"$outDir/$n")
            nOk.incrementAndGet()
            note(n, "ok", elapsedSec - t0)
          } catch { case e: Throwable =>
            nFail.incrementAndGet()
            note(n, "fail", elapsedSec - t0)
            System.err.println(s"[verify] $n failed: ${e.getMessage}")
          }
        }
        n = queue.poll()
      }
    }
    val threads = (1 to math.min(par, ordered.size)).map { i =>
      val t = new Thread(() => worker(), s"verify-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    note("_summary",
      s"ok=${nOk.get} fail=${nFail.get} skipped=${nSkip.get}", elapsedSec)
    println(f"[verify] ${nOk.get} ok, ${nFail.get} fail, " +
      f"${nSkip.get} skipped in $elapsedSec%.1fs (par=$par, cpus=$cpus)")
    spark.stop()
  }
}
