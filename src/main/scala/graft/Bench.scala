package graft

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Forces FULL evaluation of every query via the `noop` sink (count() alone
  * would let Catalyst prune projections and skip most of the work — that
  * would be benchmarking nothing). One warmup pass primes the JVM/codegen
  * caches so the timed pass measures the engine, not JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    // var: the isolated-adjudication phase replaces the suite session with
    // a fresh one (see below) so its measurements escape accumulated JVM/
    // block-manager state.
    var spark = Sessions.local(cpus)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that localCheckpoint() intermediates (shingle index, label
      // propagation) leave persisted RDD blocks behind; across 83 queries
      // x 3 passes those accumulate into storage-memory pressure that slows
      // LATER runs of the same queries (x02 measured 2.0s isolated vs 5.5s
      // in-suite in r3). Dropping leftovers after each query makes every
      // measurement start from the same clean block-manager state.
      // EXCEPT the shared co-purchase table: it exists to be reused across
      // the graph queries (r11 verdict #4 — per-run infrastructure, like a
      // persisted edge table in production); sweeping it would force each
      // graph query to re-derive it, which is exactly the waste it removes.
      val keep = graft.operators.CoPurchaseGraph.sharedRddIds(spark)
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id)).foreach(_.unpersist(false))
      dt
    }

    // --- host-noise calibration (r13 verdict #3): two fixed ~1 s probes
    // timed BEFORE the suite — a CPU row (range+hash aggregate, no I/O:
    // scheduler/CPU co-tenancy) and an IO row (one full lineitem scan:
    // page-cache/disk co-tenancy). Same warmup + min-of-2 protocol as
    // every other number. When either reads > 1.3x its committed
    // quiet-window reference the whole record is tagged "noisy": the
    // drift gate then knows this round's basis is inflated, and the
    // NEXT round's prior selection skips noisy records (r13's close
    // committed a 369.5 s host-co-tenancy artifact as the gate's prior —
    // a genuine ~13% regression next round would have read as flat).
    def timeCal(body: => Unit): Double = {
      body // warmup
      def once: Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    def calibrate(): (Double, Double) = {
      val cpu = timeCal {
        spark.range(0L, 1500000000L, 1L, cpus)
          .selectExpr("bit_xor(xxhash64(id)) AS s")
          .write.mode("overwrite").format("noop").save()
      }
      val io = timeCal {
        Tables.lineitem(spark, sfDir)
          .selectExpr("bit_xor(xxhash64(l_orderkey, l_extendedprice, l_returnflag)) AS s")
          .write.mode("overwrite").format("noop").save()
      }
      (cpu, io)
    }
    val (calCpu, calIo) = calibrate()
    // Quiet-window references, measured on this host (min-of-2 after
    // warmup, idle box, r14). sf-dependent IO reference: only the
    // official sf0.1 run is gated — other SFs record the probes but
    // never tag (their records are local smokes, not the round basis).
    val CalRefCpu = 0.55
    val CalRefIo = 0.42
    val isOfficialSf = new java.io.File(sfDir).getName == "sf0.1"
    def hot(cpu: Double, io: Double): Boolean =
      cpu > 1.3 * CalRefCpu || io > 1.3 * CalRefIo

    // Optional comma-separated name filter — local isolation experiments
    // only (the driver never sets it, so per-round numbers stay full-set).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach(run) // warmup (JIT + codegen caches)
    // Two timed passes, per-query minimum: single-pass numbers showed up
    // to 6x noise on first post-warmup execution (GC/compilation stragglers).
    val pass1 = names.map(n => n -> run(n)).toMap
    val pass2 = names.map(n => n -> run(n)).toMap
    // END-of-suite calibration (r14, after the drift instrumentation's
    // first live firing): the start probe alone missed a co-tenant that
    // RAMPED during the ~35-min run — start read quiet, yet 196/267
    // common queries drifted >1.2x uniformly while the end-of-run
    // isolated column re-read them at 0.4-0.9x. Probing again at suite
    // end makes a mid-run environment shift visible in the record
    // itself; either reading above the bar tags the record noisy.
    val (calCpuEnd, calIoEnd) = calibrate()
    val noisy = isOfficialSf &&
      (hot(calCpu, calIo) || hot(calCpuEnd, calIoEnd))
    if (noisy)
      System.err.println(f"[bench] WARNING calibration noisy: start cpu " +
        f"$calCpu%.2fs io $calIo%.2fs, end cpu $calCpuEnd%.2fs io " +
        f"$calIoEnd%.2fs (refs $CalRefCpu%.2f/$CalRefIo%.2f, bar 1.3x) — " +
        "record tagged; drift basis for next rounds should skip it")
    val results = names.map { n =>
      val (a, b) = (pass1(n), pass2(n))
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    def ms(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Per-query: DECIsecond precision and zero-stripped ids ("q1",
    // "x5", "x116" — the driver contract's own example key style). r6's
    // centisecond encoding overflowed the driver's 2000-char stdout tail
    // at 176 queries and elided 20; one decimal (~10.5 B/query) keeps all
    // ~178 queries visible in the official record (r6 verdict task 9 —
    // full 3-decimal precision is always in target/bench.json).
    // Integral deciseconds drop the redundant ".0" ("2.0" → "2", still a
    // valid JSON number of seconds) — ~9 entries per run, and those ~18
    // bytes are what keeps the 180-query map inside the tail cap.
    def cs(v: Double): String = {
      val s = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
      if (s.isWhole) s.toBigInt.toString else s.toString
    }
    def sid(k: String): String = {
      val id = k.takeWhile(_ != '_')
      val digits = id.tail.dropWhile(_ == '0')
      s"${id.head}${if (digits.isEmpty) "0" else digits}"
    }
    // Stdout-line id: the x prefix carries no information ("165" can only
    // be x165 — q-ids keep their q), and dropping it buys ~165 bytes of
    // the 1910-byte stdout budget — the difference between a complete
    // 187-query map and an elided one. q-ids keep the prefix so the
    // driver-contract example key "q1" stays literal.
    def outId(k: String): String = {
      val s = sid(k)
      if (s.head == 'x') s.tail else s
    }
    // Two queries may never collapse onto one short id ("x05" and a future
    // "x5" would silently merge their timings in the JSON map).
    require(results.map(r => outId(r._1)).distinct.size == results.size,
      "zero-stripped bench ids must be unique")

    // --- self-adjudication: any query that drifted >1.5x vs the PRIOR
    // round's driver-recorded time gets an isolated re-run (fresh, after
    // the whole suite — the established discriminator between a real plan
    // regression and JVM co-tenancy noise), and BOTH numbers are recorded.
    // Prior times come from the newest BENCH_r{N}.json tail in cwd, whose
    // compact line holds `"x90":0.93`-style pairs (full names carry a
    // trailing underscore, so the bare-id regex can't match them).
    val priorTimes: Map[String, Double] = {
      def parse(f: java.io.File): Map[String, Double] = {
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        // Value may be integral ("x152":7) since the .0-stripping change —
        // the decimal part is optional or the whole-decisecond entries
        // vanish from next round's drift adjudication.
        // Accepts both the pre-r9 x-prefixed ids and the bare-digit ids
        // the stdout line now carries.
        val pairRe = """\\?"([qx]?\d+)\\?":(\d+(?:\.\d+)?)""".r
        pairRe.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap // last wins
      }
      // Quiet-basis preference (r13 verdict #3): BENCH_BASIS.json — the
      // most recent full sf0.1 run whose calibration row read quiet,
      // self-maintained below — beats the newest driver record, because
      // the newest record can be a host-co-tenancy artifact (r13's
      // committed close was 369.5 s vs same-code quiet-window 321.4 s;
      // with it as basis a real ~13% regression would read as flat).
      // Among driver records, skip any tagged "noisy".
      val basis = new java.io.File("BENCH_BASIS.json")
      if (basis.isFile) parse(basis)
      else {
        val dir = new java.io.File(".")
        val benchRe = "BENCH_r(\\d+)\\.json".r
        val files = Option(dir.listFiles()).getOrElse(Array.empty)
          .flatMap(f => f.getName match {
            case benchRe(n) => Some(n.toInt -> f)
            case _ => None
          })
        val quiet = files.sortBy(-_._1).find { case (_, f) =>
          !new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8).contains("\"noisy\":true")
        }
        quiet.orElse(files.sortBy(_._1).lastOption)
          .map { case (_, f) => parse(f) }.getOrElse(Map.empty)
      }
    }
    // x137 is pinned: its r6 in-suite time (28.1 s) was 4x its isolated
    // time and the verdict asked for the gap to be pinned down IN the
    // official record each round, not presumed co-tenancy.
    val pinnedIsolated = Set("x137_incremental_dedup")
    // The top-10 in-suite costs ALWAYS get isolated re-runs (r8 verdict
    // #7 established the column at top-5; r13 verdict #7 widened it to 10
    // so co-tenancy adjudication doesn't depend on which queries happened
    // to drift).
    val top5 = results.sortBy(-_._2).take(10).map(_._1).toSet
    // Third element: this entry exists to ADJUDICATE a drift (prior-round
    // comparison or the x137 pin) — those stay on the stdout line even
    // when the isolated number merely confirms the in-suite one, because
    // the confirmation IS the verdict ("real regression, not co-tenancy").
    // Routine top-5 entries that just confirm carry no information and
    // may be dropped from stdout (full map always in target/bench.json).
    // The isolated re-runs happen in a FRESH SparkSession after a full GC:
    // r11's record showed the end-of-suite re-runs reading HIGHER than
    // in-suite for five of eight entries (x171 13.1 isolated vs 2.3
    // in-suite) — after 246 queries x 3 passes the accumulated
    // session/JVM state dominated the measurement and the column INVERTED
    // its purpose (it exists to separate real plan regressions from
    // co-tenancy noise). Stopping the suite session drops the block
    // manager, broadcast blocks, and listener queues; the JIT and the
    // JVM-global codegen cache survive, so the fresh session still
    // measures warm code (min-of-2 absorbs the rest).
    val toIsolate: Seq[(String, Double, Boolean)] =
      if (only.nonEmpty) Seq.empty // isolation experiments: skip adjudication
      else results.flatMap { case (n, v) =>
        val drifted = priorTimes.get(outId(n)).orElse(priorTimes.get(sid(n))) match {
          case Some(p) => p >= 0.05 && v > 1.5 * p && v - p > 0.1
          case None => false
        }
        if (drifted || pinnedIsolated(n) || top5(n))
          Some((n, v, drifted || pinnedIsolated(n)))
        else None
      }
    val isolated: Seq[(String, Double, Boolean)] =
      if (toIsolate.isEmpty) Seq.empty
      else {
        spark.stop()
        System.gc()
        spark = Sessions.local(cpus)
        toIsolate.map { case (n, _, adjudicating) =>
          // Same protocol as the in-suite column: one UNTIMED warmup run,
          // then min-of-2 timed. r12's driver record read x137 at 17.7 s
          // isolated vs 6.3 in-suite (2.8x, above the 1.5x bar) because
          // the isolated column skipped the warmup the in-suite column
          // got — the first fresh-session run pays one-time costs (file
          // listing, this query's private two-snapshot derivation priming
          // the page/broadcast caches) that the suite's warmup pass had
          // absorbed before any in-suite number was taken (r12 verdict
          // #3). The columns must measure the same thing to adjudicate
          // co-tenancy.
          run(n)
          (n, math.min(run(n), run(n)), adjudicating)
        }
      }
    // Sanity check on the protocol itself (r11 verdict #2): a CONFIRMING
    // isolated number materially above in-suite means the fresh-session
    // reset failed to remove the co-tenancy — surface it loudly (stderr,
    // not a crash: the full-suite record must still land for the round).
    // Guard: both numbers must be SUCCESSES — a query that failed in-suite
    // (-1.0, e.g. pinned x137 under a broken build) but succeeds isolated
    // would make the comparison trivially true and print a nonsense
    // warning (r12 advice #2).
    isolated.foreach { case (n, iso, _) =>
      val suite = results.toMap.getOrElse(n, iso)
      if (suite >= 0 && iso >= 0 && iso > 1.5 * suite && iso - suite > 1.0)
        System.err.println(f"[bench] WARNING isolated inversion: $n " +
          f"isolated $iso%.1fs > 1.5x in-suite $suite%.1fs")
    }

    // The driver tail-captures only the LAST 2000 chars of stdout
    // (measured from BENCH_r04.json), and the full-name query map alone is
    // ~3.7 KB — the head of the JSON line was cut off in r3 AND r4, leaving
    // "parsed": null both rounds. The full-precision, full-name JSON goes to
    // a file; stdout gets a compact line that always fits the window: keys
    // shortened to their id prefix (q01/x39 — the driver contract's own
    // example uses "q1"), values rounded to ms. ~13 bytes/query keeps the
    // line under 2 KB well past 140 queries.
    // --- suite-level drift gate (r11 verdict #5): the common-query sum vs
    // the prior round's record. r11 drifted +28.5 s (12%) on 208 unchanged
    // queries and nothing mechanical caught it; per-query adjudication
    // only fires at 1.5x, which broad shallow drift never trips. The gate
    // compares Σ(time) over queries present in BOTH rounds and flags the
    // record when the sum exceeds 1.25x — "adjudication required" rides
    // the committed JSON (and stdout when it fires), not an exit code:
    // the round's record must land either way.
    val commonDrift: Option[String] =
      // Same-SF comparisons only: the prior record is the driver's sf0.1
      // run, so a local smoke at another SF would compare apples to
      // oranges (its absolute times are ~2x-10x off either way).
      if (only.nonEmpty || priorTimes.isEmpty ||
          new java.io.File(sfDir).getName != "sf0.1") None
      else {
        val common = results.filter { case (n, v) =>
          v >= 0 && priorTimes.contains(outId(n))
        }
        if (common.isEmpty) None
        else {
          val prior = common.map(c => priorTimes(outId(c._1))).sum
          val now = common.map(_._2).sum
          val alarm = prior > 0 && now > 1.25 * prior
          if (alarm)
            System.err.println(f"[bench] WARNING common-query drift: " +
              f"${common.size} shared queries $now%.1fs vs prior " +
              f"$prior%.1fs (> 1.25x) — adjudication required")
          Some(s""""common_drift":{"n":${common.size},"prior":${ms(prior)},"now":${ms(now)},"alarm":$alarm}""")
        }
      }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val isoFull = isolated
      .map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val driftFull = commonDrift.map("," + _).getOrElse("")
    val calFull =
      s""","calibration":{"cpu":${ms(calCpu)},"io":${ms(calIo)},"cpu_end":${ms(calCpuEnd)},"io_end":${ms(calIoEnd)},"ref_cpu":$CalRefCpu,"ref_io":$CalRefIo,"noisy":$noisy}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"isolated":$isoFull$driftFull$calFull,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // ALSO drop the full-precision record at the repo root: past ~200
    // queries the complete per-query map physically exceeds the driver's
    // 2 KB stdout tail (203 entries ≈ 1.96 KB before the fixed JSON
    // overhead), so the stdout line must elide a handful of the fastest
    // entries — the complete official record is this committed file (the
    // driver commits uncommitted work each round), and the stdout line
    // stays the at-a-glance summary. FULL runs only: an isolation
    // experiment (SPARK_GRAFT_BENCH_ONLY set) must never overwrite the
    // official full-suite record with a partial subset (r9 advice).
    // ... and OFFICIAL-SF runs only: the record is the sf0.1 number; a
    // local sf0.001 smoke must not overwrite it any more than a partial
    // subset may (same defect class as the r9 advice).
    if (only.isEmpty && isOfficialSf) {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // Self-maintained quiet basis (r13 verdict #3): a full official-SF
      // run whose calibration read QUIET *and* whose common-query drift
      // did not alarm becomes the next drift-gate basis; a noisy OR
      // alarmed run leaves the previous quiet basis in place. The alarm
      // condition is load-bearing: the r14 close read quiet at the start
      // probe yet drifted 196/267 common queries >1.2x (a co-tenant that
      // ramped mid-run) — without it, that inflated map would have
      // replaced the quiet basis and blinded the next round's gate, the
      // exact defect the basis exists to prevent.
      // SHORT-id keys on purpose — priorTimes' pair regex parses only
      // the compact `"x90":0.93` form (full names carry underscores).
      val alarmed = commonDrift.exists(_.contains("\"alarm\":true"))
      // ... and the update additionally requires NEAR-FLAT drift
      // (common sum <= 1.05x the basis), not merely "no alarm": the r14
      // close measured the ratchet this prevents — three same-night runs
      // at 321 -> 376 -> 425 s, each step under the 1.25x alarm with
      // quiet probes, each replacing the basis, compounding to +32%
      // basis inflation in one night. A <=5% step cannot compound past
      // the alarm bar before a genuinely quiet run resets it.
      val nearFlat = commonDrift.forall { d =>
        val re = """"prior":([0-9.]+),"now":([0-9.]+)""".r
        re.findFirstMatchIn(d).forall { m =>
          m.group(2).toDouble <= 1.05 * m.group(1).toDouble
        }
      }
      if (!noisy && !alarmed && nearFlat) {
        val basisQs = results
          .map { case (k, v) => "\"" + outId(k) + "\":" + ms(v) }
          .mkString("{", ",", "}")
        val basisJson =
          s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$basisQs$calFull,"sf":"sf0.1"}"""
        java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_BASIS.json"),
          basisJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    def shortLine(rs: Seq[(String, Double)], note: String,
        withIso: Boolean): String = {
      val qs = rs.map { case (k, v) => "\"" + outId(k) + "\":" + cs(v) }
        .mkString("{", ",", "}")
      // Stdout carries the INFORMATIVE isolated entries: every
      // drift/pin-triggered adjudication (its number is a verdict either
      // way — "confirmed regression" vs "co-tenancy artifact"), plus any
      // routine top-5 entry whose isolated time actually differs from the
      // in-suite time (>20% and >0.5 s). A top-5 entry that merely
      // confirms the in-suite number spends tail bytes to say nothing,
      // and at 200+ queries those bytes are what pushes the complete
      // per-query map out of the driver's 2 KB window. The FULL isolated
      // map is always in target/bench.json.
      val informative = isolated.filter { case (k, v, adjudicating) =>
        val suite = results.toMap.getOrElse(k, v)
        adjudicating || math.abs(v - suite) > math.max(0.5, 0.2 * suite)
      }
      val iso =
        if (!withIso || informative.isEmpty) ""
        else informative.map { case (k, v, _) => "\"" + outId(k) + "\":" + cs(v) }
          .mkString(""","isolated":{""", ",", "}")
      // sf shortened to its basename ("sf0.1") — the full path cost 18
      // tail chars for zero information; total at decisecond precision
      // on stdout (full 3-decimal total is in target/bench.json).
      val sfShort = new java.io.File(sfDir).getName
      s"""{"metric":"total","value":${cs(total)},"unit":"sec"$note$iso,"queries":$qs,"sf":"$sfShort"}"""
    }
    // Keep the stdout line inside the driver's 2 KB stdout tail: the
    // overhead sharing that tail is sbt's "[info] " prefix (7 B), the
    // trailing "[success] Total time: …" line (~77 B) and two newlines —
    // measured ~90 B, so cap at 1910. Priority order (r7 lesson — the
    // isolated map crowded out 30 per-query times from the official
    // record): (1) complete queries map + isolated map; (2) complete
    // queries map, isolated only in target/bench.json; (3) elide the
    // FEWEST fastest queries that make it fit (step of 1, not 10) with
    // an elided count — a truncated-but-parseable line beats an
    // overflowing complete one.
    val lineCap = 1910
    // The drift alarm earns stdout bytes only when it FIRES (the healthy
    // case says nothing — the full numbers are in the committed JSON).
    val driftNote =
      (if (commonDrift.exists(_.contains("\"alarm\":true")))
        ""","drift_alarm":true""" else "") +
        // The calibration row rides the official stdout record (r13
        // verdict #3: BENCH_r14 must carry it); "noisy" earns its bytes
        // only when it fires.
        s""","cal":{"cpu":${cs(calCpu)},"io":${cs(calIo)}}""" +
        (if (noisy) ""","noisy":true""" else "")
    val withIsoLine = shortLine(results, driftNote, withIso = true)
    val noIsoLine = shortLine(results, driftNote, withIso = false)
    val compact =
      if (withIsoLine.length <= lineCap) withIsoLine
      else if (noIsoLine.length <= lineCap) noIsoLine
      else {
        val bySlow = results.sortBy(-_._2)
        var keep = bySlow.length
        var line = noIsoLine
        while (line.length > lineCap && keep > 1) {
          keep -= 1
          line = shortLine(bySlow.take(keep).sortBy(_._1),
            s""","elided":${results.length - keep}$driftNote""", withIso = false)
        }
        line
      }
    // Printed ONCE, after stop: the driver keeps only the LAST 2000 stdout
    // chars, and r6's belt-and-braces double print cost the tail window a
    // full copy of the line — the single post-stop print leaves room for
    // the whole 178-query map plus sbt's trailing [success] line.
    spark.stop()
    println(compact)
  }
}
