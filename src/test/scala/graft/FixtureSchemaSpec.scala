package graft

import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Guard against silent fixture-schema drift (the r7 incident): the driver
  * regenerated `events.parquet` with `ts` as TIMESTAMP(MICROS) while
  * `Tables.events` still applied the TIMESTAMP(NANOS) `DIV 1000` workaround,
  * shrinking every timestamp 1000× — monotonic, so order-based queries kept
  * passing while every absolute-time query silently broke.
  *
  * The guard compares Spark's view of `min(ts)`/`max(ts)` to the parquet
  * FOOTER statistics (unit-normalized via the file's own logical-type
  * annotation) at every SF. Any mismatch between the loader's unit
  * assumption and the file's actual encoding fails here before it can
  * reach an oracle run.
  */
class FixtureSchemaSpec extends SparkSuite {

  /** (min, max) epoch-micros of `ts` straight off the parquet footers,
    * normalized from whatever unit each file declares. Handles both a
    * single-file fixture (current) and a parquet directory (a future
    * regeneration could ship either).
    */
  private def footerTsRangeMicros(path: String): (Long, Long) = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      else Seq(path)
    assert(files.nonEmpty, s"no parquet files under $path")
    val ranges = files.map(footerTsRangeMicrosFile)
    (ranges.map(_._1).min, ranges.map(_._2).max)
  }

  private def footerTsRangeMicrosFile(path: String): (Long, Long) = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val ann = footer.getFileMetaData.getSchema.getType(Seq("ts"): _*)
        .asPrimitiveType.getLogicalTypeAnnotation
      val toMicros: Long => Long = ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.NANOS  => _ / 1000L
            case TimeUnit.MICROS => identity
            case TimeUnit.MILLIS => _ * 1000L
          }
        case other => fail(s"events.ts is not annotated as a timestamp: $other")
      }
      val stats = footer.getBlocks.asScala.map { block =>
        block.getColumns.asScala.find(_.getPath.toDotString == "ts")
          .getOrElse(fail(s"no ts column chunk in $path")).getStatistics
      }
      assert(stats.nonEmpty && stats.forall(_.hasNonNullValue),
        s"ts footer statistics missing in $path")
      val mins = stats.map(s => toMicros(s.genericGetMin.asInstanceOf[java.lang.Long].longValue))
      val maxs = stats.map(s => toMicros(s.genericGetMax.asInstanceOf[java.lang.Long].longValue))
      (mins.min, maxs.max)
    } finally reader.close()
  }

  private def sparkTsRangeMicros(dir: String): (Long, Long) = {
    def micros(ldt: java.time.LocalDateTime): Long = {
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    }
    val row = Tables.events(spark, dir).agg(min("ts"), max("ts")).head()
    (micros(row.getAs[java.time.LocalDateTime](0)),
      micros(row.getAs[java.time.LocalDateTime](1)))
  }

  for (sf <- Seq("0.001", "0.01", "0.1")) {
    test(s"sf$sf: Tables.events ts range matches the parquet footer exactly") {
      val dir = s"/root/testdata/sf$sf"
      val (fMin, fMax) = footerTsRangeMicros(s"$dir/events.parquet")
      val (sMin, sMax) = sparkTsRangeMicros(dir)
      assert(sMin == fMin, s"min(ts) drift: spark=$sMin footer=$fMin (unit bug in Tables.events?)")
      assert(sMax == fMax, s"max(ts) drift: spark=$sMax footer=$fMax (unit bug in Tables.events?)")
      // belt-and-braces sanity: the fixture's event history is modern-era;
      // a unit error of any power of 1000 lands decades away from this band.
      val year2000Micros = 946684800000000L
      assert(sMin > year2000Micros, s"min(ts)=$sMin collapsed to pre-2000 — unit mangling")
    }
  }

  test("instant-typed events fixture reads session-independently") {
    // Exercise the loader's TimestampType branch (the current fixture
    // infers NTZ, so this branch otherwise never runs): write an
    // isAdjustedToUTC=true twin (Spark's TimestampType parquet output),
    // then read it on a UTC session AND a Tokyo session — the
    // convert_timezone composition must yield identical UTC wall times,
    // equal to the original fixture's.
    val tmpPath = java.nio.file.Files.createTempDirectory("graft_tz")
    val tmp = tmpPath.toString
    try {
      Tables.events(spark, sfDir)
        .withColumn("ts", org.apache.spark.sql.functions.expr("CAST(ts AS TIMESTAMP)"))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val instType = spark.read.parquet(s"$tmp/events.parquet").schema("ts").dataType
      assert(instType == org.apache.spark.sql.types.TimestampType,
        s"twin fixture unexpectedly wrote $instType")
      val utc = Tables.events(spark, tmp).agg(min("ts"), max("ts")).head()
      val tokyo = spark.newSession()
      tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val jst = Tables.events(tokyo, tmp).agg(min("ts"), max("ts")).head()
      assert(utc == jst, s"session tz leaked into the instant branch: $utc vs $jst")
      val orig = Tables.events(spark, sfDir).agg(min("ts"), max("ts")).head()
      assert(utc == orig, s"instant round-trip drifted: $utc vs $orig")
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(tmpPath)
      try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
  }

  test("Tables.events ts is TIMESTAMP_NTZ with the full column set") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
