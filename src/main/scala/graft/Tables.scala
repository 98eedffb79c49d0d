package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Scale notes (100 TB design): all readers go through `spark.read.parquet`
  * so Catalyst's parquet source handles column pruning + predicate pushdown;
  * at cluster scale the same call reads a partitioned directory tree and
  * partition pruning applies unchanged. Nothing here collects to the driver.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's schema
    * inference rejects outright. Reading with an explicit schema (ts as
    * LongType = raw nanos) sidesteps inference entirely, so this loader
    * works on ANY session — including ones created without
    * `spark.sql.legacy.parquet.nanosAsLong` (e.g. the driver's own).
    * `DIV` (integer division) is required for the conversion: nanos ~1.7e18
    * exceed double's 2^53 exact range, so `/ 1000` would corrupt low bits.
    * TIMESTAMP_NTZ matches DuckDB's naive reading of the same column.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(raw).parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
