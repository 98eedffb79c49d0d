package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB the dominant cost of most scans is the bytes that do NOT
  * match the predicate; clustering files on a space-filling curve over
  * the two or three hottest filter columns makes parquet row-group
  * min/max pruning effective on BOTH columns at once (each z-range maps
  * to a small rectangle in (x, y) space). `zorderRepartition` is the
  * write-side helper: range-partition + sort by the z-value so every
  * output file covers a tight z-interval.
  *
  * The bit-interleave is pure integer arithmetic (shift/and/or folded
  * over the bit positions), expressed identically as a Catalyst Column
  * tree and as generated SQL — so the DuckDB oracle hash-checks every
  * bit of the curve.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of x (even positions) and y
    * (odd positions). Stays inside whole-stage codegen: it is a balanced
    * tree of shifts/ands/ors over two long columns.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** The same interleave as engine-neutral SQL over expressions `x`/`y`. */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster a DataFrame for writing: range-partition on the z-value and
    * sort within partitions, so each output file covers a tight z-range
    * (= a small (x,y) rectangle a reader can prune against).
    */
  def zorderRepartition(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.withColumn("zval", z)
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")

  val queries: Seq[QueryDef] = Seq(
    // The curve itself, hash-gated: z-values over (user_id, epoch-day)
    // for the event stream, keeping the 50 lowest (z, event_id) — the
    // exact keys a z-ordered writer would cluster on. Epoch-day is
    // integer date arithmetic in both engines.
    QueryDef(
      "x102_zorder_key",
      (s, dir) => {
        val day = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
          .cast("long")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), day.as("d"))
          .withColumn("zval",
            zvalue(col("user_id").bitwiseAND(lit(65535L)),
              col("d").bitwiseAND(lit(65535L))))
          .orderBy("zval", "event_id")
          .limit(50)
      },
      Some(s"""SELECT event_id, user_id,
              |       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
              |       ${zvalueSql("user_id & 65535",
                        "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) & 65535")} AS zval
              |FROM events
              |ORDER BY zval, event_id LIMIT 50""".stripMargin)))
}
