package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Skew mitigation for aggregations over hot keys (100 TB design note made
  * executable).
  *
  * AQE handles skewed *joins* automatically, but a groupBy with one
  * dominant key still funnels that key's whole partition through a single
  * reducer. [[saltedAgg]] is the standard fix: phase 1 aggregates on
  * (key, salt) — spreading a hot key over `salts` reducers — phase 2
  * merges the per-salt partials. Correct for any decomposable aggregate;
  * provided here for sum/count (the common case), with exact decimal sums.
  */
object Skew {

  /** Columns Spark's hash/xxhash64 accepts — MapType (at any nesting
    * depth) is rejected by default (unordered entries make its hash
    * ill-defined), so map-bearing columns are excluded from the salt.
    */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case ArrayType(e, _) => hashable(e)
    case StructType(fs) => fs.forall(f => hashable(f.dataType))
    case _ => true
  }

  /** A decomposable aggregate for [[saltedAggs]]: one that splits into a
    * per-salt partial and an exact merge (sum/count/min/max directly;
    * avg as merged-sum / merged-count). Non-decomposable aggregates
    * (median, collect_set) cannot be salted this way — use approx
    * sketches or dedicated operators for those.
    */
  sealed trait SaltedSpec { def out: String }
  final case class SaltedSum(value: Column, out: String) extends SaltedSpec
  final case class SaltedCount(out: String) extends SaltedSpec
  final case class SaltedMin(value: Column, out: String) extends SaltedSpec
  final case class SaltedMax(value: Column, out: String) extends SaltedSpec
  final case class SaltedAvg(value: Column, out: String) extends SaltedSpec

  /** Two-phase salted aggregation over an arbitrary list of decomposable
    * aggregates: phase 1 groups on (key, salt) — spreading a hot key over
    * `salts` reducers — phase 2 merges the per-salt partials per key.
    * Sums (and avg numerators) accumulate in exact decimals so the salted
    * result is bit-identical to the unsalted plan, not merely close.
    */
  def saltedAggs(df: DataFrame, key: Column, aggs: Seq[SaltedSpec],
      salts: Int = 32, saltCols: Seq[Column] = Nil): DataFrame = {
    require(aggs.nonEmpty, "saltedAggs: need at least one aggregate")
    // The salt must be DETERMINISTIC per row: a positional salt
    // (monotonically_increasing_id, spark_partition_id) changes on stage
    // retry after a shuffle-fetch failure, so recomputed map tasks re-salt
    // rows differently while surviving reducers keep old partials — lost or
    // duplicated rows (the SPARK-23207 failure class). Content-derived
    // xxhash64 re-salts identically on recompute; fully identical rows
    // sharing a salt only narrows spreading for exact duplicates, which is
    // acceptable. Default salt input is every hashable column (maps are
    // rejected by xxhash64 — see `hashable`); callers with a unique id
    // column should pass it via `saltCols` for maximal spread.
    val inputs =
      if (saltCols.nonEmpty) saltCols
      else df.schema.fields.toSeq
        .filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(inputs.nonEmpty, "saltedAggs: no hashable columns to derive a salt from")
    val salt = pmod(xxhash64(inputs: _*), lit(salts))

    val partials: Seq[Column] = aggs.zipWithIndex.flatMap {
      case (SaltedSum(v, _), i) =>
        Seq(sum(v.cast(DecimalType(18, 6))).as(s"_p$i"))
      case (SaltedCount(_), i) => Seq(count(lit(1)).as(s"_p$i"))
      case (SaltedMin(v, _), i) => Seq(min(v).as(s"_p$i"))
      case (SaltedMax(v, _), i) => Seq(max(v).as(s"_p$i"))
      case (SaltedAvg(v, _), i) =>
        Seq(sum(v.cast(DecimalType(18, 6))).as(s"_p${i}s"),
          count(lit(1)).as(s"_p${i}c"))
    }
    val merges: Seq[Column] = aggs.zipWithIndex.map {
      case (SaltedSum(_, out), i) => sum(col(s"_p$i")).cast("double").as(out)
      case (SaltedCount(out), i) => sum(col(s"_p$i")).as(out)
      case (SaltedMin(_, out), i) => min(col(s"_p$i")).as(out)
      case (SaltedMax(_, out), i) => max(col(s"_p$i")).as(out)
      case (SaltedAvg(_, out), i) =>
        (sum(col(s"_p${i}s")).cast("double") / sum(col(s"_p${i}c"))).as(out)
    }
    df.groupBy(key.as("k"), salt.as("salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy("k")
      .agg(merges.head, merges.tail: _*)
  }

  /** The common sum+count case (kept as the x35 query surface). */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
      salts: Int = 32, saltCols: Seq[Column] = Nil): DataFrame =
    saltedAggs(df, key,
      Seq(SaltedSum(value, "total"), SaltedCount("cnt")), salts, saltCols)
}
