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

  def saltedAgg(df: DataFrame, key: Column, value: Column,
      salts: Int = 32, saltCols: Seq[Column] = Nil): DataFrame = {
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
    require(inputs.nonEmpty, "saltedAgg: no hashable columns to derive a salt from")
    val salt = pmod(xxhash64(inputs: _*), lit(salts))
    val salted = df.groupBy(key.as("k"), salt.as("salt"))
      .agg(sum(value.cast(DecimalType(18, 6))).as("psum"), count(lit(1)).as("pcnt"))
    salted.groupBy("k")
      .agg(sum(col("psum")).cast("double").as("total"), sum(col("pcnt")).as("cnt"))
  }
}
