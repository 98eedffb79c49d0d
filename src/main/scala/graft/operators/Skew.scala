package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  def saltedAgg(df: DataFrame, key: Column, value: Column,
      salts: Int = 32): DataFrame = {
    // Salt value never reaches the result (phase 2 merges partials), so a
    // row-order-dependent salt is safe; it only needs to spread rows.
    val salted = df.groupBy(key.as("k"), pmod(monotonically_increasing_id(), lit(salts)).as("salt"))
      .agg(sum(value.cast(DecimalType(18, 6))).as("psum"), count(lit(1)).as("pcnt"))
    salted.groupBy("k")
      .agg(sum(col("psum")).cast("double").as("total"), sum(col("pcnt")).as("cnt"))
  }
}
