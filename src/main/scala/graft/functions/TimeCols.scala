package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Session-timezone-independent time conversions.
  *
  * The fixture's `events.ts` is TIMESTAMP_NTZ whose wall time is semantically
  * UTC (TESTDATA.md; DuckDB reads it the same way). Converting that wall time
  * to epoch micros with `unix_micros(CAST(ts AS TIMESTAMP))` interprets the
  * NTZ value in the SESSION timezone — on a non-UTC driver session every
  * timestamp shifts by the tz offset and all downstream event-time queries
  * drift from their oracles. `timestampdiff` over NTZ values is computed
  * directly on the NTZ internal representation (micros since the epoch LOCAL
  * datetime, no timezone involved), so it is session-independent by
  * construction; a Tokyo-session spec (`FixtureSchemaSpec`) proves it.
  */
object TimeCols {
  /** Epoch micros of an NTZ wall time interpreted as UTC, independent of
    * `spark.sql.session.timeZone`. Requires a TIMESTAMP_NTZ column: for a
    * TimestampType column, type coercion would cast the NTZ epoch literal via
    * the session tz, reintroducing the dependence (use plain `unix_micros`
    * there — instants are already absolute).
    */
  def ntzEpochMicrosExpr(colName: String): String =
    s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', $colName)"

  def ntzEpochMicros(colName: String): Column = expr(ntzEpochMicrosExpr(colName))
}
