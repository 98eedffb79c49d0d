package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the full physical-plan audit as part of `sbt test`, so a failing
  * plan property (lost pushdown, a sort-merge where a broadcast belongs,
  * an unpartitioned window) fails the BUILD — not just the standalone
  * per-round `runMain graft.PlanAudit` the driver may or may not run.
  *
  * Isolated in its own forked JVM (build.sbt `Test / testGrouping`):
  * the audit's extensions check stops the session and builds a fresh one
  * with `spark.sql.extensions`, which would tear down the SparkSession
  * every other suite shares.
  */
class PlanAuditSpec extends AnyFunSuite {
  test("all physical-plan checks pass at sf0.01") {
    val failed = PlanAudit.audit(Sessions.local(8), "/root/testdata/sf0.01")
    assert(failed == 0, s"$failed plan checks failed — see stdout for the audit table")
  }
}
