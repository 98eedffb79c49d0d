ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "asyncpipesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// RetryExactlyOnceSpec needs its own SparkContext with task retries on
// (master local[4,2]); a JVM holds one context, so it gets its own forked
// JVM while every other suite shares one (and one local[8] session).
// PlanAuditSpec likewise: the audit's extensions check stops the session
// and rebuilds one with spark.sql.extensions set.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val forkOpts = ForkOptions().withRunJVMOptions(opts)
  val all = (Test / definedTests).value
  val retry = all.filter(_.name.endsWith("RetryExactlyOnceSpec"))
  val audit = all.filter(_.name.endsWith("PlanAuditSpec"))
  // Own JVM: must create the FIRST SparkContext with static memory/spill
  // configs, and stops it mid-test.
  val spill = all.filter(_.name.endsWith("SpillSpec"))
  val rest = all.filterNot(t =>
    retry.contains(t) || audit.contains(t) || spill.contains(t))
  Seq(Tests.Group("retry", retry, Tests.SubProcess(forkOpts)),
    Tests.Group("planaudit", audit, Tests.SubProcess(forkOpts)),
    Tests.Group("spill", spill, Tests.SubProcess(forkOpts)),
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)))
    .filter(_.tests.nonEmpty)
}
