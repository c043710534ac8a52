ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqawkspark"
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

// Suite wall-clock (round 16, VERDICT r15 #1b): the sequential suite
// ran ~30 min and the driver's `sbt test` was killed on timeout in
// round 15 when a co-tenant stretched it. Three of 40 suites carry
// ~85% of the wall (differential fuzz ~14 min with sqlite3 present,
// StreamingSpec ~10 min of micro-batch machinery, CliSpec ~3 min) —
// so the suite now runs as THREE forked JVM groups in parallel:
// wall ≈ the largest group instead of the sum. Groups are separate
// JVMs with their own SparkSession, warehouse and derby dirs, so no
// session/registry/view state is shared (CliSpec's registry shadows
// and the streaming checkpoints stay isolated by construction).
val testGroupOf: String => Int = {
  case n if n.contains("StreamingSpec") => 0
  case n if n.contains("SqliteDifferentialFuzzSpec") ||
    n.contains("graft.cli.CliSpec") => 1
  case _ => 2
}
Test / testGrouping := {
  val base = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name))
    .toSeq.sortBy(_._1).map { case (g, ts) =>
      Tests.Group(s"group$g", ts, Tests.SubProcess(
        base.withRunJVMOptions(base.runJVMOptions ++ Vector(
          s"-Dspark.sql.warehouse.dir=/tmp/graft-test-wh-$g",
          s"-Dderby.system.home=/tmp/graft-test-derby-$g"))))
    }
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 3))
