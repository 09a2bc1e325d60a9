ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "solardatatoolsspark"
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
// Test wall-clock (round 14): one forked JVM ran all 64 suites
// SEQUENTIALLY (1169 s — the driver's test gate timed out on it,
// VERIFY_r13 tests_ok:false with no failing suite in the tail). Suites
// are split by greedy duration-weighted bin-packing into independent
// forked JVMs run 4 at a time: full isolation (no shared-SparkSession
// conf cross-talk), measured 525 s wall for the same 617 tests.
// 4 JVMs x 8g heap fits the 128 GiB sandbox with the bench headroom.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jvmOpts = (Test / javaOptions).value.toVector
  val envs = (Test / envVars).value
  val cwd = baseDirectory.value
  val nGroups = 8
  // measured under-parallel wall seconds (round-14 -oD durations from
  // the 4-way grouped run — the regime the packing actually runs in;
  // the earlier SEQUENTIAL profile mis-weighted SunriseSunsetSpec at
  // 282 s, which the quantileFourierFit convergence early-exit cut to
  // ~20 s). Unlisted suites default small. Greedy longest-first
  // bin-packing so no group stacks two heavy suites.
  val weights = Map(
    "graft.DocStreamSpec" -> 190, "graft.StreamingSpec" -> 154,
    "graft.PlanSpec" -> 101, "graft.WinnowSpec" -> 68,
    "graft.MixingSpec" -> 60, "graft.PercentilesSpec" -> 50,
    "graft.GoldenPipelineSpec" -> 33, "graft.PqSpec" -> 29,
    "graft.GoldenClippingSpec" -> 29, "graft.ShadeSpec" -> 25,
    "graft.QueriesSpec" -> 25, "graft.PlotTablesSpec" -> 25,
    "graft.StudySpec" -> 25, "graft.GroundTruthSpec" -> 25,
    "graft.SunriseSunsetSpec" -> 20, "graft.OperatorSpec" -> 20
  ).withDefaultValue(10)
  val bins = Array.fill(nGroups)(0L)
  val assigned = Array.fill(nGroups)(Vector.empty[TestDefinition])
  tests.sortBy(t => (-weights(t.name), t.name)).foreach { t =>
    val g = bins.indices.minBy(bins(_))
    bins(g) += weights(t.name)
    assigned(g) = assigned(g) :+ t
  }
  assigned.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, g) =>
    Tests.Group(
      s"group$g",
      ts,
      Tests.SubProcess(
        ForkOptions()
          .withRunJVMOptions(jvmOpts)
          .withEnvVars(envs)
          .withWorkingDirectory(Option(cwd))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  Tags.limit(Tags.ForkedTestGroup, 4)
)
// per-test durations in the report: the next "tests_ok: false with no
// failing suite" diagnosis should not need timestamp archaeology
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
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
  // NOTE: a 24g heap was measured and did NOT reduce the bench's
  // run-to-run variance (JIT/page-cache noise, not GC pressure) — 8g
  // is sufficient for local[32] at sf0.1
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 137-query suite generates thousands of codegen classes; the JVM
  // default 240m code cache fills mid-suite and C2 stops compiling,
  // which read as a 6x in-suite inflation of the pure-Scala solver
  // stage (p01 29.8s in-suite vs 4.5s isolated, round 6). Headroom so
  // late-suite queries still get compiled code.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
