ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "log2sqlspark"
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
  // pin the JVM default zone too: anything that parses wall-clock
  // fixtures outside a Spark session (java.sql.Timestamp paths) must
  // not depend on the host zone
  "-Duser.timezone=UTC",
  // 128 GiB box (TESTDATA.md env): 20g keeps the heavy candidate joins
  // and the 100k-event CDC render clear of GC pressure in one JVM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
) ++ (
  // Throughput collector for a batch-analytics JVM: G1's concurrent
  // cycles + region uncommit showed up INSIDE timed queries (r6 A/B:
  // ParallelGC wins the baseline suite by ~0.3-0.5 s across repeats,
  // both at local[8] and local[32]). Suppressed when SPARK_GRAFT_JVM
  // selects a GC itself — two selections don't override, they make
  // the JVM refuse to boot ("multiple garbage collectors selected").
  if (sys.env.get("SPARK_GRAFT_JVM").exists(_.contains("GC"))) Seq.empty
  else Seq("-XX:+UseParallelGC")
) ++ (
  // A fixed young gen stops nursery resize churn between
  // allocation-heavy and quiet queries — but only at the default 20g
  // heap UNDER ParallelGC: a custom heap must size its own young gen
  // (-Xmn10g under -Xmx8g wouldn't even boot), and a GC-selection
  // override (e.g. SPARK_GRAFT_JVM="-XX:+UseG1GC" for the documented
  // G1-vs-ParallelGC A/B) must not inherit a pinned nursery — -Xmn
  // disables G1's adaptive young-gen sizing, so the run would not be
  // stock G1 and the A/B would be skewed. Suppress the fixed nursery
  // whenever SPARK_DRIVER_MEM or any heap/GC flag appears in
  // SPARK_GRAFT_JVM (appended last, so it wins).
  if (sys.env.contains("SPARK_DRIVER_MEM") ||
      sys.env.get("SPARK_GRAFT_JVM").exists(j =>
        j.contains("-Xmx") || j.contains("-Xmn") || j.contains("GC"))) Seq.empty
  else Seq("-Xmn10g")
) ++ sys.env.get("SPARK_GRAFT_JVM").toSeq.flatMap(_.split(' ')).filter(_.nonEmpty)
