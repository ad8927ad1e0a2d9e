ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "extractspark"
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
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local mode = one JVM: heap must feed all executor threads. 16g fixed:
  // 8g GC-thrashes under 32 string-heavy extraction threads, while huge
  // heaps (48g) page-fault-storm (sys-time blowup) as G1 grows the heap.
  s"-Xms$driverMem",
  s"-Xmx$driverMem",
)
// ParallelGC: G1's concurrent phases generated pathological kernel time
// (30+ min sys per bench run) on this VM; the throughput collector is both
// faster and stable for this batch workload.
javaOptions += "-XX:+UseParallelGC"
// Large eden: the extraction hot path is allocation-heavy with short-lived
// garbage; a big young gen cuts collection frequency (survivor copy cost is
// what matters, and survivors are few). NewRatio can't express eden > 50% of
// heap, so derive -Xmn as 3/4 of the RESOLVED heap — a fixed 12g under an
// 8g SPARK_DRIVER_MEM override would clamp the tenured gen to ~nothing and
// OOM spuriously.
javaOptions ++= {
  val m = "^([0-9]+)([gGmM])$".r
  driverMem match {
    // only scale when the heap is big enough that 3/4-young still leaves a
    // meaningful tenured gen (>= 1 unit AND >= 1/4 of the heap); heaps
    // under 4 units fall through to JVM ergonomics
    case m(n, u) if n.toLong >= 4 => Seq(s"-Xmn${n.toLong * 3 / 4}$u")
    case m(_, _)                  => Seq.empty
    case _                        => Seq("-Xmn12g") // unrecognized override: 16g default's value
  }
}
