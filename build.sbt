ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "impressolanguageidentificationspark"
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
  // javax.imageio (PNG/JPEG decode in codec/Image) without a display
  "-Djava.awt.headless=true",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g matches scripts/run.sh: at ~1 GB/s allocation an 8g heap keeps
  // ParallelGC collecting instead of computing (the r1 driver bench ran
  // at 8g and measured 2x below the tuned envelope)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pin + pre-touch the heap: growing it lazily stalls 32 executor
  // threads on kernel page-fault locks during the first large job
  // (measured 7x slowdown; see BENCH/BASELINE.md)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // throughput collector: the pipeline allocates ~1 GB/s at full rate
  // and ParallelGC sustains ~15-20% more clips/s than G1 at 32 threads
  // (measured interleaved, BENCH/BASELINE.md)
  "-XX:+UseParallelGC",
)
