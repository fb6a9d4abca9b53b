ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kartothekspark"
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
// The container's default locale is POSIX (ASCII): the JVM then derives
// sun.jnu.encoding=ANSI_X3.4-1968 and java.nio REFUSES non-ASCII file
// paths outright (-Dsun.jnu.encoding is ignored — the VM reads the native
// locale before properties). Real clusters run UTF-8 locales, and
// multibyte partition values exercise exactly the URI-decode label path a
// resurrection bug once lived on — so forked test JVMs get a UTF-8 locale
// to make café/CJK labels testable (LabelEncodingSpec).
Test / envVars += ("LC_ALL" -> "C.UTF-8")
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
  // 48g default on the 128 GiB box: the one-JVM bench/verify suites run
  // 135 queries back-to-back and a 16g heap lands GC inside the timed
  // regions (observed ±50% total swing run-to-run); override with
  // SPARK_DRIVER_MEM where the host is smaller.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
