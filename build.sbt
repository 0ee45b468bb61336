ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// PDFBox (public Apache jars, same version the reference vendors) for the
// real ToText/ToImage/ToHTML document transforms. commons-logging API is
// provided by Spark's jcl-over-slf4j.
Compile / unmanagedJars ++= (file("lib") * "*.jar").classpath
Runtime / unmanagedJars ++= (file("lib") * "*.jar").classpath
Test / unmanagedJars ++= (file("lib") * "*.jar").classpath
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
// Forward engine/SQL confs given to sbt (`sbt -Dspark.graft.x=y ...`) into
// the forked run JVM — SparkConf picks up `spark.*` system properties, so
// conf-gated paths (hot-bucket guard, LSH semdedup, ...) can be
// benchmarked without code changes.
run / javaOptions ++= sys.props.toSeq.collect {
  case (k, v) if k.startsWith("spark.graft.") || k.startsWith("spark.sql.") =>
    s"-D$k=$v"
}
