ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "configdrivendatapipelinespark"
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
// Clamp the requested heap to 32g: measured on one idle box, the full
// bench ran 192.9 s at -Xmx32g vs 339.4 s at -Xmx96g on identical
// code+data (G1 pause cost scales with heap; peak live set is ~12g).
// Bench.scala carries its own re-exec guard for launch paths that skip
// sbt; this keeps the sbt path from ever needing it.
val driverMem: String = {
  val raw = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  def int(s: String) = scala.util.Try(s.toInt).toOption
  val gb = raw.toLowerCase match {
    case s if s.endsWith("g") => int(s.dropRight(1))
    case s if s.endsWith("m") => int(s.dropRight(1)).map(_ / 1024)
    case _                    => None
  }
  if (gb.exists(_ > 32)) "32g" else raw
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // this container's POSIX locale makes the JVM default charset US-ASCII
  // (file.encoding=ANSI_X3.4-1968), and Spark's VARIANT string path
  // decodes through the default charset — non-ASCII JSON values come
  // back as mojibake. Real clusters run UTF-8 locales; pin it here so
  // local behavior matches production.
  "-Dfile.encoding=UTF-8",
  s"-Xmx$driverMem",
)
