ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gqlitespark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON; sbt's default LoggedOutput prefixes forked stdout with "[info] ",
// which broke the parse two rounds running. StdoutOutput inherits the raw
// stdout/stderr of the sbt process instead.
Compile / run / outputStrategy := Some(StdoutOutput)
// The interactive shell (graft.Shell) reads stdin from the forked JVM.
connectInput := true
// sun.jnu.encoding (filesystem path charset) follows the process locale on
// Linux; the container default is POSIX, which breaks unicode group-name
// directories in the graph catalog. Force a UTF-8 locale for forked JVMs.
Test / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
run / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
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
  // unicode group names (the reference suites use CJK) become directory
  // names in the graph catalog — the container's POSIX default charset
  // would make those writes fail with "Malformed input"
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Optional scratch-root override for forked JVMs (A/B-ing catalog tmp dirs
// against a tmpfs; e.g. SPARK_GRAFT_TMPDIR=/dev/shm).
javaOptions ++= sys.env.get("SPARK_GRAFT_TMPDIR")
  .map(d => s"-Djava.io.tmpdir=$d").toSeq
