ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pgwarehousespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DuckDB JDBC driver on the TEST classpath only, taken straight from the
// pre-warmed local cache when present (no new libraryDependencies — the
// main engine is written against plain java.sql and never links the
// driver; DuckDbSyncE2ESpec self-cancels when the jar is absent). This
// lets the warehouse-backend e2e suite exercise a real engine instead of
// Derby while leaving the production classpath untouched.
Test / unmanagedJars ++= {
  // prefer a repo-local (gitignored) copy so classpath strings stay
  // machine-layout-free; fall back to a glob over the local cache rather
  // than assuming any mirror's directory layout
  val local = (baseDirectory.value / "lib-test" ** "duckdb_jdbc-*.jar").get
  val cacheRoot = file(sys.props("user.home")) / ".cache" / "coursier"
  (if (local.nonEmpty) local else (cacheRoot ** "duckdb_jdbc-*.jar").get)
    .headOption.map(Attributed.blank).toSeq
}
Test / fork := true
run / fork := true
// Forked run inherits stdout directly (no "[info] " log prefix) so the
// bench/verify JSON lines stay machine-parseable.
run / outputStrategy := Some(StdoutOutput)
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
