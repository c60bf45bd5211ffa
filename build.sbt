ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "caseguarddatapipelinespark"
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
// Pass the forked program's stdout straight through instead of routing it
// via sbt's logger: the logger prefixes every line with "[info] ", which
// breaks line-oriented JSON parsing of Bench's metric output.
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
  // Host qualification (round 19, BASELINE.md "Shuffle-write mmap
  // pathology"): on this kernel (6.18.5-fc-v20) mmap/munmap are slow and
  // serialize on the process mmap lock. BypassMergeSortShuffleWriter's
  // per-partition temp-file merge goes through FileChannel.transferTo,
  // which maps+unmaps every segment — jstack sampling showed executor
  // workers pinned in FileChannelImpl.map0/unmap0 during shuffle writes
  // (~0.5-4 s of write time per small exchange; 8 cores beat 32 on
  // shuffle-heavy queries because of the lock). transferTo=false streams
  // the copy instead of mapping it; local.dir on tmpfs takes the disk
  // out of the (tiny, re-created-per-exchange) shuffle files. At cluster
  // scale both are deployment-neutral: reduce partition counts there are
  // >> the bypass threshold so the merge path differs anyway, and fast
  // local shuffle storage is the standing provisioning assumption
  // (optimization guide §9). Measured: full registry 297.8 -> 257.1 s at
  // sf0.1 with no query slower by > 0.26 s.
  "-Dspark.file.transferTo=false",
  "-Dspark.local.dir=/dev/shm/spark-scratch",
)
