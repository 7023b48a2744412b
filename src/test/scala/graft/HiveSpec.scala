package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.catalogImplementation` is static per SparkContext, so the
  * Hive-catalog persistence check cannot run inside the shared test
  * session — fork HiveCatalogCheck in its own JVM (spark jars + the
  * compiled classes, same add-opens set as build.sbt) and assert its
  * sentinel. */
class HiveSpec extends AnyFunSuite {

  test("hive catalog: tables persist across a full session restart, " +
    "partitions listed and pruned (forked JVM)") {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", s"/opt/spark/jars/*:$classes",
      "graft.sources.HiveCatalogCheck", "/root/testdata/sf0.001")
    val out = new StringBuilder
    val rc = cmd ! ProcessLogger(l => out.append(l).append('\n'), _ => ())
    assert(rc == 0 && out.toString.contains("CHECK HIVE_CATALOG_OK"),
      s"forked check failed (rc=$rc):\n$out")
  }
}
