package graft.athenaeum

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Directory containing the golden fixtures on the test classpath. */
  def goldenDir: String =
    new java.io.File(getClass.getResource("/golden/cities.table.json").toURI)
      .getParent

  def goldenText(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(goldenDir, name)), "UTF-8")

  /** splitmix64 — the shared deterministic fixture hash (one copy: a
    * typo'd constant in a per-spec clone would silently change that
    * spec's corpus with no compile error). */
  protected def mix64(x: Long): Long = {
    var z = x * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
