// scratch timing main (not part of the library)
package graft
import org.apache.spark.sql.SparkSession
/** Times named queries 3× in one JVM against $SPARK_GRAFT_SF_DIR.
  * Round 11: session built through [[GraftSession]] (same config
  * posture as the bench — AQE, graft extensions, runtime bloom, join
  * prefs); `spark.*` system properties override for A/B runs. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = GraftSession.builder("graft-timeq", cpus.toInt)
      .config("spark.ui.enabled", "false")
    sys.props.toSeq.filter(_._1.startsWith("spark."))
      .foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.quietCheckpointNoise()
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      graft.operators.Dedup.releaseAll(spark)
      println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
