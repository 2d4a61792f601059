// scratch timing main (not part of the library)
package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      graft.operators.Dedup.releaseCaches()
      println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
