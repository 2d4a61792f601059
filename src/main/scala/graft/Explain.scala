package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints `explain("formatted")` for every query (or
  * the ones named in args) against sf0.001. Used to keep plans honest:
  * filters pushed to the parquet scan, projections pruned, small sides
  * broadcast, whole-stage codegen spans wide. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n########## $name ##########")
      try SparkEntry.queries(name)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
