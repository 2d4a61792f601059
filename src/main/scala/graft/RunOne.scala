package graft

/** Dev harness: time individual SparkEntry queries without paying for a
  * full Bench sweep. Usage:
  *   runMain graft.RunOne <sfDir> <queryName> [queryName...]
  * Prints one line per query: name, rows, cold seconds, warm seconds. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-runone", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def pass(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Dedup.releaseAll(spark)
        (n, dt)
      }
      val (rows, cold) = pass()
      val (_, warm) = pass()
      println(f"[runone] $name rows=$rows cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
