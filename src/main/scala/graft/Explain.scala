package graft

/** Plan-audit utility: prints `explain("formatted")` for every query (or
  * the ones named in args) against sf0.001. Used to keep plans honest:
  * filters pushed to the parquet scan, projections pruned, small sides
  * broadcast, whole-stage codegen spans wide.
  *
  * Round 11: builds its session through [[GraftSession]] so the printed
  * plans carry the SAME config posture the bench and verify runs use
  * (before, a bare session here hid config-driven plan differences —
  * e.g. the shuffled-hash join preference). Any `spark.*` system
  * property is applied AFTER the GraftSession defaults, so a
  * `-Dspark.sql.join.preferSortMergeJoin=true` run reproduces a
  * pre-round plan for diffing. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val b = GraftSession.builder("graft-explain", 4)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    sys.props.toSeq.filter(_._1.startsWith("spark."))
      .foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
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
