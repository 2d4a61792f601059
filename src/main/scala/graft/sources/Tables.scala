package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access to the driver-generated parquet test tables (TESTDATA.md).
  *
  * Mirrors the reference's table registry (`database.py:192-228`): one
  * logical table per name, loaded lazily. Unlike the reference (which
  * re-parses `.table.json` on every process start, `database.py:905-996`),
  * Spark's parquet scan gives us column pruning + predicate pushdown at the
  * source, so no load-time indexing is needed — the scan IS the index path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory.
    *
    * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark 4 rejects
    * by default (PARQUET_TYPE_ILLEGAL); `nanosAsLong` surfaces it as
    * BIGINT epoch-nanos, which the window operators consume directly
    * (integer bucket math — no timestamp semantics needed). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
