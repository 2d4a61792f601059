package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch sink helpers: the parquet layout conventions a 100 TB pipeline
  * needs — hive-style partition directories for partition pruning on
  * read, and DYNAMIC partition overwrite so an incremental job replaces
  * only the partitions it actually produced instead of truncating the
  * whole table (the default static mode deletes everything first).
  */
object GraftSink {

  /** Write `df` as parquet partitioned by `partitionCols` (hive layout,
    * `col=value/` directories). With mode "overwrite", only partitions
    * present in `df` are replaced — existing sibling partitions survive
    * (GraftSinkSpec pins this). Partition columns should be
    * low-cardinality: every distinct combination becomes a directory,
    * and a high-cardinality partition key degenerates into millions of
    * tiny files. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write `df` as parquet bucketed AND sorted by `bucketCols` into a
    * managed table — the co-located layout that lets equal-bucketed
    * tables join with NO exchange (see ScaleJoins.bucketedJoin). Bucket
    * metadata only exists in the catalog, hence saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String], mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
