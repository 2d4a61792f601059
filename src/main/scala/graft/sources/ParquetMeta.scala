package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet ROW-GROUP introspection — the data-layout health readout.
  *
  * Row groups are the pruning and parallelism unit of every parquet
  * scan: a table whose groups are tiny scans slowly (footer/seek
  * overhead per group), one whose groups are huge defeats min/max
  * skipping and memory sizing. This operator surfaces per-group row
  * counts, chunk counts, and compressed/uncompressed byte totals
  * straight from the footers.
  *
  * Scale: the FILE LIST is parallelized — each executor task opens only
  * footers (a few KB each, never data pages), so auditing a 100 TB
  * table costs one metadata read per file fanned out over the cluster,
  * not a data scan. The driver only holds the path list (and on a real
  * lake that list would itself come from the catalog/manifest).
  */
object ParquetMeta {

  /** One row per (file, row group): rows, column-chunk count, compressed
    * and uncompressed byte totals. The SESSION's Hadoop configuration
    * ships to the tasks (a blank executor-side Configuration would miss
    * object-store credentials/endpoints and custom filesystem schemes);
    * an empty path list returns an empty frame instead of tripping
    * repartition(0). */
  def rowGroups(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val bconf = spark.sparkContext.broadcast(hconf)
    spark.createDataset(paths)
      .repartition(math.max(1, math.min(paths.size, 32)))
      .mapPartitions { it =>
        it.flatMap { p =>
          val in = HadoopInputFile.fromPath(new Path(p), bconf.value.value)
          val reader = ParquetFileReader.open(in)
          try {
            val fileName = new Path(p).getName
            reader.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, i) =>
                (fileName, i.toLong, b.getRowCount,
                  b.getColumns.size.toLong,
                  b.getColumns.asScala.map(_.getTotalSize).sum,
                  b.getColumns.asScala.map(_.getTotalUncompressedSize).sum)
            }
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "n_rows", "n_chunks",
        "compressed_bytes", "uncompressed_bytes")
  }
}
