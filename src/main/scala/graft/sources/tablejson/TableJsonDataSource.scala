package graft.sources.tablejson

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSourceV2 for the reference's `.table.json` format (SURVEY §2.1 S1:
  * a single JSON array whose first element is a header of `[name,
  * "str"|"int"]` pairs, then positional row arrays —
  * `database.py:905-996`). Usable as
  * `spark.read.format("tablejson").load(path)`.
  *
  * Supports column pruning (SupportsPushDownRequiredColumns): a
  * projection reaches the reader, which then materializes only the
  * requested columns. Rows are split into at most
  * `spark.default.parallelism` slices of >=1000 rows so a single large
  * file still scans in parallel; files under 1000 rows get ONE partition
  * (the format is a single JSON array, so each slice must re-parse the
  * whole file — the row floor bounds that redundancy, and small files
  * parse exactly once). The files the reference ships are small; at real
  * scale this format would be converted to parquet at ingest — this
  * source exists so reference datasets are first-class relations.
  */
class TableJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tablejson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableJsonIO.schemaOf(TableJsonIO.parse(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TableJsonTable(properties.get("path"), schema)
}

private[tablejson] object TableJsonIO {
  private val mapper = new ObjectMapper()

  def parse(path: String): com.fasterxml.jackson.databind.JsonNode = {
    require(path != null, "tablejson requires a path")
    mapper.readTree(new java.io.File(path))
  }

  def schemaOf(root: com.fasterxml.jackson.databind.JsonNode): StructType = {
    val header = root.get(0)
    StructType(header.elements.asScala.map { cm =>
      val dt = cm.get(1).asText match {
        case "int" => LongType
        case "str" => StringType
        case other => throw new IllegalArgumentException(
          s"no column type: $other")
      }
      StructField(cm.get(0).asText, dt, nullable = false)
    }.toSeq)
  }
}

private[tablejson] class TableJsonTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = path
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TableJsonScanBuilder(path, tableSchema)
}

private[tablejson] class TableJsonScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TableJsonScan(path, full, required)
}

private[tablejson] class TableJsonScan(path: String, full: StructType,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val root = TableJsonIO.parse(path)
    val nRows = root.size - 1
    val maxSlices = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    val slices = math.max(1, math.min(maxSlices, nRows / 1000))
    val step = math.max(1, (nRows + slices - 1) / slices)
    (1 to nRows by step).map(start =>
      TableJsonPartition(path, start, math.min(start + step, nRows + 1))
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TableJsonReaderFactory(full, required)
}

private[tablejson] case class TableJsonPartition(path: String, start: Int,
    end: Int) extends InputPartition

private[tablejson] class TableJsonReaderFactory(full: StructType,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TableJsonPartition]
    new PartitionReader[InternalRow] {
      // executor-side parse of just this slice
      private val root = TableJsonIO.parse(part.path)
      private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
      private var i = part.start
      private var row: InternalRow = _
      override def next(): Boolean =
        if (i >= part.end) false
        else {
          val arr = root.get(i)
          val vals = new Array[Any](colIdx.length)
          var j = 0
          while (j < colIdx.length) {
            val c = colIdx(j)
            vals(j) =
              if (full.fields(c).dataType == LongType) arr.get(c).asLong
              else UTF8String.fromString(arr.get(c).asText)
            j += 1
          }
          row = new GenericInternalRow(vals)
          i += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
