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
  * file still scans in parallel; files under 1000 rows or 1 MB get ONE
  * partition. The format is a single JSON array, so a slice cannot seek —
  * but the parsed tree is held in a per-JVM soft-reference cache keyed by
  * (path, length, mtime), so the file parses ONCE per JVM no matter how
  * many slices, readers, or planning passes touch it (schema inference,
  * partition planning, and every PartitionReader share the tree;
  * TableJsonSourceSpec pins the parse count). Soft references let the
  * JVM reclaim the tree under memory pressure rather than pinning it.
  * The files the reference ships are small; at real scale this format
  * would be converted to parquet at ingest — this source exists so
  * reference datasets are first-class relations.
  */
class TableJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tablejson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableJsonIO.schemaOf(TableJsonIO.cached(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TableJsonTable(properties.get("path"), schema)
}

private[sources] object TableJsonIO {
  private val mapper = new ObjectMapper()

  /** Number of ACTUAL file parses (cache misses) in this JVM — spec
    * instrumentation for the parse-once contract. */
  val parseCount = new java.util.concurrent.atomic.AtomicLong

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String,
    (Long, Long, java.lang.ref.SoftReference[
      com.fasterxml.jackson.databind.JsonNode])]

  private def parse(path: String): com.fasterxml.jackson.databind.JsonNode = {
    require(path != null, "tablejson requires a path")
    parseCount.incrementAndGet()
    mapper.readTree(new java.io.File(path))
  }

  /** Parse-once-per-JVM: returns the cached tree while the file's
    * (length, mtime) is unchanged and the soft reference is live. */
  def cached(path: String): com.fasterxml.jackson.databind.JsonNode = {
    require(path != null, "tablejson requires a path")
    val f = new java.io.File(path)
    val len = f.length(); val mt = f.lastModified()
    val cur = cache.get(path)
    if (cur != null && cur._1 == len && cur._2 == mt) {
      val v = cur._3.get()
      if (v != null) return v
    }
    val parsed = parse(path)
    cache.put(path, (len, mt,
      new java.lang.ref.SoftReference(parsed)))
    parsed
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
    val root = TableJsonIO.cached(path)
    val nRows = root.size - 1
    val maxSlices = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    // single partition for small files: below 1 MB the scan is cheaper
    // than the per-task overhead, and on a multi-executor cluster one
    // slice means at most one executor ever parses the file
    val small = new java.io.File(path).length() < (1 << 20)
    val slices =
      if (small) 1 else math.max(1, math.min(maxSlices, nRows / 1000))
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
      // per-JVM cached tree: the file parses once no matter how many
      // slices or readers touch it
      private val root = TableJsonIO.cached(part.path)
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
