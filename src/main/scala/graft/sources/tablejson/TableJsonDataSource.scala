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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var accepted: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Simple comparisons on the two column types the format has are
    * evaluated INSIDE the reader (the source's own "index"): pushed
    * filters are removed from the residual, so the scan is the only
    * place they run — mirrors the reference's per-column value index
    * (database.py:929-953) without materializing one. */
  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(supported)
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** Limit semantics are post-filter, so a pushed limit forces ONE
    * partition whose reader stops after emitting `limit` surviving
    * rows — correct regardless of how many raw rows the filters drop. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def build(): Scan =
    new TableJsonScan(path, full, required, accepted, limit)
}

private[tablejson] class TableJsonScan(path: String, full: StructType,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TableJsonScan ${new java.io.File(path).getName} " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      s"PushedLimit: ${if (limit >= 0) limit else "none"}"

  override def planInputPartitions(): Array[InputPartition] = {
    val root = TableJsonIO.cached(path)
    val nRows = root.size - 1
    val maxSlices = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    // single partition for small files: below 1 MB the scan is cheaper
    // than the per-task overhead, and on a multi-executor cluster one
    // slice means at most one executor ever parses the file. A pushed
    // limit also forces one partition (see pushLimit).
    val small = limit >= 0 || new java.io.File(path).length() < (1 << 20)
    val slices =
      if (small) 1 else math.max(1, math.min(maxSlices, nRows / 1000))
    val step = math.max(1, (nRows + slices - 1) / slices)
    (1 to nRows by step).map(start =>
      TableJsonPartition(path, start, math.min(start + step, nRows + 1))
        .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TableJsonReaderFactory(full, required, filters, limit)
}

private[tablejson] case class TableJsonPartition(path: String, start: Int,
    end: Int) extends InputPartition

private[tablejson] class TableJsonReaderFactory(full: StructType,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    limit: Int) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.sources._
    val part = p.asInstanceOf[TableJsonPartition]
    new PartitionReader[InternalRow] {
      // per-JVM cached tree: the file parses once no matter how many
      // slices or readers touch it
      private val root = TableJsonIO.cached(part.path)
      private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
      private var i = part.start
      private var emitted = 0
      private var row: InternalRow = _

      // pushed-filter evaluation over the raw JSON row: long compares
      // for int columns, codepoint (ASCII domain) compares for str
      private def cmp(arr: com.fasterxml.jackson.databind.JsonNode,
          colName: String, v: Any): Int = {
        val c = full.fieldIndex(colName)
        if (full.fields(c).dataType == LongType)
          java.lang.Long.compare(arr.get(c).asLong,
            v.asInstanceOf[Number].longValue)
        else arr.get(c).asText.compareTo(v.toString)
      }
      private def passes(arr: com.fasterxml.jackson.databind.JsonNode): Boolean =
        filters.forall {
          case EqualTo(a, v) => cmp(arr, a, v) == 0
          case GreaterThan(a, v) => cmp(arr, a, v) > 0
          case GreaterThanOrEqual(a, v) => cmp(arr, a, v) >= 0
          case LessThan(a, v) => cmp(arr, a, v) < 0
          case LessThanOrEqual(a, v) => cmp(arr, a, v) <= 0
          case _ => true
        }

      override def next(): Boolean = {
        if (limit >= 0 && emitted >= limit) return false
        while (i < part.end) {
          val arr = root.get(i)
          i += 1
          if (passes(arr)) {
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
            emitted += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
