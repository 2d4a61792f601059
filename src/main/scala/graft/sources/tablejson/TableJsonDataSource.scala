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
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, NamedReference}
  private var required: StructType = full
  private var accepted: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var pushedAgg: Option[PushedAgg] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def colOf(e: V2Expr): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 =>
      Some(f.fieldNames.head)
    case _ => None
  }
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    // all .table.json columns are non-nullable, so count(col) == count(*)
    case c: Count => !c.isDistinct && colOf(c.column).isDefined
    case m: Min => colOf(m.column).isDefined
    case m: Max => colOf(m.column).isDefined
    case _ => false
  }

  /** COMPLETE aggregate pushdown for count/count(*)/min/max with
    * optional single-column grouping: the reader emits the final
    * aggregated rows (one partition — the group state is bounded by the
    * group cardinality, and these files are small by format contract),
    * after the pushed filters, so `SELECT max(id) FROM t WHERE …` never
    * materializes a single data row in Spark. The source's twin of
    * parquet's footer-stats aggregate pushdown, computed from the one
    * cached parse. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    limit < 0 &&
      agg.groupByExpressions.forall(e => colOf(e).isDefined) &&
      agg.aggregateExpressions.forall(supportedAgg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    val groups = agg.groupByExpressions.flatMap(e => colOf(e))
    val funcs: Array[(String, String)] = agg.aggregateExpressions.map {
      case _: CountStar => ("count", "*")
      case c: Count => ("count", colOf(c.column).get)
      case m: Min => ("min", colOf(m.column).get)
      case m: Max => ("max", colOf(m.column).get)
    }
    val fields = groups.map(g => full(full.fieldIndex(g))) ++
      funcs.map {
        case ("count", c) => StructField(s"count($c)", LongType, nullable = false)
        // nullable: a global min/max over zero surviving rows is NULL
        case (fn, c) =>
          StructField(s"$fn($c)", full(full.fieldIndex(c)).dataType,
            nullable = true)
      }
    pushedAgg = Some(PushedAgg(groups, funcs))
    required = StructType(fields)
    true
  }

  /** Simple comparisons on the two column types the format has are
    * evaluated INSIDE the reader (the source's own "index"): pushed
    * filters are removed from the residual, so the scan is the only
    * place they run — mirrors the reference's per-column value index
    * (database.py:929-953) without materializing one. */
  private def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: In => true
    // every .table.json column is non-nullable by format contract, so
    // IsNotNull is absorbed as always-true (removing it from the
    // residual saves Spark a per-row null check)
    case _: IsNotNull => true
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
    new TableJsonScan(path, full, required, accepted, limit, pushedAgg)
}

/** A complete pushed aggregation: group-by column names plus
  * (func, col) pairs where func ∈ {count, min, max} and col is "*" only
  * for count. */
private[tablejson] case class PushedAgg(groups: Array[String],
    funcs: Array[(String, String)])

private[tablejson] class TableJsonScan(path: String, full: StructType,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    limit: Int, agg: Option[PushedAgg]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TableJsonScan ${new java.io.File(path).getName} " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      s"PushedLimit: ${if (limit >= 0) limit else "none"}" +
      agg.map(a => s", PushedAggregation: [${a.funcs.map {
        case (f, c) => s"$f($c)" }.mkString(", ")}]" +
        (if (a.groups.nonEmpty)
          s", PushedGroupBy: [${a.groups.mkString(", ")}]" else ""))
        .getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val root = TableJsonIO.cached(path)
    val nRows = root.size - 1
    val maxSlices = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    // single partition for small files: below 1 MB the scan is cheaper
    // than the per-task overhead, and on a multi-executor cluster one
    // slice means at most one executor ever parses the file. A pushed
    // limit forces one partition (see pushLimit); a COMPLETE pushed
    // aggregation must also see every row, so it runs as one partition.
    val small = limit >= 0 || agg.isDefined ||
      new java.io.File(path).length() < (1 << 20)
    val slices =
      if (small) 1 else math.max(1, math.min(maxSlices, nRows / 1000))
    val step = math.max(1, (nRows + slices - 1) / slices)
    val parts = (1 to nRows by step).map(start =>
      TableJsonPartition(path, start, math.min(start + step, nRows + 1))
        .asInstanceOf[InputPartition]).toArray
    // a COMPLETE pushed aggregation over a ZERO-ROW file must still run
    // one reader: Spark does not re-aggregate after a complete pushdown,
    // so with no partitions `count(*)` would return no rows instead of
    // one row containing 0 — the reader synthesizes the empty-input row
    if (parts.isEmpty && agg.isDefined)
      Array(TableJsonPartition(path, 1, 1))
    else parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TableJsonReaderFactory(full, required, filters, limit, agg)
}

private[tablejson] case class TableJsonPartition(path: String, start: Int,
    end: Int) extends InputPartition

private[tablejson] class TableJsonReaderFactory(full: StructType,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    limit: Int, agg: Option[PushedAgg]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.sources._
    val part = p.asInstanceOf[TableJsonPartition]
    if (agg.isDefined)
      return new TableJsonAggReader(part, full, filters, agg.get)
    new PartitionReader[InternalRow] {
      // per-JVM cached tree: the file parses once no matter how many
      // slices or readers touch it
      private val root = TableJsonIO.cached(part.path)
      private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
      private var i = part.start
      private var emitted = 0
      private var row: InternalRow = _

      private def passes(arr: com.fasterxml.jackson.databind.JsonNode): Boolean =
        RowFilters.passes(arr, full, filters)

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

/** Pushed-filter evaluation over the raw JSON row: long compares for
  * int columns, codepoint (ASCII domain) compares for str. Shared by
  * the row reader and the aggregate reader so the two paths can never
  * disagree on what a filter admits. */
private[tablejson] object RowFilters {
  import org.apache.spark.sql.sources._
  private def cmp(arr: com.fasterxml.jackson.databind.JsonNode,
      full: StructType, colName: String, v: Any): Int = {
    val c = full.fieldIndex(colName)
    if (full.fields(c).dataType == LongType)
      java.lang.Long.compare(arr.get(c).asLong,
        v.asInstanceOf[Number].longValue)
    else arr.get(c).asText.compareTo(v.toString)
  }
  def passes(arr: com.fasterxml.jackson.databind.JsonNode,
      full: StructType, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo(a, v) => cmp(arr, full, a, v) == 0
      case GreaterThan(a, v) => cmp(arr, full, a, v) > 0
      case GreaterThanOrEqual(a, v) => cmp(arr, full, a, v) >= 0
      case LessThan(a, v) => cmp(arr, full, a, v) < 0
      case LessThanOrEqual(a, v) => cmp(arr, full, a, v) <= 0
      case In(a, vs) => vs.exists(v => cmp(arr, full, a, v) == 0)
      case IsNotNull(_) => true // format columns are non-nullable
      case _ => true
    }
}

/** Reader for a COMPLETE pushed aggregation: one pass over the (single)
  * partition's rows, pushed filters first, then count/min/max state per
  * group — state size is the group cardinality, never the row count.
  * Output rows are (group cols…, agg values…) in the pushed order. */
private[tablejson] class TableJsonAggReader(part: TableJsonPartition,
    full: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    agg: PushedAgg) extends PartitionReader[InternalRow] {
  private val root = TableJsonIO.cached(part.path)
  private val groupIdx = agg.groups.map(full.fieldIndex)

  private def value(arr: com.fasterxml.jackson.databind.JsonNode,
      c: Int): Any =
    if (full.fields(c).dataType == LongType) arr.get(c).asLong
    else arr.get(c).asText

  private val out: Iterator[InternalRow] = {
    // group key (as a Seq for equality) -> per-func state
    val state = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], Array[Any]]
    var i = part.start
    while (i < part.end) {
      val arr = root.get(i)
      i += 1
      if (RowFilters.passes(arr, full, filters)) {
        val key: Seq[Any] = groupIdx.map(value(arr, _)).toSeq
        val st = state.getOrElseUpdate(key,
          new Array[Any](agg.funcs.length))
        var j = 0
        while (j < agg.funcs.length) {
          st(j) = agg.funcs(j) match {
            case ("count", _) =>
              (if (st(j) == null) 0L else st(j).asInstanceOf[Long]) + 1L
            case (fn, c) =>
              val v = value(arr, full.fieldIndex(c))
              if (st(j) == null) v
              else {
                val sign = (v, st(j)) match {
                  case (a: Long, b: Long) => java.lang.Long.compare(a, b)
                  case (a, b) => a.toString.compareTo(b.toString)
                }
                if ((fn == "min") == (sign < 0)) v else st(j)
              }
          }
          j += 1
        }
      }
    }
    // a GLOBAL aggregation over zero surviving rows still yields one
    // row: count = 0, min/max = NULL (complete pushdown means Spark
    // will not re-aggregate, so SQL's empty-input semantics are ours)
    if (groupIdx.isEmpty && state.isEmpty)
      state(Seq.empty) = agg.funcs.map {
        case ("count", _) => 0L: Any
        case _ => null: Any
      }
    state.iterator.map { case (key, st) =>
      val vals = (key ++ st).map {
        case s: String => UTF8String.fromString(s)
        case other => other
      }.toArray[Any]
      new GenericInternalRow(vals): InternalRow
    }
  }

  private var row: InternalRow = _
  override def next(): Boolean =
    if (out.hasNext) { row = out.next(); true } else false
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
