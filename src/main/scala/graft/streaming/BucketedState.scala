package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate state BUCKETED BY ITS JOIN KEY AT REST — the storage layout
  * that makes a streaming gate's per-batch state join exchange only
  * the increment. A [[graft.sources.VersionedTable]] state table is
  * plain parquet: every batch's `state ⋈ increment` re-shuffles the
  * ENTIRE accumulated state through the exchange (the round-7 30×
  * probe measured 1.45 → 8.2 → 13.7 GB across three equal increments
  * — a per-batch full-state exchange, the one pattern that cannot
  * survive 100 TB of accumulated state). Here the state is an
  * EXTERNAL CATALOG TABLE, `CLUSTERED BY (key) INTO n BUCKETS` and
  * `PARTITIONED BY (__bt)` (the committing batch id):
  *
  *  - the state-side scan reports `HashPartitioning(key, n)`, so the
  *    join plans with NO exchange and NO sort on the state side (pair
  *    it with a `shuffle_hash` hint on the increment side — the
  *    increment is the build side, the state streams);
  *  - replay pinning is PARTITION PRUNING, not version math: the
  *    state as it stood before batch b is exactly `__bt < b`, on a
  *    fresh run and on a crash-replay alike (the batch's own partial
  *    or committed append always lands in `__bt = b`);
  *  - idempotence is a marker file per batch id, created only after
  *    the append commits; a crashed append leaves an UNREGISTERED
  *    partial partition directory that readers never list (catalog
  *    partitions are the read index) and the replay deletes before
  *    re-appending.
  *
  * Catalog loss (a new driver/JVM over existing state) is recovered
  * from a schema sidecar written on first append: re-register with
  * `CREATE TABLE ... LOCATION` + `MSCK REPAIR TABLE`. The bucket
  * count is a layout constant of the table (like any bucketed
  * warehouse table): size it for the target cluster's join
  * parallelism, not the increment. */
object BucketedState {

  /** Catalog name for the state table at `path` — content-addressed so
    * concurrent gates at different paths never collide. */
  def tableName(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    "graft_state_" + md.map("%02x".format(_)).mkString.take(16)
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // the catalog table's LOCATION is path/data — saveAsTable's CREATE
  // path truncates the location directory, so markers and the schema
  // sidecar must live OUTSIDE it
  private def dataDir(path: String) = new Path(path, "data")

  private def markersRoot(path: String) = new Path(path, "_markers")

  private def markerPath(path: String, batchId: Long) =
    new Path(markersRoot(path), s"bt-$batchId")

  private def schemaPath(path: String) =
    new Path(markersRoot(path), "_schema.txt")

  /** Batch ids whose appends committed (marker files). */
  def committedBatches(spark: SparkSession, path: String): Set[Long] = {
    val f = fs(spark, path)
    val dir = markersRoot(path)
    if (!f.exists(dir)) Set.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("bt-") =>
        n.stripPrefix("bt-").toLong }
      .toSet
  }

  /** Sidecar: "nBuckets\tbucketCol\nschemaDDL" — what catalog recovery
    * needs to re-register the table without reading any data. */
  private def writeSchemaSidecar(spark: SparkSession, path: String,
      ddl: String, bucketCol: String, nBuckets: Int): Unit = {
    val f = fs(spark, path)
    val p = schemaPath(path)
    if (!f.exists(p)) {
      val out = f.create(p, true)
      try out.write(s"$nBuckets\t$bucketCol\n$ddl"
        .getBytes("UTF-8")) finally out.close()
    }
  }

  /** Re-register the external table from the sidecar after catalog
    * loss: CREATE TABLE with the recorded schema/bucketing at the
    * state location, then recover the partition index. */
  private def reRegister(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = schemaPath(path)
    require(f.exists(p), s"bucketed state at $path has no schema sidecar")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val Array(head, ddl) = text.split("\n", 2)
    val Array(n, bucketCol) = head.split("\t", 2)
    val name = tableName(path)
    spark.sql(s"""CREATE TABLE $name ($ddl, __bt BIGINT)
      USING parquet
      PARTITIONED BY (__bt)
      CLUSTERED BY (`$bucketCol`) SORTED BY (`$bucketCol`) INTO $n BUCKETS
      LOCATION '${dataDir(path)}'""")
    spark.sql(s"MSCK REPAIR TABLE $name")
    ()
  }

  /** True when the catalog table is live for this state (registering
    * it from the sidecar if a previous session created the state). A
    * FRESH state path (no markers yet) drops any stale registration
    * left by an earlier fixture at the same path. */
  private def ensureRegistered(spark: SparkSession, path: String)
      : Boolean = {
    val name = tableName(path)
    val f = fs(spark, path)
    // no sidecar ⇒ no marker can exist either (the sidecar lands
    // before the first append, markers only after one) ⇒ the state is
    // logically empty even if a crashed first append left debris
    if (!f.exists(markersRoot(path)) || !f.exists(schemaPath(path))) {
      // fresh state: a same-path table from a deleted fixture would
      // otherwise read stale catalog partitions over missing files.
      // tableExists first — a catalog lookup — so the common fresh case
      // pays no DDL round-trip at all
      if (spark.catalog.tableExists(name))
        spark.sql(s"DROP TABLE $name")
      false
    } else {
      if (!spark.catalog.tableExists(name)) reRegister(spark, path)
      true
    }
  }

  /** Append `df` as batch `batchId`'s increment, exactly once: a
    * committed batch id (marker present) is a no-op; a crashed
    * previous attempt's partial partition directory is deleted before
    * the re-append. The increment is repartitioned onto the bucket
    * function (murmur3 pmod — `repartition(n, col)` and the bucketed
    * writer agree on it), so each task holds exactly one bucket and
    * the batch adds ONE file per non-empty bucket; this increment-
    * sized exchange plus the join's increment-side exchange is the
    * batch's whole shuffle bill, state never moves. */
  /** `prePartitioned = true`: the caller already holds `df` exchanged
    * as `repartition(nBuckets, bucketCol)` (e.g. a persisted increment
    * whose partitioning the batch's join also reuses) — skip the
    * writer-side exchange instead of paying it twice. */
  def appendOnce(df: DataFrame, path: String, batchId: Long,
      bucketCol: String, nBuckets: Int,
      prePartitioned: Boolean = false): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    if (committedBatches(spark, path).contains(batchId)) return
    val live = ensureRegistered(spark, path)
    val name = tableName(path)
    // crashed attempt: its files are unregistered (invisible) but a
    // re-append into the same directory would double them. The catalog
    // partition can only exist if the directory did (a committed
    // append), so the DDL round-trip is gated on the same check
    val partDir = new Path(dataDir(path), s"__bt=$batchId")
    if (f.exists(partDir)) {
      f.delete(partDir, true)
      if (live) spark.sql(
        s"ALTER TABLE $name DROP IF EXISTS PARTITION (__bt=$batchId)")
    }
    f.mkdirs(markersRoot(path))
    writeSchemaSidecar(spark, path, df.schema.toDDL, bucketCol, nBuckets)
    val aligned =
      if (prePartitioned) df
      else df.repartition(nBuckets, col(bucketCol))
    aligned.withColumn("__bt", lit(batchId))
      .write.mode("append").format("parquet")
      .partitionBy("__bt")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", dataDir(path).toString)
      .saveAsTable(name)
    // (no refreshTable: the insert path invalidates the cached relation
    // itself; SubstrGateSpec/SemGateSpec read-after-append would catch
    // a stale listing)
    // marker LAST: the append is the work, the marker is the commit
    f.create(markerPath(path, batchId), true).close()
  }

  /** The state as it stood BEFORE batch `batchId` — one partition-
    * pruned bucketed scan (`__bt < batchId`), correct on fresh runs
    * and crash-replays alike. None until a first batch has committed
    * (same contract as [[GateKit.readPinnedBefore]]). */
  def readBefore(spark: SparkSession, path: String,
      batchId: Long): Option[DataFrame] =
    if (!ensureRegistered(spark, path)) None
    else Some(spark.table(tableName(path))
      .filter(col("__bt") < batchId).drop("__bt"))
}
