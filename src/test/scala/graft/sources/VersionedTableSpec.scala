package graft.sources

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.functions._

/** Versioned-snapshot tables: atomic commits, time travel, cheap
  * append/rollback, orphan detection. */
class VersionedTableSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshPath() = java.nio.file.Files
    .createTempDirectory("graft-vt").toString + "/t"

  test("commit / time travel: each version reads back exactly, later commits invisible") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    val v1 = VersionedTable.commit(nat.filter(col("n_regionkey") === 0), path)
    val v2 = VersionedTable.commit(nat, path) // overwrite
    assert(v1 == 1 && v2 == 2)
    val r1 = VersionedTable.read(spark, path, Some(1))
    val r2 = VersionedTable.read(spark, path, Some(2))
    val exp1 = nat.filter(col("n_regionkey") === 0).count()
    assert(r1.count() == exp1 && r2.count() == nat.count())
    // latest by default
    assert(VersionedTable.read(spark, path).count() == nat.count())
    // manifest row counts match without data I/O
    assert(VersionedTable.rowCount(spark, path, 1) == exp1)
    assert(VersionedTable.rowCount(spark, path, 2) == nat.count())
    // history readout: one row per version, counts from manifests only
    val h = VersionedTable.history(spark, path)
      .orderBy("version").collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(h.map(_.getLong(1)).toSeq == Seq(exp1, nat.count()))
    assert(h.forall(r => r.getInt(2) > 0 && r.isNullAt(3)))
  }

  test("append re-lists old files instead of rewriting; rollback restores by manifest") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    val a = nat.filter(col("n_nationkey") < 10)
    val b = nat.filter(col("n_nationkey") >= 10)
    VersionedTable.commit(a, path)
    val filesAfterV1 = dataFiles(path)
    val v2 = VersionedTable.commit(b, path, mode = "append")
    assert(v2 == 2)
    // v1's physical files survive untouched (append wrote only b)
    assert(dataFiles(path).intersect(filesAfterV1) == filesAfterV1)
    assert(VersionedTable.read(spark, path, Some(2)).count() == nat.count())
    // a bad overwrite lands as v3; rollback to v2 commits v4 == v2
    VersionedTable.commit(a.limit(1), path)
    val v4 = VersionedTable.rollback(spark, path, 2)
    assert(v4 == 4)
    val r4 = VersionedTable.read(spark, path, Some(4))
      .select("n_nationkey").orderBy("n_nationkey")
      .collect().map(_.get(0).toString).toSeq
    val r2 = VersionedTable.read(spark, path, Some(2))
      .select("n_nationkey").orderBy("n_nationkey")
      .collect().map(_.get(0).toString).toSeq
    assert(r4 == r2)
    // history intact: the bad v3 is still auditable
    assert(VersionedTable.read(spark, path, Some(3)).count() == 1)
    assert(VersionedTable.versions(spark, path) == Seq(1, 2, 3, 4))
  }

  test("overwritten data dirs surface as orphan candidates; live ones never do") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat, path)
    VersionedTable.commit(nat.limit(3), path) // overwrite: v1's dir now unreferenced by v2
    val keepLatestOnly = VersionedTable.orphanDataDirs(spark, path, Seq(2))
    assert(keepLatestOnly.size == 1, s"expected one orphan, got $keepLatestOnly")
    // keeping full history references everything
    assert(VersionedTable.orphanDataDirs(spark, path, Seq(1, 2)).isEmpty)
  }

  test("a dangling lock (crashed writer) is skipped, never reused, and does not block") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat.limit(2), path)
    // simulate a writer that claimed v2 and died before publishing
    val lock = new java.io.File(path, "_manifests/v00002.lock")
    assert(lock.createNewFile())
    val v = VersionedTable.commit(nat.limit(5), path)
    assert(v == 3, s"crashed claim must be skipped, got v$v")
    assert(VersionedTable.versions(spark, path) == Seq(1, 3))
    assert(VersionedTable.read(spark, path).count() == 5)
  }

  test("schema evolution: an appended column reads back with mergeSchema, old rows null") {
    import spark.implicits._
    val path = freshPath()
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    VersionedTable.commit(
      Seq((3L, "c", 0.5)).toDF("id", "v", "score"), path, mode = "append")
    val merged = VersionedTable.read(spark, path, mergeSchema = true)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(merged.count() == 3)
    assert(merged.filter("score IS NULL").count() == 2)
    // time travel predates the new column entirely
    assert(!VersionedTable.read(spark, path, Some(1)).columns.contains("score"))
  }

  test("compact: fewer files, identical rows, old versions untouched") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    // many tiny appends -> many small files
    (0 until 5).foreach { i =>
      VersionedTable.commit(
        nat.filter(col("n_nationkey") % 5 === i), path, mode = "append")
    }
    val filesBefore = dataFiles(path).size
    val v = VersionedTable.compact(spark, path, nFiles = 1)
    assert(v == 6)
    val manifest = VersionedTable.read(spark, path, Some(6))
    assert(manifest.inputFiles.length == 1,
      s"expected 1 compacted file, got ${manifest.inputFiles.length}")
    assert(manifest.count() == nat.count())
    // pre-compaction snapshot still reads its original layout
    assert(VersionedTable.read(spark, path, Some(5)).count() == nat.count())
    assert(dataFiles(path).size > filesBefore, "old files must survive for old readers")
  }

  test("racing committers: every commit lands, versions are distinct, appends lose no rows") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat.limit(0), path) // seed v1 (empty)
    val futures = (0 until 4).map { i =>
      Future(VersionedTable.commit(
        nat.filter(col("n_nationkey") % 4 === i), path, mode = "append"))
    }
    val got = Await.result(Future.sequence(futures), 120.seconds)
    assert(got.toSet.size == 4, s"duplicate version numbers: $got")
    assert(VersionedTable.versions(spark, path).size == 5)
    // no lost updates: appends wait for their true predecessor chain
    // (smaller-numbered locks) before basing, so the final version is
    // the union of every increment
    val finalV = got.max
    assert(VersionedTable.read(spark, path, Some(finalV)).count()
      == nat.count(), "concurrent appends lost rows")
    // and every intermediate version still contains its own increment
    (0 until 4).foreach { i =>
      val v = got(i)
      val rows = VersionedTable.read(spark, path, Some(v))
        .filter(col("n_nationkey") % 4 === i).count()
      assert(rows == nat.filter(col("n_nationkey") % 4 === i).count(),
        s"version $v lost its own increment")
    }
  }

  test("an abandoned claim's tombstone burns the number for stragglers") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat.limit(2), path)
    // simulate an optimistic-conflict abandonment of v2: the tombstone
    // exists, the lock does not — a straggler whose listing predated
    // the claim must NOT be able to publish as v2
    val dead = new java.io.File(path, "_manifests/v00002.dead")
    dead.getParentFile.mkdirs()
    assert(dead.createNewFile())
    val v = VersionedTable.commit(nat.limit(5), path)
    assert(v == 3, s"burned number must be skipped, got v$v")
    assert(VersionedTable.versions(spark, path) == Seq(1, 3))
    // and a racing straggler that re-creates the LOCK for the dead
    // number is caught by the post-claim guard on its next commit
    assert(VersionedTable.read(spark, path).count() == 5)
  }

  test("compact without explicit columns carries the base's stats and blooms") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    VersionedTable.commit(cust.repartition(3), path, "overwrite",
      statCols = Seq("c_custkey"), bloomCols = Seq("c_name"))
    val v = VersionedTable.compact(spark, path, nFiles = 1)
    val stats = VersionedTable.fileStats(spark, path, Some(v))
    assert(stats.size == 1 && stats.head.cols.contains("c_custkey"),
      "compact must re-stat the base's stat columns")
    val blooms = VersionedTable.fileBlooms(spark, path, Some(v))
    assert(blooms.size == 1 &&
      blooms.values.head.contains("c_name"),
      "compact must re-bloom the base's bloom columns")
    // pruning still works from the compacted head
    val name = cust.filter(col("c_custkey") === 7)
      .select("c_name").collect().head.getString(0)
    val (k, _) = VersionedTable.pruneFiles(spark, path,
      col("c_name") === name, Some(v))
    assert(k.size == 1)
  }

  test("compact racing appends: the table head never loses an increment (lost-update guard)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat.limit(0), path)
    // appends and compactions interleave freely; compact derives its
    // data from a base version, so without the read-validate-publish
    // check an append landing mid-compact would vanish from the head
    // (the compacted version publishes later and re-lists only the
    // stale base). The invariant below holds for EVERY interleaving.
    val appender = Future {
      (0 until 4).foreach { i =>
        VersionedTable.commit(
          nat.filter(col("n_nationkey") % 4 === i), path, mode = "append")
      }
    }
    val compactor = Future {
      (0 until 3).foreach { _ =>
        VersionedTable.compact(spark, path, nFiles = 1)
      }
    }
    Await.result(Future.sequence(Seq(appender, compactor)), 180.seconds)
    val got = VersionedTable.read(spark, path)
      .select("n_nationkey").orderBy("n_nationkey")
      .collect().map(_.get(0).toString).toSeq
    val want = nat.select("n_nationkey").orderBy("n_nationkey")
      .collect().map(_.get(0).toString).toSeq
    assert(got == want,
      s"head lost or duplicated rows under compact/append race: ${got.size} vs ${want.size}")
    // manifest row counts agree with the data at every surviving version
    val latest = VersionedTable.versions(spark, path).last
    assert(VersionedTable.rowCount(spark, path, latest) == want.size)
  }

  test("deleteWhere: targeted rewrite only, time travel keeps history, vacuum completes the forgetting") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    // range-partitioned layout: matches are CONFINED to some files
    val v1 = VersionedTable.commit(
      cust.repartitionByRange(4, col("c_custkey")), path)
    val filesV1 = dataFiles(path)
    val n = cust.count()
    val nDel = cust.filter(col("c_custkey") <= 5).count()
    assert(nDel > 0 && nDel < n)
    val v2 = VersionedTable.deleteWhere(spark, path, col("c_custkey") <= 5)
    assert(v2 == v1 + 1)
    // latest no longer has the rows; manifest count agrees with no I/O
    val r2 = VersionedTable.read(spark, path)
    assert(r2.filter(col("c_custkey") <= 5).count() == 0)
    assert(r2.count() == n - nDel)
    assert(VersionedTable.rowCount(spark, path, v2) == n - nDel)
    // time travel BEFORE the delete still sees them (until vacuum)
    assert(VersionedTable.read(spark, path, Some(v1))
      .filter(col("c_custkey") <= 5).count() == nDel)
    // only hit files were rewritten: the untouched v1 files are
    // re-listed, not copied (they are still the same physical files)
    val after = dataFiles(path)
    val survivingOld = after.intersect(filesV1)
    assert(survivingOld == filesV1, "delete must not destroy v1's files")
    val newFiles = after -- filesV1
    assert(newFiles.nonEmpty, "matching files must be rewritten")
    assert(newFiles.size < filesV1.size,
      s"range layout confines matches to a strict subset of files " +
        s"(rewrote ${newFiles.size} of ${filesV1.size})")
    // compliance completion: vacuum granularity is the commit DIR, and
    // v2 still re-lists v1's untouched files from v1's dir — so the
    // full forgetting flow is delete + COMPACT (fresh physical layout)
    // + retention lapse + vacuum: after compaction, v1's dir (still
    // holding the deleted bytes) is referenced by no retained version
    val v3 = VersionedTable.compact(spark, path, 2)
    val orphans = VersionedTable.orphanDataDirs(spark, path, Seq(v3))
    assert(orphans.nonEmpty, "post-compact, the pre-delete dir must be a vacuum candidate")
    assert(VersionedTable.read(spark, path, Some(v3)).count() == n - nDel)
    // a delete matching nothing is a clean no-op version
    val v4 = VersionedTable.deleteWhere(spark, path, col("c_custkey") < 0)
    assert(VersionedTable.read(spark, path, Some(v4)).count() == n - nDel)
  }

  test("expireAndVacuum keeps the retention window and destroys exactly the rest") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val v1 = VersionedTable.commit(
      cust.filter(col("c_custkey") <= 50), path)
    VersionedTable.commit(
      cust.filter(col("c_custkey") > 50), path, mode = "append")
    VersionedTable.deleteWhere(spark, path, col("c_custkey") <= 5)
    val v4 = VersionedTable.compact(spark, path, 2)
    val expectRows = VersionedTable.read(spark, path, Some(v4))
      .collect().map(_.toString).sorted.toSeq
    val dirsBefore = VersionedTable.orphanDataDirs(spark, path, Seq(v4))
    assert(dirsBefore.nonEmpty, "pre-vacuum, old dirs must be orphans of the kept set")

    // single-writer fixture: no commit can be in flight, so minAge 0
    val (expired, deleted) =
      VersionedTable.expireAndVacuum(spark, path, 1, minAgeMs = 0L)
    assert(expired == Seq(v1, v1 + 1, v1 + 2))
    assert(deleted.toSet == dirsBefore.toSet)
    // retained version intact, bit-for-bit
    assert(VersionedTable.versions(spark, path) == Seq(v4))
    assert(VersionedTable.read(spark, path).collect()
      .map(_.toString).sorted.toSeq == expectRows)
    // expired versions are truly unreachable AND their bytes are gone
    intercept[IllegalArgumentException](
      VersionedTable.read(spark, path, Some(v1)))
    deleted.foreach(d => assert(!new java.io.File(s"$path/$d").exists(),
      s"vacuumed dir $d still on disk"))
    // idempotent: a second pass with a wide window is a no-op
    assert(VersionedTable.expireAndVacuum(spark, path, 5, minAgeMs = 0L) ==
      ((Seq.empty[Int], Seq.empty[String])))
    // version numbers stay burned: the next commit continues the chain
    val v5 = VersionedTable.commit(cust.limit(1), path, mode = "append")
    assert(v5 == v4 + 1)
  }

  test("vacuum age guard: young orphan dirs survive until minAge lapses") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
    VersionedTable.commit(nat, path)
    VersionedTable.commit(nat.limit(3), path) // overwrite: v1's dir orphaned
    // the orphan dir was written seconds ago — it is indistinguishable
    // from an IN-FLIGHT commit's pre-claim data dir, so a vacuum with a
    // realistic minAge must leave it alone (expiry still proceeds:
    // manifests are not the hazard, unreferenced data dirs are)
    val (expired, deleted) = VersionedTable.expireAndVacuum(spark, path, 1)
    assert(expired == Seq(1) && deleted.isEmpty,
      s"young dir must not be vacuumed: deleted=$deleted")
    assert(VersionedTable.orphanDataDirs(spark, path,
      VersionedTable.versions(spark, path)).nonEmpty)
    // once older than the threshold it is collected by the next pass
    val (e2, d2) = VersionedTable.expireAndVacuum(spark, path, 1,
      minAgeMs = 0L)
    assert(e2.isEmpty && d2.size == 1)
    d2.foreach(d => assert(!new java.io.File(s"$path/$d").exists()))
  }

  test("tags pin versions through retention; untag re-subjects them") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_name")
    val v1 = VersionedTable.commit(cust.filter(col("c_custkey") <= 10), path)
    val v2 = VersionedTable.commit(cust.filter(col("c_custkey") > 10), path)
    val v3 = VersionedTable.commit(cust.limit(3), path)
    VersionedTable.tag(spark, path, "release-1.0", v1)
    // immutable unless retag is explicit
    intercept[IllegalArgumentException](
      VersionedTable.tag(spark, path, "release-1.0", v2))
    VersionedTable.tag(spark, path, "release-1.0", v1, retag = true)
    intercept[IllegalArgumentException](
      VersionedTable.tag(spark, path, "bad name!", v1))
    intercept[IllegalArgumentException](
      VersionedTable.tag(spark, path, "ghost", 999))
    assert(VersionedTable.tags(spark, path) == Map("release-1.0" -> v1))
    val pinnedRows = VersionedTable.readTag(spark, path, "release-1.0")
      .collect().map(_.toString).sorted.toSeq

    // retention keeps the tagged v1 even though only v3 is in-window
    val (expired, _) =
      VersionedTable.expireAndVacuum(spark, path, 1, minAgeMs = 0L)
    assert(expired == Seq(v2), "the tagged version must survive expiry")
    assert(VersionedTable.versions(spark, path) == Seq(v1, v3))
    assert(VersionedTable.readTag(spark, path, "release-1.0").collect()
      .map(_.toString).sorted.toSeq == pinnedRows)

    // untag → the old release becomes expirable again
    VersionedTable.untag(spark, path, "release-1.0")
    val (expired2, deleted2) =
      VersionedTable.expireAndVacuum(spark, path, 1, minAgeMs = 0L)
    assert(expired2 == Seq(v1))
    assert(deleted2.nonEmpty, "v1's exclusive data dir must be vacuumed")
    assert(VersionedTable.versions(spark, path) == Seq(v3))
  }

  test("diff between versions classifies insert/delete/update/unchanged") {
    val path = freshPath()
    val nat = Tables(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val v1 = VersionedTable.commit(nat.filter(col("n_nationkey") < 20), path)
    // v2: drop key 0 (delete), add keys >= 20 (inserts), change key 1's
    // region (update), keep the rest byte-identical (unchanged)
    val v2 = VersionedTable.commit(
      nat.filter(col("n_nationkey") =!= 0)
        .withColumn("n_regionkey",
          when(col("n_nationkey") === 1, lit(99L)).otherwise(col("n_regionkey"))),
      path)
    val d = VersionedTable.diff(spark, path, v1, v2,
      Seq("n_nationkey"), Seq("n_name", "n_regionkey"))
      .collect().map(r => r.get(0).toString.toLong -> r.getString(1)).toMap
    assert(d(0L) == "delete")
    assert(d(1L) == "update")
    assert((20L until nat.count()).forall(k => d(k) == "insert"))
    assert((2L until 20L).forall(k => d(k) == "unchanged"))
    assert(d.size == nat.count())
  }

  private def dataFiles(path: String): Set[String] = {
    val root = new java.io.File(path, "data")
    if (!root.exists()) Set.empty
    else root.listFiles().flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => d.getName + "/" + f.getName)).toSet
  }

  test("corpusDiff reads ONLY the changed files and classifies per source") {
    val path = freshPath()
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // base = 3 id-range files; the low range will absorb every change
    val v1 = VersionedTable.commit(
      docs.filter(col("doc_id") < 45).repartitionByRange(3, col("doc_id")),
      path, "overwrite")
    VersionedTable.commit(docs.filter(col("doc_id") >= 45), path, "append")
    VersionedTable.deleteWhere(spark, path, col("doc_id") < 3)
    VersionedTable.deleteWhere(spark, path, col("doc_id") === 5)
    val vN = VersionedTable.commit(
      docs.filter(col("doc_id") === 5)
        .withColumn("text", concat(col("text"), lit(" v2"))),
      path, "append")
    val oldFiles = VersionedTable.read(spark, path, Some(v1))
      .inputFiles.toSet
    val newFiles = VersionedTable.read(spark, path, Some(vN))
      .inputFiles.toSet
    val untouched = oldFiles.intersect(newFiles)
    assert(untouched.nonEmpty, "fixture must leave untouched files")
    val d = graft.operators.CorpusPipeline.corpusDiff(spark, path,
      v1, vN, "doc_id", "source", "text")
    // the LshIndexSpec no-re-scan discipline: the diff plan's input
    // files are exactly manifest metadata + the symmetric difference —
    // a file listed by BOTH versions is never opened
    val scanned = d.inputFiles.toSet
    assert(scanned.intersect(untouched).isEmpty,
      s"corpusDiff scanned untouched files: ${scanned.intersect(untouched)}")
    // and the readout is the per-source truth of the three edits
    val rows = d.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    graft.operators.Dedup.releaseAll(spark)
    val want = docs
      .withColumn("k",
        when(col("doc_id") >= 45, "added")
          .when(col("doc_id") < 3, "removed")
          .when(col("doc_id") === 5, "changed"))
      .filter(col("k").isNotNull)
      .groupBy(col("source"))
      .agg(sum(when(col("k") === "added", 1L).otherwise(0L)).as("a"),
        sum(when(col("k") === "removed", 1L).otherwise(0L)).as("r"),
        sum(when(col("k") === "changed", 1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSet == want.toSet, s"got=${rows.toSet} want=${want.toSet}")
  }
}
