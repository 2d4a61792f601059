package graft.sources

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manifest-level column stats + data-skipping reads: stats are exact,
  * pruning is conservative (readWhere ≡ read().filter for every
  * predicate shape, including the ones the evaluator cannot use), and
  * the metadata survives append/rollback like the files it describes. */
class VersionedTableSkipSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshPath() = java.nio.file.Files
    .createTempDirectory("graft-vts").toString + "/t"

  /** Orders committed one file per order-year, stats on date + price +
    * priority — the clustered-table shape data skipping exists for. */
  private def buildByYear(path: String): Unit = {
    val orders = Tables(spark, dir, "orders")
    val years = orders.selectExpr("year(o_orderdate) AS y").distinct()
      .orderBy("y").collect().map(_.getInt(0)).toSeq
    years.zipWithIndex.foreach { case (y, i) =>
      VersionedTable.commit(
        orders.filter(expr(s"year(o_orderdate) = $y")).repartition(1),
        path, if (i == 0) "overwrite" else "append",
        statCols = Seq("o_orderdate", "o_totalprice", "o_orderpriority"))
    }
  }

  private def assertSameResult(path: String,
      pred: org.apache.spark.sql.Column): Unit = {
    val full = VersionedTable.read(spark, path).filter(pred)
    val pruned = VersionedTable.readWhere(spark, path, pred)
    assert(pruned.count() == full.count())
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      s"readWhere diverged for $pred")
  }

  test("stats are exact per file and zero-data-I/O to read back") {
    val path = freshPath()
    buildByYear(path)
    val stats = VersionedTable.fileStats(spark, path)
    val orders = Tables(spark, dir, "orders")
    val perYear = orders
      .groupBy(expr("year(o_orderdate)").as("y"))
      .agg(count(lit(1)).as("n"),
        min(expr("unix_micros(cast(o_orderdate as timestamp))")).as("mn"),
        max(expr("unix_micros(cast(o_orderdate as timestamp))")).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats.size == perYear.size, "one stats block per year file")
    val got = stats.map { fsRow =>
      val d = fsRow.cols("o_orderdate")
      assert(d.kind == "ts" && d.nulls == 0)
      (fsRow.rows, d.min.get.toLong, d.max.get.toLong)
    }.toSet
    assert(got == perYear)
    // string stats carry the priority domain bounds
    assert(stats.forall { fsRow =>
      val p = fsRow.cols("o_orderpriority")
      p.kind == "s" && p.min.nonEmpty && p.max.nonEmpty
    })
  }

  test("readWhere equals read().filter across predicate shapes") {
    val path = freshPath()
    buildByYear(path)
    Seq(
      expr("o_orderdate >= timestamp'1996-01-01 00:00:00' AND " +
        "o_orderdate < timestamp'1997-01-01 00:00:00'"),
      expr("o_totalprice > 300000.0"),
      expr("o_orderpriority = '1-URGENT'"),
      expr("o_orderpriority IN ('1-URGENT', '2-HIGH')"),
      expr("o_orderdate < timestamp'1996-01-01 00:00:00' OR " +
        "o_totalprice > 400000.0"),
      // evaluator can't use these — must fall back to keep-everything
      expr("NOT (o_orderdate >= timestamp'1996-01-01 00:00:00')"),
      expr("year(o_orderdate) = 1996"),
      expr("o_orderkey % 7 = 0"),
      expr("o_orderdate IS NOT NULL"),
      expr("o_orderdate IS NULL")
    ).foreach(assertSameResult(path, _))
  }

  test("a clustered one-year predicate actually skips the other files") {
    val path = freshPath()
    buildByYear(path)
    val pred = expr("o_orderdate >= timestamp'1996-01-01 00:00:00' AND " +
      "o_orderdate < timestamp'1997-01-01 00:00:00'")
    val (keep, skip) = VersionedTable.pruneFiles(spark, path, pred)
    assert(keep.size == 1, s"expected exactly the 1996 file, got $keep")
    assert(skip.nonEmpty && skip.size == dataFileCount(path) - 1)
    // an out-of-domain predicate prunes everything, and the read is a
    // schema-correct empty relation
    val none = expr("o_orderdate < timestamp'1970-01-02 00:00:00'")
    val (k2, s2) = VersionedTable.pruneFiles(spark, path, none)
    assert(k2.isEmpty && s2.size == dataFileCount(path))
    val empty = VersionedTable.readWhere(spark, path, none)
    assert(empty.count() == 0 &&
      empty.columns.contains("o_orderpriority"))
  }

  test("files committed without stats are always kept (conservative)") {
    val path = freshPath()
    val orders = Tables(spark, dir, "orders")
    VersionedTable.commit(
      orders.filter(expr("year(o_orderdate) = 1996")).repartition(1),
      path, "overwrite", statCols = Seq("o_orderdate"))
    // stat-less append: a reader predating stats, or a lazy writer
    VersionedTable.commit(
      orders.filter(expr("year(o_orderdate) = 1997")).repartition(1),
      path, "append")
    val pred = expr("o_orderdate < timestamp'1995-01-01 00:00:00'")
    val (keep, skip) = VersionedTable.pruneFiles(spark, path, pred)
    assert(skip.size == 1, "the stats-backed 1996 file is provably empty")
    assert(keep.size == 1, "the stat-less 1997 file must survive")
    assertSameResult(path, pred)
  }

  test("all-null files prune for comparisons but serve IS NULL") {
    val path = freshPath()
    import spark.implicits._
    val withNulls = (1L to 50L).map(i =>
      (i, if (i <= 25) None else Some(i * 10))).toDF("id", "v")
    VersionedTable.commit(
      withNulls.filter(col("v").isNull).repartition(1), path,
      "overwrite", statCols = Seq("v"))
    VersionedTable.commit(
      withNulls.filter(col("v").isNotNull).repartition(1), path,
      "append", statCols = Seq("v"))
    val (k1, s1) = VersionedTable.pruneFiles(spark, path, col("v") > 100L)
    assert(k1.size == 1 && s1.size == 1, "all-null file pruned for >")
    val (k2, _) = VersionedTable.pruneFiles(spark, path, col("v").isNull)
    assert(k2.size == 1 && k2 != k1, "IS NULL keeps only the null file")
    assertSameResult(path, col("v") > 100L)
    assertSameResult(path, col("v").isNull)
  }

  test("misaligned literal types disable pruning instead of risking it") {
    val path = freshPath()
    buildByYear(path)
    // a string literal against the timestamp column: no stat use
    val pred = col("o_orderdate") > lit("1996-01-01")
    val (keep, skip) = VersionedTable.pruneFiles(spark, path, pred)
    assert(skip.isEmpty && keep.size == dataFileCount(path))
  }

  test("deleteWhere carries kept files' stats forward and re-stats the rewrites") {
    val path = freshPath()
    buildByYear(path)
    val filesBefore = VersionedTable.fileStats(spark, path).map(_.file).toSet
    // delete a slice confined to one year-file: that file is rewritten,
    // every other file must keep its zone-map line verbatim
    val v = VersionedTable.deleteWhere(spark, path,
      expr("o_orderdate >= timestamp'1996-01-01 00:00:00' AND " +
        "o_orderdate < timestamp'1996-07-01 00:00:00'"))
    val after = VersionedTable.fileStats(spark, path, Some(v))
    assert(after.size == filesBefore.size,
      s"every file of v$v must still carry stats (got ${after.size} of ${filesBefore.size})")
    val rewritten = after.filterNot(s => filesBefore.contains(s.file))
    assert(rewritten.size == 1, "exactly the 1996 file is rewritten")
    // the rewritten file's fresh stats cover the same columns and
    // reflect the post-delete domain (min moved past the deleted range)
    val d = rewritten.head.cols("o_orderdate")
    assert(d.kind == "ts" &&
      d.min.get.toLong >=
        java.time.Instant.parse("1996-07-01T00:00:00Z").toEpochMilli * 1000L -
          86400000000L, // tz slack: local-session timestamps
      s"rewritten min ${d.min} must sit at/after the deleted range")
    assert(rewritten.head.cols.keySet ==
      Set("o_orderdate", "o_totalprice", "o_orderpriority"))
    // and pruning still works from the post-delete version: a 1997
    // predicate keeps one file, so the delete did NOT strip skipping
    val pred = expr("o_orderdate >= timestamp'1997-01-01 00:00:00' AND " +
      "o_orderdate < timestamp'1998-01-01 00:00:00'")
    val (keep, skip) = VersionedTable.pruneFiles(spark, path, pred, Some(v))
    assert(keep.size == 1 && skip.size == after.size - 1,
      s"post-delete pruning regressed: keep=$keep")
    assertSameResult(path, pred)
  }

  test("manifest blooms prune point lookups that zone maps cannot") {
    val path = freshPath()
    val orders = Tables(spark, dir, "orders")
    val years = orders.selectExpr("year(o_orderdate) AS y").distinct()
      .orderBy("y").collect().map(_.getInt(0)).toSeq
    years.zipWithIndex.foreach { case (y, i) =>
      VersionedTable.commit(
        orders.filter(expr(s"year(o_orderdate) = $y")).repartition(1),
        path, if (i == 0) "overwrite" else "append",
        statCols = Seq("o_orderdate"), bloomCols = Seq("o_orderkey"))
    }
    val nFiles = dataFileCount(path)
    // order keys interleave across year files: min/max zone maps span
    // the whole key domain and prune nothing — only the blooms can
    val pred = col("o_orderkey").isin(3L, 777L, 1337L)
    val (keep, skip) = VersionedTable.pruneFiles(spark, path, pred)
    assert(skip.nonEmpty,
      s"blooms must prune some of the $nFiles year files for a 3-key IN")
    assert(keep.size < nFiles)
    assertSameResult(path, pred)
    // single-key equality: at most the (few) bloom-false-positive files
    val (k1, s1) = VersionedTable.pruneFiles(spark, path,
      col("o_orderkey") === 777L)
    assert(s1.size >= nFiles - 2, s"one key should keep ~1 file, kept $k1")
    assertSameResult(path, col("o_orderkey") === 777L)
    // an absent key prunes everywhere it has no false positive, and the
    // read is still exactly the (empty) predicate result
    assertSameResult(path, col("o_orderkey") === -42L)
    // non-equality predicates never consult blooms (no wrong skips)
    assertSameResult(path, col("o_orderkey") > 14000L)
  }

  test("string-kind blooms prune equality through xxhash64 canonicalization") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    // 4 files split by key range: names are unique per row, so a name
    // lookup is present in exactly one file
    (0 until 4).foreach { i =>
      VersionedTable.commit(
        cust.filter(col("c_custkey") % 4 === i).repartition(1),
        path, if (i == 0) "overwrite" else "append",
        bloomCols = Seq("c_name"))
    }
    val name = cust.filter(col("c_custkey") === 7)
      .select("c_name").collect().head.getString(0)
    val (keep, skip) = VersionedTable.pruneFiles(spark, path,
      col("c_name") === name)
    assert(keep.size <= 2 && skip.size >= 2,
      s"a unique name must prune most files, kept $keep")
    assertSameResult(path, col("c_name") === name)
  }

  test("blooms are conservative: absent on a file, misaligned literals, bloom-less versions") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    // v1 with blooms, v2 appended WITHOUT — the bloom-less file must
    // always be kept for equality predicates
    VersionedTable.commit(
      cust.filter(col("c_custkey") <= 50).repartition(1), path,
      "overwrite", bloomCols = Seq("c_custkey"))
    VersionedTable.commit(
      cust.filter(col("c_custkey") > 50).repartition(1), path, "append")
    val (keep, skip) = VersionedTable.pruneFiles(spark, path,
      col("c_custkey") === 999999L)
    assert(skip.size == 1, "the bloomed file proves absence")
    assert(keep.size == 1, "the bloom-less file must survive")
    assertSameResult(path, col("c_custkey") === 999999L)
    // misaligned literal type (string vs integral bloom): no pruning
    val (k2, s2) = VersionedTable.pruneFiles(spark, path,
      col("c_custkey") === lit("7"))
    assert(s2.isEmpty && k2.size == 2)
  }

  test("blooms ride append carry, deleteWhere, and rollback like zone maps") {
    val path = freshPath()
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    VersionedTable.commit(
      cust.filter(col("c_custkey") <= 75).repartitionByRange(3,
        col("c_custkey")), path, "overwrite",
      bloomCols = Seq("c_custkey"))
    VersionedTable.commit(
      cust.filter(col("c_custkey") > 75).repartition(1), path, "append",
      bloomCols = Seq("c_custkey"))
    val allBloomed = VersionedTable.fileBlooms(spark, path)
    assert(allBloomed.size == dataFilesOf(path),
      "append must carry the base files' bloom lines forward")
    // targeted delete: untouched files keep their blooms verbatim, the
    // rewritten file gets a fresh one with the same sizing
    val vDel = VersionedTable.deleteWhere(spark, path,
      col("c_custkey") === 7L)
    val after = VersionedTable.fileBlooms(spark, path, Some(vDel))
    assert(after.size == dataFilesOf(path, Some(vDel)),
      "every post-delete file must still carry a bloom")
    assert(after.values.forall(m => m.contains("c_custkey") &&
      m("c_custkey").m == allBloomed.values.head("c_custkey").m))
    val (keep, _) = VersionedTable.pruneFiles(spark, path,
      col("c_custkey") === 7L, Some(vDel))
    assertSameResult(path, col("c_custkey") === 100L)
    // rollback re-lists the pre-delete metadata wholesale
    val vRb = VersionedTable.rollback(spark, path, vDel - 1)
    assert(VersionedTable.fileBlooms(spark, path, Some(vRb)).nonEmpty)
  }

  private def dataFilesOf(path: String, v: Option[Int] = None): Int =
    VersionedTable.read(spark, path, v).inputFiles.length

  test("stats survive append carry and rollback") {
    val path = freshPath()
    buildByYear(path)
    val before = VersionedTable.fileStats(spark, path)
    val vs = VersionedTable.versions(spark, path)
    // rollback to the first version: only that file's stats remain
    val rb = VersionedTable.rollback(spark, path, vs.head)
    val atRb = VersionedTable.fileStats(spark, path, Some(rb))
    assert(atRb.size == 1 &&
      before.map(_.file).contains(atRb.head.file))
    // and the full-history stats are still intact at the old version
    assert(VersionedTable.fileStats(spark, path,
      Some(vs.last)).size == before.size)
  }

  private def dataFileCount(path: String): Int =
    VersionedTable.fileStats(spark, path).size

  test("compact preserves each bloom column's own recorded (m, k) sizing") {
    val path = freshPath()
    val orders = Tables(spark, dir, "orders").repartition(1)
    // two commits with DIFFERENT per-column sizings: custkey @ (2^10, 3)
    // on the base file, orderkey @ (2^14, 5) on the appended file
    VersionedTable.commit(orders, path, "overwrite",
      bloomCols = Seq("o_custkey"), bloomM = 1 << 10, bloomK = 3)
    VersionedTable.commit(orders.limit(50), path, "append",
      bloomCols = Seq("o_orderkey"), bloomM = 1 << 14, bloomK = 5)
    // default-config compact must re-bloom BOTH columns, each with its
    // own recorded sizing — not resize everything to the first config
    val vc = VersionedTable.compact(spark, path, nFiles = 2)
    val blooms = VersionedTable.fileBlooms(spark, path, Some(vc))
    assert(blooms.nonEmpty)
    blooms.values.foreach { byCol =>
      assert(byCol("o_custkey").m == (1 << 10) &&
        byCol("o_custkey").k == 3,
        s"o_custkey sizing not preserved: ${byCol("o_custkey")}")
      assert(byCol("o_orderkey").m == (1 << 14) &&
        byCol("o_orderkey").k == 5,
        s"o_orderkey sizing not preserved: ${byCol("o_orderkey")}")
    }
    // and the compacted blooms still prune correctly
    val probe = col("o_custkey") === 7L
    assert(VersionedTable.readWhere(spark, path, probe, Some(vc))
      .count() ==
      VersionedTable.read(spark, path, Some(vc)).filter(probe).count())
  }
}
