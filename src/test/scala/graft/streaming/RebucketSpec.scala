package graft.streaming

import org.apache.spark.sql.functions._

import graft.athenaeum.SparkSpec
import graft.operators.Dedup
import graft.sources.VersionedTable

/** [[BucketedState.rebucket]] — the 100 TB re-shard story: a gate that
  * outgrows its bucket count migrates its state exactly-once and keeps
  * streaming, with the SAME cumulative output as a never-rebucketed
  * run. Covered here on a live SubstrGate stream: batches before, a
  * rebucket (including an injected crash at the worst window — after
  * the full rewrite, before the sidecar commit), batches after, parity
  * against the one-shot batch operator on every prefix. */
class RebucketSpec extends SparkSpec {

  private def mix(x: Long): Long = {
    var z = x * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // half the docs share a planted 40-char span so cross-batch runs
  // exist; the rest is unique hex
  private val planted = "THE-COMMON-RUN-" + "x" * 25
  private def batch(b: Int) = (0 until 40).map { i =>
    val id = b * 100L + i
    val uniq = (0 until 4).map(k => f"${mix(id * 31L + k)}%016x").mkString
    (id, if (i % 2 == 0) uniq + planted else uniq + f"${mix(id)}%016x")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = df.collect().map(_.toString).toSet
    Dedup.releaseAll(spark)
    s
  }

  test("mid-stream rebucket under crash injection preserves prefix parity; the new layout serves and appends") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rebucket").toString
    val (docsPath, gramsPath, outPath) =
      (s"$dir/docs", s"$dir/grams", s"$dir/out")
    val snk = SubstrGate.sink(docsPath, gramsPath, outPath,
      "doc_id", "text", minLen = 30, nBuckets = 8)
    var seen = Seq.empty[(Long, String)]
    def truth(): Set[String] = canon(Dedup.duplicatedSubstrings(
      seen.toDF("doc_id", "text"), "doc_id", "text", 30))
    def check(tag: String): Unit =
      assert(canon(VersionedTable.read(spark, outPath)) == truth(),
        s"gate != one-shot operator $tag")

    for (b <- 0 until 2) {
      snk(batch(b).toDF("doc_id", "text"), b.toLong)
      seen = seen ++ batch(b)
    }
    check("before rebucket")

    // crash-injected rebucket: full rewrite landed, sidecar commit did
    // not — the state must still serve (and re-shard) from the OLD
    // generation, and a retry must complete cleanly
    val boom = intercept[RuntimeException] {
      BucketedState.rebucket(spark, gramsPath, 16,
        onBeforeCommit = () => throw new RuntimeException("crash"))
    }
    assert(boom.getMessage == "crash")
    check("after crashed rebucket (old generation must still serve)")
    BucketedState.rebucket(spark, gramsPath, 16)
    BucketedState.rebucket(spark, docsPath, 16)
    check("after completed rebucket")

    // the migrated tables really are the new layout: a 16-bucket
    // catalog spec at generation 1, no stale generation-0 directory.
    // (A BARE state read shows UnknownPartitioning — Spark's
    // autoBucketedScan rightly skips bucketed reads no operator needs;
    // GatePlanAuditSpec pins that the real state JOINS keep it.)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        BucketedState.tableName(gramsPath) + "_g1"))
    assert(meta.bucketSpec.map(_.numBuckets).contains(16),
      s"expected a 16-bucket layout, got ${meta.bucketSpec}")
    assert(!new java.io.File(s"$gramsPath/data").exists(),
      "stale generation-0 state directory survived the rebucket")

    // the stream continues transparently: the sink still passes its
    // original nBuckets=8 sizing, the live 16-bucket layout wins
    for (b <- 2 until 4) {
      snk(batch(b).toDF("doc_id", "text"), b.toLong)
      seen = seen ++ batch(b)
      check(s"after post-rebucket batch $b")
    }

    // replay of the last batch against the migrated state: no-op
    val before = canon(VersionedTable.read(spark, outPath))
    snk(batch(3).toDF("doc_id", "text"), 3L)
    assert(canon(VersionedTable.read(spark, outPath)) == before)

    // a same-count rebucket is a clean no-op
    BucketedState.rebucket(spark, gramsPath, 16)
    check("after no-op rebucket")
  }
}
