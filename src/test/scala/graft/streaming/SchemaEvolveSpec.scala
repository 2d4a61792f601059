package graft.streaming

import org.apache.spark.sql.functions._

import graft.athenaeum.SparkSpec

/** Additive SCHEMA EVOLUTION on bucketed gate state: a delta whose
  * schema widens the state's evolves it in place — old partitions read
  * the new columns as NULL (the additive identity: [[MergeState]] sums
  * coalesce them to 0), the bucket layout and replay pinning are
  * untouched, narrowing is refused, and the sidecar-first crash window
  * self-heals. A production stream can gain a metric column mid-life
  * without a state rebuild. */
class SchemaEvolveSpec extends SparkSpec {

  test("a widened delta evolves the state in place: old rows read NULL, merge sums coalesce to the additive identity, bucketing and replay pinning intact") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-sev").toString + "/state"
    // v1 schema: (k, n)
    (0 until 2).foreach { b =>
      MergeState.appendDelta(
        Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), path, b.toLong, "k", 4)
    }
    // v2 schema adds a second metric column
    MergeState.appendDelta(
      Seq(("a", 1L, 10L), ("c", 5L, 7L)).toDF("k", "n", "bytes"),
      path, 2L, "k", 4)
    val m = MergeState.readMerged(spark, path, 2L,
      Seq("k"), Seq("n", "bytes")).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("a" -> (3L, 10L), "b" -> (4L, 0L), "c" -> (5L, 7L)),
      s"evolved merge wrong: $m")
    // replay pinning still prunes by __bt across the evolution boundary
    val m1 = MergeState.readMerged(spark, path, 1L,
      Seq("k"), Seq("n")).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 == Map("a" -> 2L, "b" -> 4L))
    // the bucket layout survived (evolution re-registers, not re-shards)
    assert(BucketedState.liveLayout(spark, path).get.nBuckets == 4)
    // a replayed pre-evolution batch id is still a no-op
    MergeState.appendDelta(
      Seq(("a", 99L)).toDF("k", "n"), path, 0L, "k", 4)
    assert(MergeState.readMerged(spark, path, 2L, Seq("k"), Seq("n"))
      .get.filter(col("k") === "a").head.getLong(1) == 3L)
    // compaction folds ACROSS the evolution boundary correctly
    (3 until 6).foreach { b =>
      MergeState.compactIfDue(spark, path, b.toLong, Seq("k"),
        Seq("n", "bytes"), compactEvery = 2)
      MergeState.appendDelta(
        Seq(("a", 1L, 1L)).toDF("k", "n", "bytes"), path, b.toLong,
        "k", 4)
    }
    val folded = MergeState.readMerged(spark, path, 5L,
      Seq("k"), Seq("n", "bytes")).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(folded == Map("a" -> (6L, 13L), "b" -> (4L, 0L),
      "c" -> (5L, 7L)), s"post-fold evolved merge wrong: $folded")
  }

  test("narrowing is refused with a clear error; the sidecar-first crash window self-heals") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-sev2").toString + "/state"
    BucketedState.appendOnce(
      Seq(("a", 1L, 2L)).toDF("k", "n", "m"), path, 0L, "k", 4)
    val boom = intercept[IllegalArgumentException] {
      BucketedState.appendOnce(
        Seq(("a", 1L)).toDF("k", "n"), path, 1L, "k", 4)
    }
    assert(boom.getMessage.contains("narrowing"))
    // crash window: sidecar widened, catalog registration not (simulate
    // by dropping the table and re-registering at the OLD schema after
    // a widening append — the next append must heal the registration)
    BucketedState.appendOnce(
      Seq(("a", 1L, 2L, 3L)).toDF("k", "n", "m", "x"), path, 1L, "k", 4)
    val name = BucketedState.tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"""CREATE TABLE $name (k STRING, n BIGINT, m BIGINT,
      __bt BIGINT) USING parquet PARTITIONED BY (__bt)
      CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS
      LOCATION '$path/data'""")
    spark.sql(s"MSCK REPAIR TABLE $name")
    // stale registration lacks x; the next append heals it
    BucketedState.appendOnce(
      Seq(("b", 1L, 1L, 1L)).toDF("k", "n", "m", "x"), path, 2L, "k", 4)
    val got = BucketedState.readBefore(spark, path, 99L).get
    assert(got.columns.toSeq == Seq("k", "n", "m", "x"))
    assert(got.count() == 3L)
    assert(got.filter(col("x").isNotNull).count() == 2L)
  }
}
