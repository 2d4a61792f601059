package graft.operators

import graft.athenaeum.SparkSpec

/** Pins [[Dedup.incrementalClusters]]' union-find contract on hand-built
  * graphs — especially the transitive-merge case (a new doc bridging two
  * existing base components), which the corpus oracle only exercises if
  * the synthetic data happens to contain one. */
class IncrementalClustersSpec extends SparkSpec {

  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseAll(spark)
    m
  }

  test("a new doc bridging two base components merges them to the global min") {
    val baseLabels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster")
    val cross = Seq((100L, 2L), (100L, 11L)).toDF("new_id", "base_id")
    val intra = spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b")
    val got = labels(
      Dedup.incrementalClusters(baseLabels, "doc_id", cross, intra))
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 100L -> 1L),
      s"transitive merge failed: $got")
  }

  test("a singleton base doc (no base-side label) is attachable and keeps the min") {
    val baseLabels = Seq((5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")
    // 7 never appeared in a base pair — no label row; a new doc links it
    val cross = Seq((100L, 7L)).toDF("new_id", "base_id")
    val intra = Seq((100L, 101L)).toDF("doc_a", "doc_b")
    val got = labels(
      Dedup.incrementalClusters(baseLabels, "doc_id", cross, intra))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 7L, 100L -> 7L, 101L -> 7L),
      s"singleton attach failed: $got")
  }

  test("untouched base components keep their labels verbatim") {
    val baseLabels = Seq((1L, 1L), (2L, 1L), (30L, 30L)).toDF("doc_id", "cluster")
    val cross = spark.emptyDataset[(Long, Long)].toDF("new_id", "base_id")
    val intra = Seq((200L, 201L)).toDF("doc_a", "doc_b")
    val got = labels(
      Dedup.incrementalClusters(baseLabels, "doc_id", cross, intra))
    assert(got == Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 200L -> 200L,
      201L -> 200L), s"isolation failed: $got")
  }

  test("incremental output == full clustersStar recompute on the union graph") {
    // base chain 1-2-3, base pair 20-21, increment bridges 3 and 20 and
    // brings its own pair — the full recompute is the specification
    val basePairs = Seq((1L, 2L), (2L, 3L), (20L, 21L)).toDF("doc_a", "doc_b")
    val baseLabels = Dedup.clustersStar(basePairs, "doc_a", "doc_b")
      .withColumnRenamed("doc_a", "doc_id")
    val cross = Seq((50L, 3L), (50L, 20L), (60L, 21L)).toDF("new_id", "base_id")
    val intra = Seq((50L, 51L), (70L, 71L)).toDF("doc_a", "doc_b")
    val got = labels(
      Dedup.incrementalClusters(baseLabels, "doc_id", cross, intra))
    val full = Seq((1L, 2L), (2L, 3L), (20L, 21L), (50L, 3L), (50L, 20L),
      (60L, 21L), (50L, 51L), (70L, 71L)).toDF("doc_a", "doc_b")
    val want = labels(Dedup.clustersStar(full, "doc_a", "doc_b"))
    assert(got == want, s"got=$got want=$want")
  }
}
