package graft.streaming

import graft.athenaeum.SparkSpec

/** The WHEN of rebucketing: [[BucketedState.advisory]] reads bytes
  * per bucket from one file listing (no data), flags a layout whose
  * mean bucket outgrew the target or whose skew exceeds 4×, and
  * [[BucketedState.maybeRebucket]] acts on it exactly-once under the
  * maintenance lease. */
class AdvisorySpec extends SparkSpec {

  test("volume over target flags rebucketDue; maybeRebucket re-shards to the recommended power of two; data intact") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-adv").toString
    (0 until 3).foreach { b =>
      BucketedState.appendOnce(
        (0 until 2000).map(i => (b * 10000L + i, s"payload-$i" * 8))
          .toDF("k", "v"),
        dir, b.toLong, "k", 4)
    }
    // roomy target: healthy layout, recommendation = current count
    val a0 = BucketedState.advisory(spark, dir,
      targetBytesPerBucket = Long.MaxValue).get
    assert(a0.nBuckets == 4 && a0.totalBytes > 0 && !a0.rebucketDue)
    assert(a0.recommendedBuckets == 4)
    assert(a0.maxBucketBytes <= a0.totalBytes)
    // tiny target: due, recommends a bigger power of two; acting on it
    // re-shards and the advisory then reports the new layout
    val a1 = BucketedState.advisory(spark, dir,
      targetBytesPerBucket = 16 * 1024).get
    assert(a1.rebucketDue && a1.recommendedBuckets > 4)
    val before = BucketedState.readBefore(spark, dir, 99L).get.count()
    BucketedState.maybeRebucket(spark, dir,
      targetBytesPerBucket = 16 * 1024)
    val a2 = BucketedState.advisory(spark, dir,
      targetBytesPerBucket = Long.MaxValue).get
    assert(a2.nBuckets == a1.recommendedBuckets,
      s"maybeRebucket did not act: ${a2.nBuckets} vs ${a1.recommendedBuckets}")
    assert(BucketedState.readBefore(spark, dir, 99L).get.count() == before)
    // healthy again at the wider layout: a second maybeRebucket no-ops
    BucketedState.maybeRebucket(spark, dir, Long.MaxValue)
    assert(BucketedState.liveLayout(spark, dir).get.nBuckets ==
      a1.recommendedBuckets)
  }

  test("hash skew surfaces in the advisory: one hot key over many buckets reads as skew > 4") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-advskew").toString
    // every row the same key: one bucket holds everything
    BucketedState.appendOnce(
      (0 until 2000).map(i => (7L, s"payload-$i" * 8)).toDF("k", "v"),
      dir, 0L, "k", 8)
    val a = BucketedState.advisory(spark, dir,
      targetBytesPerBucket = Long.MaxValue).get
    assert(a.skew > 4.0, s"single-key state should read as skewed: $a")
    assert(a.rebucketDue, "skew > 4 must flag the layout")
    // but acting is a no-op: same count recommended (resizing cannot
    // fix a hash hot spot — the advisory surfaces it for key redesign)
    BucketedState.maybeRebucket(spark, dir, Long.MaxValue)
    assert(BucketedState.liveLayout(spark, dir).get.nBuckets == 8)
  }
}
