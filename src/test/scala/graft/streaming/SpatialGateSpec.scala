package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.athenaeum.SparkSpec
import graft.operators.{Dedup, Spatial}
import graft.sources.VersionedTable

case class SgPoint(id: Long, x: Long, y: Long)

/** The streaming proximity gate's cumulative pair table must equal
  * `Spatial.radiusJoin` over the stream's prefix after every batch —
  * including pairs that straddle batches — and replay plus the
  * partial-failure order (points committed, pairs not) must both be
  * exactly-once (the pinned pre-batch state read keeps a replay from
  * double-reporting intra-batch pairs as cross pairs). */
class SpatialGateSpec extends SparkSpec {

  private val R = 5L

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = df.collect().map(_.toString).toSet
    Dedup.releaseAll(spark)
    s
  }

  private def batchTruth(pts: Seq[SgPoint]): Set[String] = {
    import spark.implicits._
    canon(Spatial.radiusJoin(pts.toDF(), "id", "x", "y", R, R))
  }

  test("cumulative gate pairs equal the batch radius join on every prefix; replays are exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sg").toString
    val statePath = s"$dir/state"
    val outPath = s"$dir/out"
    val snk = SpatialGate.sink(statePath, outPath, "id", "x", "y", R, R)
    val mem = MemoryStream[SgPoint]
    val q = mem.toDS().toDF().writeStream.foreachBatch(snk)
      .outputMode(OutputMode.Append).start()
    // b0: one intra-batch pair (1,2); 3 is isolated
    val b0 = Seq(SgPoint(1, 10, 10), SgPoint(2, 13, 10), SgPoint(3, 50, 50))
    // b1: 4 pairs with 1 AND 2 (cross), 5 pairs with 3 across a cell
    // boundary, 6 pairs with 5 (intra) — straddling pairs everywhere
    val b1 = Seq(SgPoint(4, 11, 12), SgPoint(5, 54, 51), SgPoint(6, 55, 47))
    // b2: a point landing ON an existing coordinate (dist2 = 0)
    val b2 = Seq(SgPoint(7, 10, 10), SgPoint(8, 200, 200))
    var seen = Seq.empty[SgPoint]
    try {
      for (b <- Seq(b0, b1, b2)) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val got = canon(VersionedTable.read(spark, outPath))
        assert(got == batchTruth(seen),
          s"gate pairs != batch radius join after ${seen.size} points")
      }
    } finally q.stop()
    val afterStream = canon(VersionedTable.read(spark, outPath))
    assert(afterStream.nonEmpty)
    assert(VersionedTable.versions(spark, outPath).size == 3)

    // replay of the last epoch: no new versions, identical bytes
    snk(b2.toDF(), 2L)
    assert(VersionedTable.versions(spark, outPath).size == 3)
    assert(canon(VersionedTable.read(spark, outPath)) == afterStream)

    // partial failure: batch 7's POINTS committed, pairs did not — the
    // replay must pin the pre-batch state (else 9-10 would also arrive
    // as cross pairs of themselves / 9 would pair against its own
    // replayed twin) and converge to the clean prefix truth
    val b3 = Seq(SgPoint(9, 12, 11), SgPoint(10, 14, 12))
    BucketedState.appendOnce(
      Spatial.gridKeyed(b3.toDF(), "id", "x", "y", R), statePath, 7L,
      "ck", 32)
    snk(b3.toDF(), 7L)
    assert(canon(VersionedTable.read(spark, outPath)) ==
      batchTruth(seen ++ b3),
      "partial-failure replay diverged from the batch prefix truth")

    // re-delivered id in a NEW batch (not a replay): point 1's stored
    // copy sits at distance 0 from its re-arrival — the id_l =!= id_r
    // guard must keep it from pairing with itself (the batch operator's
    // id_a < id_b never emits self-pairs)
    snk(Seq(SgPoint(1, 10, 10)).toDF(), 9L)
    val self = VersionedTable.read(spark, outPath)
      .filter(org.apache.spark.sql.functions.col("id_a") ===
        org.apache.spark.sql.functions.col("id_b")).count()
    Dedup.releaseAll(spark)
    assert(self == 0L, s"re-delivered id produced $self self-pairs")
  }
}
