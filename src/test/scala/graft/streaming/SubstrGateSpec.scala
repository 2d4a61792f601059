package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.athenaeum.SparkSpec
import graft.operators.Dedup
import graft.sources.VersionedTable

case class SubDoc(doc_id: Long, text: String)

/** The streaming exact-substring gate's cumulative run table must equal
  * `Dedup.duplicatedSubstrings` over the stream's prefix after every
  * batch — including spans that straddle batches in either id order —
  * and replay plus the partial-failure order (grams/docs committed,
  * runs not) must both be exactly-once via the pinned pre-batch state
  * reads. */
class SubstrGateSpec extends SparkSpec {

  private val L = 8

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = df.collect().map(_.toString).toSet
    Dedup.releaseAll(spark)
    s
  }

  private def batchTruth(docs: Seq[SubDoc]): Set[String] = {
    import spark.implicits._
    canon(Dedup.duplicatedSubstrings(docs.toDF(), "doc_id", "text", L))
  }

  test("cumulative gate runs equal the batch operator on every prefix; replays are exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-subg").toString
    val (docsPath, gramsPath, outPath) =
      (s"$dir/docs", s"$dir/grams", s"$dir/out")
    val snk = SubstrGate.sink(docsPath, gramsPath, outPath,
      "doc_id", "text", L)
    val mem = MemoryStream[SubDoc]
    val q = mem.toDS().toDF().writeStream.foreachBatch(snk)
      .outputMode(OutputMode.Append).start()
    // b0: intra-batch twin pair (1, 2); 3 shares nothing yet
    val b0 = Seq(SubDoc(1, "xxABCDEFGHxx"), SubDoc(2, "ABCDEFGHqq"),
      SubDoc(3, "zzzzzzzzzzzz"))
    // b1: 4 shares with 1 AND 2 (cross, lower-id side stored); 0 shares
    // with 3 (cross with the NEW doc as the lower id — orientation);
    // 5 and 6 are an intra pair
    val b1 = Seq(SubDoc(4, "ppABCDEFGHpp"), SubDoc(0, "zzzzzzzzzz"),
      SubDoc(5, "WXYZ0123qqqq"), SubDoc(6, "rrWXYZ0123rr"))
    // b2: multi-diagonal repeats against stored docs
    val b2 = Seq(SubDoc(7, "zzzzzzzzzzzzzzz"))
    var seen = Seq.empty[SubDoc]
    try {
      for (b <- Seq(b0, b1, b2)) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val got = canon(VersionedTable.read(spark, outPath))
        assert(got == batchTruth(seen),
          s"gate runs != batch operator after ${seen.size} docs")
      }
    } finally q.stop()
    val afterStream = canon(VersionedTable.read(spark, outPath))
    assert(afterStream.nonEmpty)

    // replay of the last epoch: no new versions, identical bytes
    snk(b2.toDF(), 2L)
    assert(VersionedTable.versions(spark, outPath).size == 3)
    assert(canon(VersionedTable.read(spark, outPath)) == afterStream)

    // partial failure: batch 7's grams AND docs committed, runs did not
    // — the replay must pin the pre-batch snapshots (else the batch's
    // own grams in the index double-report its intra pair as cross)
    val b3 = Seq(SubDoc(8, "ABCDEFGH1234"), SubDoc(9, "ABCDEFGH1234"))
    val incB3 = b3.toDF().selectExpr("CAST(doc_id AS BIGINT) AS id",
      "text AS t")
    BucketedState.appendOnce(
      Dedup.gramFrame(incB3, L), gramsPath, 7L, "h", 32)
    BucketedState.appendOnce(incB3, docsPath, 7L, "id", 32)
    snk(b3.toDF(), 7L)
    assert(canon(VersionedTable.read(spark, outPath)) ==
      batchTruth(seen ++ b3),
      "partial-failure replay diverged from the batch prefix truth")

    // re-delivered id in a NEW batch (not a replay): the stored copy of
    // doc 1 must not pair with its own re-arrival — the batch operator
    // (doc_a < doc_b) never emits self-pairs, so the gate must not
    snk(Seq(SubDoc(1, "xxABCDEFGHxx")).toDF(), 9L)
    val self = VersionedTable.read(spark, outPath)
      .filter(org.apache.spark.sql.functions.col("doc_a") ===
        org.apache.spark.sql.functions.col("doc_b")).count()
    Dedup.releaseAll(spark)
    assert(self == 0L, s"re-delivered id produced $self self-pairs")
  }
}
