package graft.operators

import graft.athenaeum.SparkSpec

/** As-of semantics on interleaved synthetic data (the parquet testdata
  * has all orders before all events, which only exercises the degenerate
  * "latest ref wins" case — here we pin before/after/tie behavior). */
class AsOfJoinSpec extends SparkSpec {

  test("asOf picks the most recent right row at or before each left time") {
    import spark.implicits._
    val right = Seq( // (key, time, ref)
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 15L, 200L)
    ).toDF("k", "t", "ref")
    val left = Seq( // (key, time, id)
      (1L, 5L, 1L), // before any right row -> dropped (inner as-of)
      (1L, 10L, 2L), // tie -> inclusive match to ref@10
      (1L, 25L, 3L), // between 20 and 30 -> ref@20
      (1L, 99L, 4L), // after all -> ref@30
      (2L, 15L, 5L), // tie on other key
      (3L, 50L, 6L) // key with no right rows -> dropped
    ).toDF("k", "t", "id")
    val got = AsOfJoin.asOf(left, "k", "t", "id", right, "k", "t", "ref")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (2L, 1L, 100L), (3L, 1L, 101L), (4L, 1L, 102L), (5L, 2L, 200L)))
  }

  test("ties among right rows at the same (key, time) pick max ref") {
    import spark.implicits._
    val right = Seq((1L, 10L, 100L), (1L, 10L, 107L)).toDF("k", "t", "ref")
    val left = Seq((1L, 11L, 1L)).toDF("k", "t", "id")
    val got = AsOfJoin.asOf(left, "k", "t", "id", right, "k", "t", "ref")
      .collect().map(_.getLong(2)).toSeq
    assert(got == Seq(107L))
  }
}
