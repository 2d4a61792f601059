package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.athenaeum.SparkSpec

case class Ev(ts_us: Long, user_id: Long, event_type: String, value: Double)
case class Doc(doc_id: Long, text: String)

/** Structured Streaming specs: MemoryStream in → windowed aggs → memory
  * sink. Append-mode windows only emit once the watermark passes their
  * end, so each test feeds its events, then a far-future flush event in a
  * SECOND batch to advance the watermark and close the real windows —
  * exactly how late-data handling works in production. */
class EventStreamsSpec extends SparkSpec {

  private val H = 3600000000L // micros per hour
  private val Flush = Ev(1000 * H, 99, "flush", 0.0)

  /** Run two micro-batches (data, then watermark-advancing flush). */
  private def runWindowed(name: String, mem: MemoryStream[Ev],
      out: DataFrame, data: Seq[Ev]): Unit = {
    mem.addData(data: _*)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(Flush)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("streaming tumbling counts match event-time buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    runWindowed("tumb", mem, EventStreams.tumblingCounts(mem.toDF()), Seq(
      Ev(10L, 1, "click", 1.0), Ev(H - 1, 1, "click", 1.0),
      Ev(H + 5, 2, "view", 2.0)))
    val got = spark.table("tumb")
      .filter("event_type <> 'flush'")
      .select("wstart_s", "event_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "click", 2L), (3600L, "view", 1L)))
  }

  test("streaming sessions merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val G = 30L * 60 * 1000000 // 30 min gap
    runWindowed("sess", mem, EventStreams.sessions(mem.toDF()), Seq(
      Ev(0L, 7, "a", 0.0), Ev(G - 2, 7, "a", 0.0), // same session
      Ev(3 * G, 7, "a", 0.0), // new session
      Ev(0L, 8, "b", 0.0))) // other user
    val got = spark.table("sess")
      .filter("user_id <> 99")
      .select("user_id", "session_start_s", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 0L, 2L), (7L, 5400L, 1L), (8L, 0L, 1L)))
  }

  test("streaming sliding windows double-count on the overlap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    runWindowed("slide", mem, EventStreams.slidingCounts(mem.toDF()),
      Seq(Ev(H + 1, 1, "x", 0.0))) // 01:00:00.000001
    val got = spark.table("slide")
      .filter("event_type <> 'flush'")
      .select("wstart_s", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // windows [00:30,01:30) and [01:00,02:00) both contain it
    assert(got == Set((1800L, 1L), (3600L, 1L)))
  }

  test("stream-stream join pairs events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = EventStreams.correlate(clicks.toDF(), buys.toDF(),
      boundSeconds = 1800)
    val q = joined.writeStream.format("memory").queryName("corr")
      .outputMode(OutputMode.Append).start()
    try {
      // realistic (2024) event times: near-epoch-zero timestamps get
      // silently dropped by the watermark/time-bound range filters,
      // whose lower bounds fall before the epoch
      val B = 1704067200000000L // 2024-01-01 00:00:00 in micros
      clicks.addData(Ev(B, 1, "click", 0), Ev(B, 2, "click", 0))
      buys.addData(
        Ev(B + 60L * 1000000, 1, "buy", 0), // 1 min after click: in
        Ev(B + 3000L * 1000000, 1, "buy", 0), // 50 min after: out of bound
        Ev(B + 10L * 1000000, 3, "buy", 0)) // no matching user: out
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("corr").select("l_user", "r_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "buy")))
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(Ev(10 * H, 1, "on_time", 1.0))
    val out = EventStreams.tumblingCounts(mem.toDF(), watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable() // watermark -> 9h
      mem.addData(Ev(H, 1, "too_late", 1.0)) // hours behind the watermark
      q.processAllAvailable()
      mem.addData(Flush)
      q.processAllAvailable()
    } finally q.stop()
    val types = spark.table("late").select("event_type").collect()
      .map(_.getString(0)).toSet
    assert(types.contains("on_time") && !types.contains("too_late"))
  }

  test("streaming DSIR gate reproduces batch weights bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (model, default) = TextAnalysis.dsirModelCompiled(
      docs, "doc_id", "text", col("lang") === "en")
    assert(model.nonEmpty && default > 0)
    val batch = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val sample = docs.select("doc_id", "text").as[Doc].collect().take(20)
    val mem = MemoryStream[Doc]
    mem.addData(sample: _*)
    val out = EventStreams.dsirGate(mem.toDF(), "doc_id", "text",
      model, default)
    val q = out.writeStream.format("memory").queryName("dsir")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = sample.flatMap(d => batch.get(d.doc_id).map(d.doc_id -> _))
    assert(expected.nonEmpty)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: stream ${got(id)} != batch $exp")
    }
    // the gate actually gates: a threshold above some observed weight
    // must drop those docs and keep the rest
    val ws = got.values.map(_._2).toSeq.sorted
    val thr = ws(ws.size / 2)
    val mem2 = MemoryStream[Doc]
    mem2.addData(sample: _*)
    val gated = EventStreams.dsirGate(mem2.toDF(), "doc_id", "text",
      model, default, minW = thr)
    val q2 = gated.writeStream.format("memory").queryName("dsir_gated")
      .outputMode(OutputMode.Append).start()
    try q2.processAllAvailable() finally q2.stop()
    val kept = spark.table("dsir_gated").collect().map(_.getLong(0)).toSet
    assert(kept == got.filter(_._2._2 >= thr).keySet)
  }

  test("streaming decontamination gate: batch-flagged docs never pass, clean docs do") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_distinct, col, explode}
    import graft.operators.{Bloom, TextAnalysis}
    import graft.functions.GraftFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    // offline step: the benchmark's distinct 5-gram hashes -> Bloom mask
    val benchGrams = bench.select(explode(array_distinct(
      GraftFunctions.shingleHashes(col("text"), 5))).as("gh")).distinct()
    val mask = Bloom.buildMask(benchGrams, "gh", 1 << 20, 5)
    // batch truth: every doc the batch operator flags as sharing >= 1
    // benchmark n-gram (same polyHash family as the gate)
    val flagged = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "fixture must contain contaminated docs")
    val sample = corpus.select("doc_id", "text").as[Doc].collect()
    val mem = MemoryStream[Doc]
    mem.addData(sample: _*)
    val out = EventStreams.decontamGate(mem.toDF(), "doc_id", "text",
      mask, k = 5)
    val q = out.writeStream.format("memory").queryName("decontam")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("decontam").collect().map(_.getLong(0)).toSet
    // the hard guarantee: contamination can never slip past the gate
    // (Bloom has no false negatives on the benchmark's grams)
    assert(kept.intersect(flagged).isEmpty)
    // and at 2^20 bits no clean doc false-positives into a drop
    assert(kept == sample.map(_.doc_id).toSet -- flagged)
  }

  test("streaming blocklist gate agrees bit-for-bit with the batch expression") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{aggregate, col, lit}
    import graft.functions.GraftFunctions
    val pats = Seq("a", "slow scan", "hash join")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // batch truth: total occurrences per doc via the same expression
    val batch = docs
      .withColumn("n", aggregate(
        GraftFunctions.multiCount(col("text"), pats), lit(0L), (a, c) => a + c))
      .select("doc_id", "n").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val sample = docs.select("doc_id", "text").as[Doc].collect().take(40)
    // cap chosen from the batch truth so BOTH keep and drop paths fire
    val counts = sample.map(d => batch(d.doc_id))
    assert(counts.min < counts.max, "fixture must have count spread")
    val mh = (counts.min + counts.max) / 2 + 1
    val mem = MemoryStream[Doc]
    mem.addData(sample: _*)
    val out = EventStreams.blocklistGate(mem.toDF(), "doc_id", "text",
      pats, maxHits = mh)
    val q = out.writeStream.format("memory").queryName("blockgate")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("blockgate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivors = exactly the sample docs under the cap, with batch counts
    val expected = sample.map(d => d.doc_id -> batch(d.doc_id))
      .filter(_._2 < mh).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.size < sample.size,
      "fixture must exercise both keep and drop paths")
  }
}
