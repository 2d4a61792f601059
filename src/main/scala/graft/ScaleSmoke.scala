package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-amplified smoke: materialize a K× corpus from an sf dir by
  * shifted-key unions into a SCRATCH dir (the read-only /root/testdata is
  * never touched), then time the bench HEADLINE subset against both dirs
  * in one JVM and print the wall-time ratio per query.
  *
  * What it catches that plan audits cannot: a stage that is accidentally
  * single-partition or quadratic shows up as a ratio far above K — as
  * WALL TIME, not a log warning. Interpretation notes:
  *   - keys shift by a multiple of 10, so `doc_id % 10` ingest slices and
  *     mod-based cohort splits keep their semantics in every copy;
  *   - text/embedding payloads replicate VERBATIM, so the K× corpus has
  *     K× exact duplication — dedup/similarity queries legitimately emit
  *     ~K²-ish pair counts (each doc gains K-1 twins). For those, read
  *     the ratio against the printed output-row growth: superlinear time
  *     WITH superlinear output is the corpus, superlinear time with
  *     linear output is a bug.
  *
  * Usage: runMain graft.ScaleSmoke [srcDir] [outDir] [K]
  * Results are recorded in SCALE.md per round. */
object ScaleSmoke {

  // divisible by 10 (mod-10 slice classes) and far above any sf key
  private val OFF = 100000000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** K disjoint copies of every table, copy i's keys shifted by i·OFF —
    * foreign keys shift together, so each copy is referentially intact.
    * Dimension tables (region/nation) stay single: their keys are
    * referenced unshifted from every copy. */
  private def amplify(spark: SparkSession, src: String, out: String,
      k: Int): Unit =
    keyCols.foreach { case (tbl, keys) =>
      val base = spark.read.parquet(s"$src/$tbl.parquet")
      val amped =
        if (keys.isEmpty) base
        else (0 until k).map { i =>
          keys.foldLeft(base)((d, c) =>
            d.withColumn(c, col(c) + lit(i * OFF)))
        }.reduce(_.unionAll(_))
      amped.write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale10x"
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-scale-smoke", cpus.toInt)
      .config("spark.ui.enabled", "false")
      // the nanos-typed events.parquet variant (see Tables.apply) would
      // otherwise fail schema resolution on the raw read in amplify
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the marker encodes src AND K: a re-run against a different source
    // or factor must re-amplify, and stale markers from other configs
    // are swept so they can never validate the wrong corpus
    val cfg = s"${src.replaceAll("[^A-Za-z0-9]", "_")}_x$k"
    val marker = new java.io.File(s"$out/_AMPLIFIED_OK_$cfg")
    if (!marker.exists()) {
      amplify(spark, src, out, k)
      Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("_AMPLIFIED_OK_"))
        .foreach(_.delete())
      marker.createNewFile()
    }
    def run(name: String, dir: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.releaseAll(spark)
      (rows, dt)
    }
    println(f"[scale] ${"query"}%-24s ${"rows1x"}%10s ${"rowsKx"}%12s " +
      f"${"t1x_s"}%8s ${"tKx_s"}%8s ${"ratio"}%7s")
    val names = args.drop(3) match {
      case more if more.nonEmpty => more.toSeq
      case _ => Bench.headline
    }
    names.foreach { name =>
      // 1× first: warms codegen for the plan shape, so the K× run is
      // measured JIT-warm and the ratio reflects data volume only
      val (r1, t1) = run(name, src)
      val (rk, tk) = run(name, out)
      println(f"[scale] $name%-24s $r1%10d $rk%12d $t1%8.2f $tk%8.2f " +
        f"${tk / t1}%7.1f")
    }
    spark.stop()
  }
}
