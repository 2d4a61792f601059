package graft.functions

import org.apache.spark.sql.functions.col

import graft.athenaeum.SparkSpec
import graft.operators.Dedup
import graft.sources.Tables

/** End-user SQL ergonomics: a complete MinHash-LSH candidate pipeline
  * written in PURE SQL against the registered graft_* functions must
  * produce exactly the candidate set of the library's DataFrame path —
  * proof that the extension surface is usable from `spark.sql` alone
  * (a BI tool, a notebook, a SQL gateway), not only from Scala.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("MinHash-LSH candidates in pure SQL == Dedup.minhashCandidates") {
    GraftFunctions.register(spark)
    Tables(spark, dir, "documents").createOrReplaceTempView("docs_sql")
    val sql = spark.sql(
      """WITH sigs AS (
        |  SELECT doc_id, graft_minhash(graft_shingles(text, 3), 12) AS mh
        |  FROM docs_sql
        |),
        |buckets AS (
        |  SELECT doc_id, mh, band, graft_bandbucket(mh, band, 3) AS bucket
        |  FROM sigs LATERAL VIEW explode(sequence(0L, 3L)) AS band
        |)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM buckets a JOIN buckets b
        |  ON a.band = b.band AND a.bucket = b.bucket
        | AND a.doc_id < b.doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = Dedup.minhashCandidates(
      Tables(spark, dir, "documents"), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Dedup.releaseCaches()
    assert(sql == df,
      s"only-sql=${(sql -- df).take(5)} only-df=${(df -- sql).take(5)}")
  }
}
