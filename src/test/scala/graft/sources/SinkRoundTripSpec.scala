package graft.sources

import graft.athenaeum.SparkSpec

/** Source/sink breadth: CSV and JSON-lines round trips preserve data
  * (schema supplied on read — header inference would widen types). */
class SinkRoundTripSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("orc round trip preserves rows and values") {
    val orders = Tables(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val out = java.nio.file.Files.createTempDirectory("orc").toString + "/o"
    orders.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("from_xml parses typed structs out of an XML column") {
    import org.apache.spark.sql.functions.{col, expr}
    val withXml = Tables(spark, dir, "orders").limit(100)
      .selectExpr("o_orderkey",
        """concat('<o><k>', o_orderkey, '</k><s>', o_orderstatus, '</s></o>')
           AS xml""")
      .withColumn("parsed",
        expr("from_xml(xml, 'k BIGINT, s STRING')"))
      .select(col("o_orderkey"), col("parsed.k").as("k"),
        col("parsed.s").as("s"))
    assert(withXml.filter("o_orderkey <> k").count() == 0)
    assert(withXml.filter("s IS NULL").count() == 0)
  }

  test("csv round trip preserves rows and values") {
    val orders = Tables(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val out = java.nio.file.Files.createTempDirectory("csv").toString + "/o"
    orders.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(orders.schema)
      .option("header", "true").csv(out)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
    assert(orders.exceptAll(back).count() == 0)
  }

  test("json-lines round trip preserves rows and values") {
    val nation = Tables(spark, dir, "nation")
    val out = java.nio.file.Files.createTempDirectory("json").toString + "/n"
    nation.write.mode("overwrite").json(out)
    val back = spark.read.schema(nation.schema).json(out)
    assert(back.exceptAll(nation).count() == 0)
    assert(nation.exceptAll(back).count() == 0)
  }

  test("parquet sink with compression codec") {
    val li = Tables(spark, dir, "lineitem").limit(100)
    val out = java.nio.file.Files.createTempDirectory("pq").toString + "/li"
    li.write.mode("overwrite").option("compression", "zstd").parquet(out)
    assert(spark.read.parquet(out).count() == 100)
  }
}
