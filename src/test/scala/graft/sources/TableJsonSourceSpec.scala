package graft.sources

import graft.athenaeum.SparkSpec

/** DataSourceV2 spec: the reference's `.table.json` files read as
  * first-class relations with schema inference and column pruning. */
class TableJsonSourceSpec extends SparkSpec {

  private def cities = spark.read.format("tablejson")
    .load(s"$goldenDir/cities.table.json")

  test("schema inferred from the header row (int -> bigint, str -> string)") {
    val s = cities.schema
    assert(s.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("name", "string"), ("country", "string"), ("population", "bigint")))
  }

  test("reads all rows with correct values") {
    assert(cities.count() == 16)
    val tokyo = cities.filter("name = 'Tokyo'").collect()(0)
    assert(tokyo.getString(1) == "Japan" && tokyo.getLong(2) == 13513L)
  }

  test("column pruning reaches the scan") {
    val pruned = cities.select("population")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("population") && !scan.contains("country"))
    assert(pruned.agg(org.apache.spark.sql.functions.sum("population"))
      .collect()(0).getLong(0) == 95687L)
  }

  test("joins against parquet relations work") {
    val countries = spark.read.format("tablejson")
      .load(s"$goldenDir/countries.table.json")
    val joined = cities.as("ci").join(countries.as("co"),
      org.apache.spark.sql.functions.col("ci.name") ===
        org.apache.spark.sql.functions.col("co.capital"))
    assert(joined.count() == 4)
  }
}
