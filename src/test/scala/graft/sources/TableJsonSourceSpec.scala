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

  test("large file: multi-slice scan still parses the file once per JVM") {
    val f = java.io.File.createTempFile("graft-big", ".table.json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.print("""[[["id", "int"], ["name", "str"]]""")
    (0 until 40000).foreach(i =>
      w.print(s""",[$i, "padding-to-push-the-file-over-the-1mb-threshold-$i"]"""))
    w.print("]")
    w.close()
    assert(f.length() > (1 << 20))
    val before = graft.sources.tablejson.TableJsonIO.parseCount.get()
    val df = spark.read.format("tablejson").load(f.getAbsolutePath)
    assert(df.rdd.getNumPartitions > 1) // the slicing is real
    assert(df.count() == 40000)
    assert(df.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) == 40000L * 39999 / 2)
    val parses =
      graft.sources.tablejson.TableJsonIO.parseCount.get() - before
    assert(parses == 1, s"expected 1 parse, saw $parses")
  }

  test("small file gets a single partition") {
    assert(cities.rdd.getNumPartitions == 1)
  }

  test("comparison filters push into the scan and are not re-evaluated") {
    val filtered = cities.filter("population > 5000 AND name < 'T'")
    val scan = filtered.queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.contains("GreaterThan(population,5000)"), scan)
    assert(scan.contains("LessThan(name,T)"), scan)
    // the planned filter node above the scan carries NO residual copy of
    // the pushed comparisons (they were accepted, not merely advertised)
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert(!plan.contains("population > 5000"), plan)
    // results match driver-side evaluation of the same predicate
    val expect = cities.collect()
      .filter(r => r.getLong(2) > 5000 && r.getString(0) < "T")
      .map(_.getString(0)).toSet
    assert(filtered.collect().map(_.getString(0)).toSet == expect)
    assert(expect.nonEmpty)
  }

  test("limit pushes into the scan; post-filter semantics hold") {
    val limited = cities.limit(3)
    val scan = limited.queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.contains("PushedLimit: 3"), scan)
    assert(limited.count() == 3)
    // pushed filter + pushed limit: the reader emits `limit` SURVIVING
    // rows, so the result is exactly limit rows, all passing
    val both = cities.filter("population > 1000").limit(2).collect()
    assert(both.length == 2 && both.forall(_.getLong(2) > 1000))
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
