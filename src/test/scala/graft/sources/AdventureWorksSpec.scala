package graft.sources

import graft.athenaeum.SparkSpec

/** Robustness sweep over the reference's LARGEST shipped workload: all 58
  * AdventureWorks `.table.json` files (~21 MB, 244k rows — see
  * BASELINE.md). Every file must load through the DataSourceV2 with a
  * parsed schema, scan cleanly (count + a per-column touch), and agree
  * with the column-pruned read — catching format edge cases (hex blobs
  * stored as str, empty strings, large ints, wide rows) the 16-row
  * goldens can't. */
class AdventureWorksSpec extends SparkSpec {

  private val dir = new java.io.File("/root/reference/tables")

  test("all 58 reference tables load, scan, and prune") {
    val files = dir.listFiles().filter(_.getName.endsWith(".table.json"))
      .sortBy(_.getName)
    assert(files.length == 58)
    var totalRows = 0L
    files.foreach { f =>
      val df = spark.read.format("tablejson").load(f.getAbsolutePath)
      val schema = df.schema
      assert(schema.fields.nonEmpty, s"${f.getName}: empty schema")
      val n = df.count()
      totalRows += n
      // column-pruned scan returns the same row count as the full scan
      val firstCol = schema.fields.head.name
      assert(df.select(firstCol).count() == n, s"${f.getName}: prune drift")
    }
    // the reference's documented workload size (BASELINE.md): 244,299 rows
    assert(totalRows == 244299L, s"total rows: $totalRows")
  }

  test("spot-check values survive the int/str typing") {
    val addr = spark.read.format("tablejson")
      .load("/root/reference/tables/address.table.json")
    assert(addr.filter("address_id IS NULL").count() == 0)
    val n = addr.count()
    assert(addr.select("address_id").distinct().count() == n)
  }
}
