package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: find records that refer to the same real-world entity
  * despite textual drift (typos, truncation, re-keying).
  *
  * Scale design: the classic two-phase shape — BLOCK then VERIFY. The
  * O(n²) comparison space is cut to within-block pairs by an equi-join
  * on cheap deterministic blocking keys (exactly the partitioning Spark
  * shuffles on, so blocks are processed in parallel and never
  * co-resident); the expensive string-distance verify runs only inside
  * blocks. Block-size skew is the operator's hotspot — choose blocking
  * keys with bounded fan-out (e.g. region + name prefix), the same
  * discipline as [[Dedup.minhashCandidates]]'s `maxBucket`.
  */
object Linkage {

  /** Self-linkage within one table: candidate pairs share every
    * `blockCols` value, verified by `levenshtein(name) <= maxEdit`
    * (codegen'd built-in — no UDF). Returns (id_a, id_b, edit_dist). */
  def linkWithin(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxEdit: Int): DataFrame = {
    def side(tag: String) = df.select(
      (col(idCol).as(s"id_$tag") +: col(nameCol).as(s"name_$tag") +:
        blockCols.map(col)): _*)
    val a = side("a")
    val b = side("b")
    val cond = blockCols.map(c => a(c) === b(c)).reduce(_ && _) &&
      (a("id_a") < b("id_b"))
    a.join(b, cond)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist") <= maxEdit)
  }
}
