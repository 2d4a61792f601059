package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-hardening join/layout techniques.
  *
  * These encode the three standard answers to "this join/scan melts at
  * 100 TB":
  *  - `saltedJoin`: a hot key floods one reducer in a shuffle join —
  *    spread each key over `buckets` salted sub-keys and replicate the
  *    small side per salt. Deterministic salt (hash of a disambiguating
  *    column, not rand()) so retries and AQE re-plans stay stable.
  *  - `writeBucketed`: co-locate both sides of a recurring join at WRITE
  *    time (bucketBy on the join key) — Spark then plans the join with
  *    zero Exchange on either side.
  *  - `writePartitioned`: directory-partition a fact table on a low-
  *    cardinality filter column so scans prune entire partitions.
  */
object ScaleJoins {

  /** Skew-resistant equi join of a big (possibly skewed) side with a
    * small-ish side. `saltCol` must be a column of `big` whose values
    * disambiguate rows within a key (any payload column works). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltCol: String): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltCol)), lit(buckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed on the join key; subsequent joins between
    * the saved tables shuffle nothing. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Directory-partitioned parquet sink for partition-pruned scans. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
