package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING — assign items (documents, by token count) to
  * fixed-capacity bins (training context windows): the packing pass a
  * pretraining pipeline runs after cleaning/dedup so short documents
  * share context windows instead of paying padding
  * (`q_padding_waste` measures the cost this operator removes).
  *
  * Semantics: PARTITION-LOCAL NEXT-FIT, fully deterministic — items
  * split by `pmod(id, splits)`, ordered by id within each split, and
  * folded left: an item goes into the current bin when it fits,
  * else opens the next one; an item larger than the capacity gets a
  * bin of its own. Bins never cross splits, so the result is a pure
  * function of (ids, weights, capacity, splits) — hash-checkable
  * against an oracle, stable under any physical partitioning.
  *
  * Scale shape: one hash aggregation on the split key; each split's
  * fold is a single codegen'd `aggregate` HOF over that split's
  * collected (id, weight) list — size the split count so a split's
  * items fit comfortably in an executor row (at 100 TB: splits ≈
  * rows / 10k keeps every fold bounded while the greedy stays local).
  * Per-split next-fit is the standard distributed compromise: a
  * GLOBAL first-fit-decreasing would serialize the whole corpus
  * through one state, and its quality edge over local next-fit is a
  * few percent of padding on Zipfian length distributions. The same
  * operator packs FILES into compaction groups (weight = bytes). */
object Packing {

  /** Per-item bin assignment: (idCol, weight, pack_split, pack_bin),
    * with pack_bin globally unique as split·1e6 + local bin (requires
    * < 1e6 bins per split — enforced by the fold). */
  def nextFit(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long, splits: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(splits > 0, s"splits must be positive, got $splits")
    val items = df.select(col(idCol).cast("long").as("__id"),
        col(weightCol).cast("long").as("__w"))
      .withColumn("__split", pmod(col("__id"), lit(splits.toLong)))
    val packed = items
      .groupBy(col("__split"))
      // sort_array on (id, weight) structs orders by id first — the
      // deterministic fold order
      .agg(sort_array(collect_list(struct(col("__id"), col("__w"))))
        .as("__items"))
      .withColumn("__packed", expr(
        s"""aggregate(__items,
           |  struct(CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS used,
           |         CAST(array() AS ARRAY<STRUCT<id: BIGINT, w: BIGINT,
           |                                      bin: BIGINT>>) AS out),
           |  (st, x) -> CASE
           |    WHEN st.used > 0 AND st.used + x.__w > ${capacity}L THEN
           |      struct(
           |        IF(st.bin + 1L < 1000000L, st.bin + 1L,
           |           CAST(raise_error('Packing.nextFit: more than 1e6 bins
           | in one split — raise the splits argument') AS BIGINT)) AS bin,
           |        x.__w AS used,
           |        array_append(st.out,
           |          struct(x.__id AS id, x.__w AS w, st.bin + 1L AS bin))
           |          AS out)
           |    ELSE struct(st.bin AS bin, st.used + x.__w AS used,
           |        array_append(st.out,
           |          struct(x.__id AS id, x.__w AS w, st.bin AS bin))
           |          AS out)
           |  END,
           |  st -> st.out)""".stripMargin.replace("\n ", " ")))
      .select(col("__split"), explode(col("__packed")).as("__p"))
    packed.select(col("__p.id").as(idCol),
      col("__p.w").as(weightCol),
      col("__split").as("pack_split"),
      (col("__split") * 1000000L + col("__p.bin")).as("pack_bin"))
  }

  /** Bin-level readout over [[nextFit]]: per split, bin count, item
    * count, token sum, and the padding the packing leaves on the table
    * (capacity − fill, counting an oversized single-item bin as zero
    * waste — it pays truncation, not padding). The go/no-go metric for
    * a capacity/splits choice. */
  def packStats(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long, splits: Int): DataFrame =
    nextFit(df, idCol, weightCol, capacity, splits)
      .groupBy(col("pack_split"), col("pack_bin"))
      .agg(count(lit(1)).as("n_items"), sum(col(weightCol)).as("fill"))
      .groupBy(col("pack_split"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_items")).as("n_items"),
        sum(col("fill")).as("total_weight"),
        sum(greatest(lit(0L), lit(capacity) - col("fill")))
          .as("padding_waste"))
}
