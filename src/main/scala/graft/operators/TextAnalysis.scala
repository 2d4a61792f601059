package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XFormulas._

/** Text-analysis operators for a training-data pipeline: token stats,
  * language-ID heuristic, quality scoring, document fingerprinting.
  * All pure `org.apache.spark.sql.functions` / SQL higher-order-function
  * compositions — no UDFs — so they stay in Tungsten and scale linearly
  * with a narrow (per-row) dependency: no shuffle at all.
  */
object TextAnalysis {

  /** Adds a `toks` column: lowercased whitespace tokens. */
  def withTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("toks", expr(sparkTokens(textCol)))

  /** Per-document token statistics. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(
      idCol,
      "CAST(size(toks) AS BIGINT) AS n_tokens",
      s"CAST(length($textCol) AS BIGINT) AS text_len",
      // exact: int sum cast to double, then one division
      "CAST(aggregate(toks, 0L, (acc, w) -> acc + length(w)) AS DOUBLE) / nullif(size(toks), 0) AS avg_token_len",
      s"CAST(${sparkStopHits("toks")} AS BIGINT) AS stop_hits")

  /** n-gram-free language-ID heuristic: stopword hits over the token set.
    * (A real pipeline would use char-n-gram profiles; the *shape* — a
    * per-row codegen'd expression, no shuffle — is the point.) */
  def langGuess(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(
      idCol,
      s"CASE WHEN ${sparkStopHits("toks")} >= 2 THEN 'en' " +
        s"WHEN ${sparkStopHits("toks")} >= 1 THEN 'maybe_en' " +
        "ELSE 'other' END AS lang_guess")

  /** Quality score in [0,1]: length saturation + stopword ratio + short-
    * token ratio, equally deterministic in Spark and DuckDB (identical
    * IEEE expression trees). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(
      idCol,
      "0.4 * least(CAST(size(toks) AS DOUBLE) / 50.0, 1.0) + " +
        s"0.3 * (CAST(${sparkStopHits("toks")} AS DOUBLE) / nullif(size(toks), 0)) + " +
        "0.3 * (CAST(size(filter(toks, w -> length(w) <= 5)) AS DOUBLE) / nullif(size(toks), 0)) " +
        "AS quality")

  /** Char-n-gram language-ID: per-occurrence density of high-frequency
    * English trigrams over the document's char trigrams. Still a pure
    * per-row codegen'd expression — no shuffle, no UDF — but a real
    * n-gram profile rather than the stopword shortcut in [[langGuess]].
    * Density thresholds calibrated on the synthetic corpus (median 0.039,
    * max 0.092). */
  def langCharNgram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("tris", expr(sparkCharTrigrams(s"lower($textCol)")))
      .selectExpr(
        idCol,
        s"CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) AS tri_score",
        s"CASE WHEN CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) >= 0.05 THEN 'en' " +
          s"WHEN CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) >= 0.02 THEN 'maybe_en' " +
          "ELSE 'other' END AS lang3")

  /** Polynomial rolling-hash fingerprint of the raw text (native
    * codegen'd expression; bit-identical to the XFormulas HOF form). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.GraftFunctions.polyHash(col(textCol)).as("fp"))
}
