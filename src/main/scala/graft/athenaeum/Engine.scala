package graft.athenaeum

import org.apache.spark.sql.SparkSession

/** Full pipeline: AST → load (S1/S2 + W3 messages) → analyze (§2.12
  * errors) → DataFrame composition → formatted text (W1). Mirrors the
  * reference's `execute_query` (`database.py:48-72`, pre-refactor path).
  */
object Engine {

  /** Run a query; returns stdout text (load lines + result table).
    * Throws EngineError for the reference's error surface. */
  def run(spark: SparkSession, baseDir: String, q: Ast.SelectQuery): String = {
    val sb = new StringBuilder
    val (all, actual) =
      Catalog.loadAll(spark, baseDir, q.from, m => sb.append(m).append('\n'))
    val resolved = Analyzer.analyze(all, q)
    val df = Executor.run(all, actual, resolved)
    sb.append(TextFormatter.render(df, resolved.output))
    sb.toString
  }

  /** Parse SQL text and run (front end S4 + engine). */
  def runSql(spark: SparkSession, baseDir: String, sql: String,
      extensions: Boolean = false): String =
    run(spark, baseDir, SqlParser.parse(sql, extensions))
}
