package graft.athenaeum

import org.apache.spark.sql.DataFrame
import Analyzer.OutCol

/** W1/W2 presentation operator (`database.py:791-882`): aligned
  * `|`-separated text. Column width = max(header length, widest displayed
  * value); ints right-align, strings left-align (Python `str.format`
  * defaults); cells joined with " | "; line 2 is a dash rule as long as
  * the header row. Row order is unspecified by the reference
  * (`README.md:13`); we emit collect() order.
  */
object TextFormatter {

  def render(df: DataFrame, output: Seq[OutCol]): String = {
    val rows = df.collect()
    val cells: Array[Array[String]] = rows.map(_.toSeq.map {
      case l: Long => l.toString
      case s: String => s
      case other => String.valueOf(other)
    }.toArray)
    val headers = output.map(_.header)
    val widths = headers.zipWithIndex.map { case (h, i) =>
      (h.length +: cells.map(_(i).length).toSeq).max
    }
    def fmtRow(vals: Seq[String], byType: Boolean): String =
      vals.zipWithIndex.map { case (v, i) =>
        val w = widths(i)
        val rightAlign = byType && output(i).isInt
        if (rightAlign) v.reverse.padTo(w, ' ').reverse
        else v.padTo(w, ' ')
      }.mkString(" | ")
    val headerRow = fmtRow(headers, byType = false)
    val sb = new StringBuilder
    sb.append(headerRow).append('\n')
    sb.append("-" * headerRow.length).append('\n')
    cells.foreach(r => sb.append(fmtRow(r.toSeq, byType = true)).append('\n'))
    sb.toString
  }
}
