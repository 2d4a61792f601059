package graft.athenaeum

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Engine-surfaced error: message goes to stderr, exit code 1
  * (`database.py:147-152`). */
case class EngineError(msg: String) extends RuntimeException(msg)

/** One loaded `.table.json` table (S1: `database.py:905-996`).
  *
  * The reference builds per-column distinct sets + a reverse index at load;
  * on Spark the cached DataFrame plus join-time hash tables are the
  * idiomatic equivalent (SURVEY §1), so we keep only schema metadata.
  * Column types are exactly "lit_int" (→ LongType: JSON table values are
  * unchecked bigints even though SQL literals cap at 2^31-1) and "lit_str"
  * (→ StringType). NULLs don't exist in the dialect → nullable=false.
  */
final class RefTable(
    val name: String,
    val columnNames: Seq[String],
    val columnTypes: Map[String, String], // name -> "lit_int" | "lit_str"
    val df: DataFrame,
    val rowCount: Int) {
  def hasColumn(c: String): Boolean = columnTypes.contains(c)
  def columnType(c: String): String = columnTypes(c)
}

object Catalog {
  private val mapper = new ObjectMapper()

  /** Load `<baseDir>/<name>.table.json`; emits the reference's
    * `- Loaded …` line via `onLoad` (W3: `database.py:990`). */
  def loadTable(spark: SparkSession, baseDir: String, name: String,
      onLoad: String => Unit): RefTable = {
    val fileName = s"$name.table.json"
    val path = java.nio.file.Paths.get(baseDir, fileName)
    val text =
      try new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      catch { case _: java.io.IOException =>
        throw EngineError(s"""Unable to read table "$fileName" from disk\n""")
      }
    val root = mapper.readTree(text)
    val header = root.get(0)
    if (header.get(0).size != 2)
      throw EngineError(s"""There was no header row defined for table "$name"""")
    val cols = header.elements.asScala.map { cm =>
      val cname = cm.get(0).asText
      val ctype = cm.get(1).asText match {
        case "int" => "lit_int"
        case "str" => "lit_str"
        case _ => throw EngineError("no column type")
      }
      (cname, ctype)
    }.toSeq
    val schema = StructType(cols.map { case (n, t) =>
      StructField(n, if (t == "lit_int") LongType else StringType,
        nullable = false)
    })
    val rows = (1 until root.size).map { i =>
      val arr = root.get(i)
      Row.fromSeq(cols.zipWithIndex.map { case ((_, t), j) =>
        if (t == "lit_int") arr.get(j).asLong else arr.get(j).asText
      })
    }
    onLoad(s"""- Loaded "$fileName", ${rows.size} rows.""")
    val df = spark.createDataFrame(rows.asJava, schema)
    new RefTable(name, cols.map(_._1), cols.toMap, df, rows.size)
  }

  /** `load_tables` (`database.py:192-228`): returns (allTables incl.
    * aliases, actualTables = effective FROM entries), both insertion-
    * ordered. `FROM t, t` dedupes to one instance (S2); duplicate alias
    * errors. */
  def loadAll(spark: SparkSession, baseDir: String,
      from: Seq[Ast.TableRef], onLoad: String => Unit)
      : (mutable.LinkedHashMap[String, RefTable],
         mutable.LinkedHashMap[String, RefTable]) = {
    val all = mutable.LinkedHashMap.empty[String, RefTable]
    val actual = mutable.LinkedHashMap.empty[String, RefTable]
    for (tr <- from) {
      val table = all.getOrElse(tr.file, {
        val t = loadTable(spark, baseDir, tr.file, onLoad)
        all(tr.file) = t
        t
      })
      tr.as match {
        case Some(alias) =>
          if (all.contains(alias))
            throw EngineError(
              s"""The table alias "$alias" has already been loaded""")
          all(alias) = table
          actual(alias) = table
        case None =>
          actual(tr.file) = table
      }
    }
    (all, actual)
  }
}
