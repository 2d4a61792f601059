package graft.athenaeum

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.NullNode
import scala.jdk.CollectionConverters._

/** String encoder byte-compatible with Python's
  * `json.dumps(s, ensure_ascii=True)` (the reference serializes every
  * string through it — `sql-to-json:397-438`): `\b \f \n \r \t` escape
  * shortcuts, `\u00xx` for remaining control chars, and `\uxxxx` for
  * EVERY char above 0x7E. Non-BMP chars are UTF-16 surrogate pairs in a
  * Scala String, so each half escapes separately — exactly json.dumps'
  * surrogate-pair output (verified against CPython). */
private[athenaeum] object PyJson {
  def dumps(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\b' => "\\b"
      case '\f' => "\\f"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

/** AST mirroring the reference front end's JSON output
  * (`sql-to-json:135-245`): a single SELECT over FROM tables with a flat
  * AND-list of comparisons. GROUP BY / COUNT / SUM exist in the grammar as
  * reserved words but are disabled in the reference (`sql-to-json:146-149,
  * 175-181`); we light them up behind the same shapes (SURVEY §7 phase D).
  */
object Ast {

  case class ColumnRef(name: String, table: Option[String])

  sealed trait Term
  case class ColTerm(ref: ColumnRef) extends Term
  case class IntLit(value: Long) extends Term
  case class StrLit(value: String) extends Term

  sealed trait SelectorSource
  case class ColSource(ref: ColumnRef) extends SelectorSource
  case object CountSource extends SelectorSource
  case class SumSource(ref: ColumnRef) extends SelectorSource

  case class Selector(source: SelectorSource, as: Option[String])
  case class TableRef(file: String, as: Option[String])
  case class Comparison(op: String, left: Term, right: Term)

  /** Extension (with GROUP BY): one ORDER BY key — the referenced
    * column must name an output header. */
  case class OrderKey(ref: ColumnRef, desc: Boolean)

  case class SelectQuery(
      select: Seq[Selector],
      from: Seq[TableRef],
      where: Seq[Comparison],
      groupBy: Seq[ColumnRef] = Nil,
      orderBy: Seq[OrderKey] = Nil,
      limit: Option[Long] = None)

  // ---------------- JSON decode (S3: database.py:129-137) ----------------

  private val mapper = new ObjectMapper()

  def fromJson(text: String): SelectQuery = {
    val root = mapper.readTree(text)
    SelectQuery(
      select = root.get("select").elements.asScala.map(decodeSelector).toSeq,
      from = root.get("from").elements.asScala.map(decodeTableRef).toSeq,
      where = Option(root.get("where")).map(
        _.elements.asScala.map(decodeComparison).toSeq).getOrElse(Nil),
      groupBy = Option(root.get("group_by")).map(
        _.elements.asScala.map(decodeColumnRef).toSeq).getOrElse(Nil),
      orderBy = Option(root.get("order_by")).map(
        _.elements.asScala.map(n => OrderKey(
          decodeColumnRef(n.get("column")),
          n.get("desc").asBoolean)).toSeq).getOrElse(Nil),
      limit = opt(root.get("limit")).map(_.asLong))
  }

  private def opt(n: JsonNode): Option[JsonNode] =
    Option(n).filterNot(_.isInstanceOf[NullNode])

  private def decodeColumnRef(n: JsonNode): ColumnRef =
    ColumnRef(n.get("name").asText,
      opt(n.get("table")).map(_.asText))

  private def decodeSelector(n: JsonNode): Selector = {
    val src = n.get("source")
    val source =
      if (src.has("column")) ColSource(decodeColumnRef(src.get("column")))
      else if (src.has("count")) CountSource
      else if (src.has("sum")) SumSource(decodeColumnRef(src.get("sum")))
      else throw new IllegalArgumentException(s"unknown selector: $src")
    Selector(source, opt(n.get("as")).map(_.asText))
  }

  private def decodeTableRef(n: JsonNode): TableRef =
    TableRef(n.get("source").get("file").asText,
      opt(n.get("as")).map(_.asText))

  private def decodeComparison(n: JsonNode): Comparison =
    Comparison(n.get("op").asText, decodeTerm(n.get("left")),
      decodeTerm(n.get("right")))

  private def decodeTerm(n: JsonNode): Term =
    if (n.has("column")) ColTerm(decodeColumnRef(n.get("column")))
    else if (n.has("lit_int")) IntLit(n.get("lit_int").asLong)
    else if (n.has("lit_str")) StrLit(n.get("lit_str").asText)
    else throw new IllegalArgumentException(s"unknown term: $n")

  // ------------- JSON encode, byte-equal to `dump` -------------
  // (sql-to-json:397-438: 4-space indent; `Line`-marked nodes — column
  // refs, file sources — render single-line with ", "/": " separators.)

  def toJson(q: SelectQuery): String = {
    val sb = new StringBuilder
    def jstr(s: String): String = PyJson.dumps(s)
    def inline(ref: ColumnRef): String =
      s"""{"name": ${jstr(ref.name)}, "table": ${ref.table.map(jstr).getOrElse("null")}}"""
    def inlineTerm(t: Term): String = t match {
      case ColTerm(r) => s"""{"column": ${inline(r)}}"""
      case IntLit(v) => s"""{"lit_int": $v}"""
      case StrLit(v) => s"""{"lit_str": ${jstr(v)}}"""
    }
    def inlineSource(s: SelectorSource): String = s match {
      case ColSource(r) => s"""{"column": ${inline(r)}}"""
      case CountSource => """{"count": null}"""
      case SumSource(r) => s"""{"sum": ${inline(r)}}"""
    }
    def obj(prefix: String, fields: Seq[(String, String)]): String =
      fields.map { case (k, v) => s"""$prefix    ${jstr(k)}: $v""" }
        .mkString("{\n", ",\n", s"\n$prefix}")
    def arr(prefix: String, items: Seq[String]): String =
      if (items.isEmpty) "[]"
      else items.map(i => s"$prefix    $i").mkString("[\n", ",\n", s"\n$prefix]")

    val p1 = "    "
    val selectors = q.select.map { sel =>
      obj(p1 + "    ", Seq(
        "source" -> inlineSource(sel.source),
        "as" -> sel.as.map(jstr).getOrElse("null")))
    }
    val froms = q.from.map { tr =>
      obj(p1 + "    ", Seq(
        "source" -> s"""{"file": ${jstr(tr.file)}}""",
        "as" -> tr.as.map(jstr).getOrElse("null")))
    }
    val wheres = q.where.map { c =>
      obj(p1 + "    ", Seq(
        "op" -> jstr(c.op),
        "left" -> inlineTerm(c.left),
        "right" -> inlineTerm(c.right)))
    }
    // extension fields appear ONLY when present, so reference queries
    // keep dumping byte-identically to the reference's `dump`
    val extLines = Seq(
      Option.when(q.groupBy.nonEmpty)(
        s""""group_by": ${arr(p1, q.groupBy.map(inline))}"""),
      Option.when(q.orderBy.nonEmpty)(
        s""""order_by": ${arr(p1, q.orderBy.map(k =>
          s"""{"column": ${inline(k.ref)}, "desc": ${k.desc}}"""))}"""),
      q.limit.map(n => s""""limit": $n""")).flatten
    sb.append("{\n")
    sb.append(s"""    "select": ${arr(p1, selectors)},\n""")
    sb.append(s"""    "from": ${arr(p1, froms)},\n""")
    sb.append(s"""    "where": ${arr(p1, wheres)}""")
    extLines.foreach(l => sb.append(s",\n    $l"))
    sb.append("\n}\n")
    sb.toString
  }
}
