package graft.athenaeum

import scala.collection.mutable
import Ast._

/** Name resolution + validation replicating the reference's error surface
  * (SURVEY §2.12) ahead of Spark's own analyzer, so error text matches the
  * goldens (`database.py:231-421`) rather than AnalysisException.
  */
object Analyzer {

  case class ResolvedCol(table: String, column: String)

  sealed trait OutCol { def header: String; def isInt: Boolean }
  case class OutRef(ref: ResolvedCol, alias: Option[String], isInt: Boolean)
      extends OutCol {
    def header: String = alias.getOrElse(ref.column)
  }
  case class OutCount(alias: Option[String]) extends OutCol {
    def header: String = alias.getOrElse("count"); def isInt = true
  }
  case class OutSum(ref: ResolvedCol, alias: Option[String]) extends OutCol {
    def header: String = alias.getOrElse("sum"); def isInt = true
  }

  sealed trait RTerm
  case class RCol(ref: ResolvedCol) extends RTerm
  case class RLit(kind: String, intVal: Long, strVal: String) extends RTerm

  case class RComparison(op: String, left: RTerm, right: RTerm)

  case class Resolved(
      output: Seq[OutCol],
      comparisons: Seq[RComparison],
      groupBy: Seq[ResolvedCol],
      // extension (§2.7): (output header, descending) keys + row limit
      orderBy: Seq[(String, Boolean)] = Nil,
      limit: Option[Long] = None)

  type Registry = mutable.LinkedHashMap[String, RefTable]

  /** Column resolution exactly as the reference's three copies of the
    * logic (`database.py:244-263`, `database.py:354-368`,
    * `database.py:380-415`): qualified refs are checked against their
    * table; the ambiguity scan runs over ALL registry keys (file names AND
    * aliases — so `FROM cities AS a` makes unqualified `name` ambiguous
    * between "cities" and "a", as at HEAD); a unique match overrides the
    * qualifier. Table list in the ambiguity message is registry
    * (= FROM) order with quotes, matching `example-error-1.out`. */
  def resolve(all: Registry, ref: ColumnRef): ResolvedCol = {
    ref.table.foreach { t =>
      val known = all.get(t)
      if (known.isEmpty || !known.get.hasColumn(ref.name))
        throw EngineError(s"""ERROR: Column reference "${ref.name}" does not exist in table "$t"""")
    }
    val present = all.iterator.collect {
      case (key, tab) if tab.hasColumn(ref.name) => key
    }.toSeq
    if (ref.table.isEmpty && present.size > 1)
      throw EngineError(
        s"""ERROR: Column reference "${ref.name}" is ambiguous; present in multiple tables: ${present.map("\"" + _ + "\"").mkString(", ")}.""")
    if (ref.table.isEmpty && present.isEmpty)
      throw EngineError(
        s"""ERROR: Column reference "${ref.name}" does not exist in any table""")
    if (present.size == 1) ResolvedCol(present.head, ref.name)
    else ResolvedCol(ref.table.get, ref.name)
  }

  private def litKind(t: Term): String = t match {
    case IntLit(_) => "lit_int"
    case StrLit(_) => "lit_str"
    case _ => throw new IllegalStateException("not a literal")
  }

  private def litDisplay(t: Term): String = t match {
    case IntLit(v) => v.toString
    case StrLit(v) => v
    case _ => throw new IllegalStateException("not a literal")
  }

  private def toRLit(t: Term): RTerm = t match {
    case IntLit(v) => RLit("lit_int", v, null)
    case StrLit(v) => RLit("lit_str", 0, v)
    case _ => throw new IllegalStateException("not a literal")
  }

  private def reverseOp(op: String): String = op match {
    case "<" => ">"
    case ">" => "<"
    case "<=" => ">="
    case ">=" => "<="
    case other => other
  }

  /** `parse_where` (`database.py:266-346`): classify each clause, in
    * order, as join (both columns), filter (column vs literal, literal
    * flipped to the right with the operator reversed — F2), or the
    * literal-vs-literal error F5 (whose message prints the RIGHT literal
    * first, as the reference does). Type checks: F4 / J8. */
  def analyzeWhere(all: Registry, where: Seq[Comparison]): Seq[RComparison] =
    where.map { cmp =>
      (cmp.left, cmp.right) match {
        case (ColTerm(l), ColTerm(r)) =>
          val lc = resolve(all, l)
          val rc = resolve(all, r)
          if (all(lc.table).columnType(lc.column) !=
              all(rc.table).columnType(rc.column))
            throw EngineError("ERROR: Column join types are incompatible.")
          RComparison(cmp.op, RCol(lc), RCol(rc))
        case (ColTerm(l), lit) =>
          val lc = resolve(all, l)
          if (all(lc.table).columnType(lc.column) != litKind(lit))
            throw EngineError("ERROR: Column filter types are incompatible.")
          RComparison(cmp.op, RCol(lc), toRLit(lit))
        case (lit, ColTerm(r)) =>
          val rc = resolve(all, r)
          if (all(rc.table).columnType(rc.column) != litKind(lit))
            throw EngineError("ERROR: Column filter types are incompatible.")
          RComparison(reverseOp(cmp.op), RCol(rc), toRLit(lit))
        case (llit, rlit) =>
          throw EngineError(
            s"""Both sides of the filter are literals "${litDisplay(rlit)}" and "${litDisplay(llit)}"\n""")
      }
    }

  /** `parse_select` (`database.py:231-263`) + phase-D COUNT/SUM. */
  def analyzeSelect(all: Registry, select: Seq[Selector]): Seq[OutCol] =
    select.map { sel =>
      sel.source match {
        case ColSource(ref) =>
          val rc = resolve(all, ref)
          OutRef(rc, sel.as, all(rc.table).columnType(rc.column) == "lit_int")
        case CountSource => OutCount(sel.as)
        case SumSource(ref) =>
          val rc = resolve(all, ref)
          if (all(rc.table).columnType(rc.column) != "lit_int")
            throw EngineError("ERROR: Column filter types are incompatible.")
          OutSum(rc, sel.as)
      }
    }

  def analyze(all: Registry, q: SelectQuery): Resolved = {
    val comparisons = analyzeWhere(all, q.where)
    val output = analyzeSelect(all, q.select)
    val groupBy = q.groupBy.map(resolve(all, _))
    // Extension semantics (no reference counterpart): ORDER BY keys
    // reference OUTPUT HEADERS (alias if given, else bare/derived name)
    // so aggregate results are orderable; qualified refs are rejected —
    // headers are bare names by construction.
    val headers = output.map(_.header)
    val orderBy = q.orderBy.map { k =>
      if (k.ref.table.nonEmpty || !headers.contains(k.ref.name))
        throw EngineError(
          s"""ERROR: ORDER BY column "${k.ref.table.map(_ + ".").getOrElse("")}${k.ref.name}" is not in the select list.""")
      (k.ref.name, k.desc)
    }
    q.limit.foreach { n =>
      if (n < 0) throw EngineError(s"ERROR: LIMIT must be non-negative, got $n.")
    }
    Resolved(output, comparisons, groupBy, orderBy, q.limit)
  }
}
