package graft.athenaeum

import scala.collection.mutable.ArrayBuffer
import Ast._

/** Tokenizer + recursive-descent parser for the reference SQL dialect,
  * re-implemented from the grammar and error surface of
  * `sql-to-json:102-378`. Error messages and (line, col) positions are
  * byte-compatible with the reference.
  *
  * `extensions = true` additionally enables the productions the reference
  * ships commented out (`sql-to-json:146-149, 175-181`): `GROUP BY col,…`
  * and `COUNT` / `SUM(col)` selectors.
  */
object SqlParser {

  case class ParseException(line: Int, col: Int, message: String)
      extends RuntimeException(s"line $line, col $col: $message")

  private val IntLitMax = (1L << 31) - 1
  private val OpChars = Set('=', '!', '<', '>')
  private val Ops = Set("=", "!=", ">", ">=", "<", "<=")
  private val Keywords =
    Set("SELECT", "FROM", "WHERE", "GROUP", "BY", "COUNT", "SUM", "AS", "AND")
  /** Extension-only keywords (§2.7 sorts/limits): recognized solely when
    * `extensions = true`, so the reference tokenizer's behavior — an
    * uppercase non-keyword is an "invalid token" error — is preserved
    * byte-for-byte in reference mode. */
  private val ExtKeywords = Set("ORDER", "LIMIT", "ASC", "DESC")
  private val Delimiters = Set(".", ",", "(", ")")

  /** Token; `typ` uses the reference's names: a keyword/delimiter literal,
    * "ident", "op", "lit-str", "lit-int", "end". */
  case class Tok(line: Int, col: Int, typ: String, sval: String = null,
      ival: Long = 0)

  // JSON-style quoting used by the reference's `q()` (= json.dumps).
  private def q(s: String): String = PyJson.dumps(s)

  def tokenize(query: String, extensions: Boolean = false): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    var line = 1
    var colStart = 0
    def col(index: Int) = (index - colStart) + 1
    def err(index: Int, message: String) =
      throw ParseException(line, col(index), message)

    while (i <= query.length) {
      if (i >= query.length) {
        out += Tok(line, col(i), "end"); i += 1
      } else {
        val c = query(i)
        if (c == ' ') i += 1
        else if (c == '-') { // "--" comment to end of line
          i += 1
          if (i >= query.length || query(i) != '-')
            err(i - 1, "unexpected \"-\" (use \"--\" for comments)")
          var done = false
          while (!done) {
            i += 1
            if (i >= query.length || query(i) == '\n') done = true
          }
        }
        else if (c == '\n') { i += 1; line += 1; colStart = i }
        else if (c == '\r') i += 1
        else if (c.isDigit) {
          val start = i
          var done = false
          while (!done) {
            i += 1
            if (i >= query.length) done = true
            else {
              val cc = query(i)
              if (cc.isLetter || cc == '_')
                err(i, "invalid character suffixed on to integer literal")
              if (!cc.isDigit) done = true
            }
          }
          // Digit-by-digit fold via Character.digit so Unicode decimal
          // digits (category Nd) parse exactly like Python's int() in the
          // reference; Nd chars Java can't map (none in practice) get a
          // ParseException where the reference would crash with ValueError.
          val v = query.substring(start, i).foldLeft(BigInt(0)) { (acc, ch) =>
            val d = Character.digit(ch, 10)
            if (d < 0) err(start, s"invalid integer literal: " +
              q(query.substring(start, i)))
            acc * 10 + d
          }
          if (v > IntLitMax)
            err(start, s"integer literal too large: $v (max allowed: $IntLitMax)")
          out += Tok(line, col(start), "lit-int", ival = v.toLong)
        }
        else if (c == '"') {
          val start = i
          var done = false
          while (!done) {
            i += 1
            if (i >= query.length)
              err(start, "string literal goes unterminated to end of input")
            val cc = query(i)
            if (cc == '\n')
              err(start, "string literal goes unterminated to end of line")
            if (cc == '"') { i += 1; done = true }
            else if (cc < 32 || cc > 126)
              err(i, s"invalid character in string literal: ${q(cc.toString)}")
          }
          out += Tok(line, col(start), "lit-str",
            sval = query.substring(start + 1, i - 1))
        }
        else if (Delimiters(c.toString)) {
          out += Tok(line, col(i), c.toString); i += 1
        }
        else if (OpChars(c)) {
          val start = i
          var done = false
          while (!done) {
            i += 1
            if (i >= query.length || !OpChars(query(i))) done = true
          }
          val op = query.substring(start, i)
          if (!Ops(op)) err(start, s"invalid operator: ${q(op)}")
          out += Tok(line, col(start), "op", sval = op)
        }
        else if (c.isLetterOrDigit || c == '_') {
          val start = i
          var done = false
          while (!done) {
            i += 1
            if (i >= query.length) done = true
            else {
              val cc = query(i)
              if (!(cc.isLetterOrDigit || cc == '_')) done = true
            }
          }
          val v = query.substring(start, i)
          if (Keywords(v) || (extensions && ExtKeywords(v)))
            out += Tok(line, col(start), v)
          else if (v(0).isUpper)
            err(start, s"invalid token: ${q(v)}; it's not a keyword but it " +
              "starts with an upper-case letter; only keywords can start " +
              "with an upper-case letter")
          else out += Tok(line, col(start), "ident", sval = v)
        }
        else err(i, s"unexpected character ${q(c.toString)}")
      }
    }
    out.toVector
  }

  private def typToFriendly(typ: String): String =
    if (Keywords(typ) || ExtKeywords(typ) || Ops(typ) || Delimiters(typ))
      "\"" + typ + "\""
    else typ match {
      case "ident" => "identifier"
      case "op" => "a comparison operator"
      case "end" => "the end of input"
      case "lit-str" => "a string literal"
      case "lit-int" => "an integer literal"
    }

  private def tokToFriendly(t: Tok): String =
    if (Keywords(t.typ) || ExtKeywords(t.typ) || Ops(t.typ) ||
        Delimiters(t.typ)) "\"" + t.typ + "\""
    else t.typ match {
      case "ident" => s"""identifier "${t.sval}""""
      case "op" => s""""${t.sval}""""
      case "end" => "the end of input"
      case "lit-str" => s"""string literal "${t.sval}""""
      case "lit-int" => s"integer literal ${t.ival}"
    }

  def parse(sql: String, extensions: Boolean = false): SelectQuery =
    new P(tokenize(sql, extensions), extensions).pSelect()

  private final class P(tokens: Vector[Tok], extensions: Boolean) {
    private var i = 0
    private def peek: Tok = tokens(i)
    private def check(typ: String): Option[Tok] = {
      val t = tokens(i)
      if (t.typ != typ) None else { i += 1; Some(t) }
    }
    private def expect(typ: String): Tok = {
      val t = tokens(i)
      if (t.typ != typ) throw fail(Some(typToFriendly(typ)))
      i += 1; t
    }
    private def fail(expected: Option[String] = None): ParseException = {
      val t = tokens(i)
      val got = tokToFriendly(t)
      expected match {
        case Some(e) => ParseException(t.line, t.col, s"expected $e, got $got")
        case None => ParseException(t.line, t.col, s"not expecting $got")
      }
    }

    def pSelect(): SelectQuery = {
      expect("SELECT")
      val selectors = pSeparated(",", () => pSelector())
      expect("FROM")
      val fromTables = pSeparated(",", () => pTableRef())
      val whereClauses =
        if (check("WHERE").isDefined) pSeparated("AND", () => pComparison())
        else Nil
      val groupBy =
        if (extensions && check("GROUP").isDefined) {
          expect("BY"); pSeparated(",", () => pColumnRef())
        } else Nil
      val orderBy =
        if (extensions && check("ORDER").isDefined) {
          expect("BY")
          pSeparated(",", () => {
            val ref = pColumnRef()
            val desc =
              if (check("DESC").isDefined) true
              else { check("ASC"); false }
            OrderKey(ref, desc)
          })
        } else Nil
      val limit =
        if (extensions && check("LIMIT").isDefined)
          Some(expect("lit-int").ival)
        else None
      if (check("end").isDefined)
        SelectQuery(selectors, fromTables, whereClauses, groupBy,
          orderBy, limit)
      else throw fail()
    }

    private def pSelector(): Selector = {
      val source = pSelectorSource()
      val rename = if (check("AS").isDefined) Some(expect("ident").sval) else None
      Selector(source, rename)
    }

    private def pSelectorSource(): SelectorSource =
      pMaybeColumnRef() match {
        case Right(ref) => ColSource(ref)
        case Left(_) if extensions && check("COUNT").isDefined => CountSource
        case Left(_) if extensions && check("SUM").isDefined =>
          expect("(")
          val arg = pColumnRef()
          expect(")")
          SumSource(arg)
        case Left(_) => throw fail(Some("a list of fields to select"))
      }

    private def pColumnRef(): ColumnRef =
      pMaybeColumnRef() match {
        case Right(ref) => ref
        case Left(friendly) => throw fail(Some(friendly))
      }

    private def pMaybeColumnRef(): Either[String, ColumnRef] =
      check("ident") match {
        case None => Left(typToFriendly("ident"))
        case Some(t) =>
          if (check(".").isDefined) Right(ColumnRef(pIdent(), Some(t.sval)))
          else Right(ColumnRef(t.sval, None))
      }

    private def pTableRef(): TableRef = {
      val name = pIdent()
      val rename = if (check("AS").isDefined) Some(pIdent()) else None
      TableRef(name, rename)
    }

    private def pIdent(): String = expect("ident").sval

    private def pComparison(): Comparison = {
      val left = pTerm()
      val op = expect("op").sval
      val right = pTerm()
      Comparison(op, left, right)
    }

    private def pTerm(): Term =
      pMaybeColumnRef() match {
        case Right(ref) => ColTerm(ref)
        case Left(_) =>
          val t = peek
          t.typ match {
            case "lit-str" => i += 1; StrLit(t.sval)
            case "lit-int" => i += 1; IntLit(t.ival)
            case _ =>
              throw fail(Some("a column reference or a string/integer literal"))
          }
      }

    private def pSeparated[A](sep: String, parse: () => A): Seq[A] = {
      val l = ArrayBuffer(parse())
      while (check(sep).isDefined) l += parse()
      l.toSeq
    }
  }
}
