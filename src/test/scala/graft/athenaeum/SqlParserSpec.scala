package graft.athenaeum

import org.scalatest.funsuite.AnyFunSuite
import SqlParser.ParseException

/** Parser golden suite: our front end must emit byte-identical JSON ASTs
  * to the reference `sql-to-json` on its shipped examples, and reproduce
  * its tokenizer/parser error surface (`sql-to-json:286-378`). */
class SqlParserSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  for (ex <- Seq("example-1", "example-2", "example-3", "example-error-1")) {
    test(s"$ex.sql parses to the reference AST byte-for-byte") {
      val ast = SqlParser.parse(fixture(s"$ex.sql"))
      assert(Ast.toJson(ast) == fixture(s"$ex.ast.json"))
    }
  }

  test("round trip: toJson then fromJson preserves the AST") {
    val ast = SqlParser.parse(fixture("example-3.sql"))
    assert(Ast.fromJson(Ast.toJson(ast)) == ast)
  }

  test("extension round trip: GROUP BY / ORDER BY / LIMIT survive the JSON AST") {
    val ast = SqlParser.parse(
      "SELECT country, COUNT AS n FROM cities " +
        "GROUP BY country ORDER BY n DESC, country LIMIT 5",
      extensions = true)
    assert(ast.groupBy.map(_.name) == Seq("country"))
    assert(ast.orderBy.map(k => (k.ref.name, k.desc)) ==
      Seq(("n", true), ("country", false)))
    assert(ast.limit.contains(5L))
    assert(Ast.fromJson(Ast.toJson(ast)) == ast)
    // reference queries keep dumping without any extension fields
    val plain = SqlParser.parse(fixture("example-3.sql"))
    assert(!Ast.toJson(plain).contains("order_by"))
    assert(!Ast.toJson(plain).contains("group_by"))
  }

  private def errOf(sql: String): ParseException =
    intercept[ParseException](SqlParser.parse(sql))

  test("tokenizer: single dash") {
    val e = errOf("SELECT a FROM t WHERE a - 1")
    assert(e.message == "unexpected \"-\" (use \"--\" for comments)")
  }

  test("tokenizer: oversized int literal (sql-to-json:320-323)") {
    val e = errOf("SELECT a FROM t WHERE a = 2147483648")
    assert(e.message ==
      "integer literal too large: 2147483648 (max allowed: 2147483647)")
  }

  test("tokenizer: identifier suffixed onto int literal") {
    val e = errOf("SELECT a FROM t WHERE a = 12x")
    assert(e.message == "invalid character suffixed on to integer literal")
  }

  test("tokenizer: unterminated string at end of input") {
    val e = errOf("SELECT a FROM t WHERE a = \"oops")
    assert(e.message == "string literal goes unterminated to end of input")
  }

  test("tokenizer: unterminated string at end of line") {
    val e = errOf("SELECT a FROM t WHERE a = \"oops\nAND b = 1")
    assert(e.message == "string literal goes unterminated to end of line")
  }

  test("tokenizer: invalid operator") {
    val e = errOf("SELECT a FROM t WHERE a == 1")
    assert(e.message == "invalid operator: \"==\"")
  }

  test("tokenizer: uppercase identifier rejected (sql-to-json:372-373)") {
    val e = errOf("SELECT Name FROM t")
    assert(e.message == "invalid token: \"Name\"; it's not a keyword but it " +
      "starts with an upper-case letter; only keywords can start with an " +
      "upper-case letter")
  }

  test("tokenizer: line/col positions track newlines") {
    val e = errOf("SELECT a\nFROM t\nWHERE a ~ 1")
    assert(e.line == 3 && e.col == 9)
    assert(e.message == "unexpected character \"~\"")
  }

  test("parser: missing FROM") {
    val e = errOf("SELECT a")
    assert(e.message == "expected \"FROM\", got the end of input")
  }

  test("parser: trailing garbage uses 'not expecting'") {
    val e = errOf("SELECT a FROM t WHERE a = 1 ORDER")
    // ORDER isn't a keyword → rejected as uppercase identifier first
    assert(e.message.startsWith("invalid token: \"ORDER\""))
  }

  test("parser: literal select list") {
    val e = errOf("SELECT 1 FROM t")
    assert(e.message ==
      "expected a list of fields to select, got integer literal 1")
  }

  test("parser: comparison needs operator") {
    val e = errOf("SELECT a FROM t WHERE a AND b")
    assert(e.message == "expected a comparison operator, got \"AND\"")
  }

  test("parser: GROUP BY rejected without extensions (parity with HEAD)") {
    val e = errOf("SELECT a FROM t GROUP BY a")
    assert(e.message == "not expecting \"GROUP\"")
  }

  test("parser: GROUP BY + COUNT/SUM accepted with extensions (phase D)") {
    val ast = SqlParser.parse(
      "SELECT a, COUNT AS n, SUM(b) AS total FROM t GROUP BY a",
      extensions = true)
    assert(ast.groupBy == Seq(Ast.ColumnRef("a", None)))
    assert(ast.select.map(_.source) == Seq(
      Ast.ColSource(Ast.ColumnRef("a", None)), Ast.CountSource,
      Ast.SumSource(Ast.ColumnRef("b", None))))
  }

  test("comments and CR are skipped") {
    val ast = SqlParser.parse("-- leading comment\r\nSELECT a FROM t -- tail")
    assert(ast.select.size == 1 && ast.from.head.file == "t")
  }

  // json.dumps(ensure_ascii=True) parity: the reference quotes offending
  // input through q() = json.dumps, which escapes every char > 0x7E.
  test("tokenizer: non-ASCII unexpected character escapes as \\uXXXX") {
    val e = errOf("SELECT a FROM t WHERE a = \u20ac")
    assert(e.message == "unexpected character \"\\u20ac\"")
  }

  test("tokenizer: non-ASCII char in string literal escapes as \\uXXXX") {
    val e = errOf("SELECT a FROM t WHERE a = \"caf\u00e9\"")
    assert(e.message == "invalid character in string literal: \"\\u00e9\"")
  }

  test("tokenizer: Unicode decimal digits parse like Python int()") {
    // U+0661..0663 ARABIC-INDIC digits: isdigit in both engines; the
    // reference's int() maps them to 123 — so do we (Character.digit).
    val ast = SqlParser.parse("SELECT a FROM t WHERE a = \u0661\u0662\u0663")
    assert(ast.where.head.right == Ast.IntLit(123))
  }

  test("non-ASCII identifier round-trips with ensure_ascii AST JSON") {
    // 'é' is a lowercase letter in both tokenizers → valid ident; the AST
    // JSON must escape it exactly like json.dumps.
    val ast = SqlParser.parse("SELECT caf\u00e9 FROM t")
    assert(Ast.toJson(ast).contains("\"caf\\u00e9\""))
    assert(Ast.fromJson(Ast.toJson(ast)) == ast)
  }
}
