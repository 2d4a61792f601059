package graft.athenaeum

import org.scalatest.funsuite.AnyFunSuite
import SqlParser.ParseException

/** Generated-corpus parity: 60 random queries + 12 deliberately broken
  * ones were run through the reference `sql-to-json` once (goldens in
  * test resources); our parser must byte-match every AST and reproduce
  * every `line N, col M: message` error. */
class ParserCorpusSpec extends AnyFunSuite {

  private def res(name: String): Option[String] = {
    val in = getClass.getResourceAsStream(s"/parser_corpus/$name")
    if (in == null) None
    else Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close())
  }

  private def parseOutcome(sql: String): Either[String, String] =
    try Right(Ast.toJson(SqlParser.parse(sql)))
    catch { case ParseException(l, c, m) => Left(s"line $l, col $c: $m\n") }

  for (i <- 0 until 60) {
    val id = f"q$i%02d"
    test(s"corpus $id matches the reference front end") {
      val sql = res(s"$id.sql").get
      (res(s"$id.ast.json"), res(s"$id.err")) match {
        case (Some(ast), _) => assert(parseOutcome(sql) == Right(ast))
        case (None, Some(err)) => assert(parseOutcome(sql) == Left(err))
        case _ => fail(s"no golden for $id")
      }
    }
  }

  for (j <- 0 until 12) {
    val id = f"e$j%02d"
    test(s"error corpus $id reproduces the reference error byte-for-byte") {
      val sql = res(s"$id.sql").get
      val expected = res(s"$id.err").get
      parseOutcome(sql) match {
        case Left(err) => assert(err == expected)
        case Right(_) => assert(expected.isEmpty,
          s"$id parsed but reference errored with: $expected")
      }
    }
  }
}
