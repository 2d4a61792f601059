package graft.athenaeum

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (SURVEY §5 item 4): the Spark-executed engine must
  * agree with a trivial in-memory reference model on random tables and
  * random queries — filters are compared against row-by-row predicate
  * evaluation, joins against the filtered cross product. */
class EnginePropertySpec extends SparkSpec {

  /** Run a scalacheck property and fail the suite test on any
    * counterexample (scalatestplus bridge isn't on the classpath). */
  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private case class Tbl(name: String, cols: Seq[(String, String)],
      rows: Seq[Seq[Any]])

  private def writeTbl(dir: String, t: Tbl): Unit = {
    val header = t.cols.map { case (n, ty) => s"""["$n", "$ty"]""" }
      .mkString("[", ", ", "]")
    val rows = t.rows.map(_.zip(t.cols).map {
      case (v, (_, "int")) => v.toString
      case (v, _) => "\"" + v.toString + "\""
    }.mkString("[", ", ", "]"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"${t.name}.table.json"),
      (header +: rows).mkString("[\n", ",\n", "\n]"))
  }

  private val strVals = Gen.oneOf("aa", "ab", "ba", "zz", "m", "")
  private val intVals = Gen.choose(-5L, 5L)

  private def genTable(name: String): Gen[Tbl] = for {
    nRows <- Gen.choose(0, 12)
    rows <- Gen.listOfN(nRows, for {
      s <- strVals; i <- intVals; j <- intVals
    } yield Seq[Any](s, i, j))
  } yield Tbl(name, Seq("s" -> "str", "i" -> "int", "j" -> "int"), rows)

  private val genOp = Gen.oneOf("=", "!=", ">", ">=", "<", "<=")

  private def cmp(op: String, a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => op match {
      case "=" => x == y; case "!=" => x != y; case ">" => x > y
      case ">=" => x >= y; case "<" => x < y; case "<=" => x <= y
    }
    case (x: String, y: String) => op match {
      case "=" => x == y; case "!=" => x != y; case ">" => x > y
      case ">=" => x >= y; case "<" => x < y; case "<=" => x <= y
    }
    case _ => sys.error("type mismatch")
  }

  private def runEngine(dir: String, sql: String): Seq[String] = {
    val out = Engine.runSql(spark, dir, sql)
    out.linesIterator.filterNot(_.startsWith("- Loaded")).drop(2)
      .map(_.trim).toSeq.sorted
  }

  test("filters match the in-memory model on random tables") {
    // SQL literals must be non-negative: the dialect has no unary minus
    // ("-" begins a comment, sql-to-json:288-291); table values still
    // exercise negatives.
    check(Prop.forAll(genTable("t"), genOp, Gen.choose(0L, 5L)) { (t, op, lit) =>
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      writeTbl(dir, t)
      val got = runEngine(dir, s"SELECT s, i FROM t WHERE i $op $lit")
      val expected = t.rows.filter(r => cmp(op, r(1), lit))
        .map(r => s"${r(0)} | ${r(1)}")
      // formatter pads columns; compare on collapsed whitespace
      val norm = got.map(_.split("\\|").map(_.trim).mkString(" | ")).sorted
      norm == expected.map(_.split("\\|").map(_.trim).mkString(" | ")).sorted
    }, 40)
  }

  test("equi joins match the filtered cross product") {
    check(Prop.forAll(genTable("l"), genTable("r"), genOp) { (l0, r0, op) =>
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      val l = l0.copy(name = "l")
      val r = r0.copy(name = "r")
      writeTbl(dir, l); writeTbl(dir, r)
      val got = runEngine(dir,
        s"SELECT l.i, r.j FROM l, r WHERE l.i $op r.j")
      val expected = (for {
        lr <- l.rows; rr <- r.rows if cmp(op, lr(1), rr(2))
      } yield s"${lr(1)} | ${rr(2)}")
      val norm = got.map(_.split("\\|").map(_.trim).mkString(" | ")).sorted
      norm == expected.map(_.split("\\|").map(_.trim).mkString(" | ")).sorted
    }, 25)
  }

  test("string filters honor lexicographic order") {
    check(Prop.forAll(genTable("t"), genOp, strVals) { (t, op, lit) =>
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      writeTbl(dir, t)
      val got = runEngine(dir, s"""SELECT i FROM t WHERE s $op "$lit"""")
      val expected = t.rows.filter(r => cmp(op, r(0), lit)).map(_(1).toString)
      got.map(_.trim).sorted == expected.sorted
    }, 25)
  }
}
