package graft.athenaeum

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** TRUE end-to-end drive of the executable surface: a fresh JVM runs
  * `graft.athenaeum.cli.Main` exactly as a reference user would run
  * `database.py` — argv, CWD-relative table files, stdout bytes, stderr,
  * exit codes. Engine goldens cover the engine; this covers the binary
  * contract around it. (One JVM+Spark boot per invocation, so only the
  * contract-bearing cases run here.) */
class CliSpec extends AnyFunSuite {

  private def classpath: String = Seq(
    // absolute: the CLI subprocess runs in a temp CWD
    new java.io.File("target/scala-2.13/classes").getAbsolutePath,
    "/opt/spark/jars/*").mkString(":")

  /** Run a CLI main class in `cwd`; returns (exitCode, stdout, stderr). */
  private def runJvm(cwd: java.io.File, mainClass: String,
      args: Seq[String]): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
      l => err.append(l).append('\n'))
    val code = Process(
      Seq("java", "-Xmx2g", "-cp", classpath,
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "--add-opens=java.base/java.util=ALL-UNNAMED",
        "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
        "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
        mainClass) ++ args,
      cwd,
      "SPARK_MASTER" -> "local[2]").!(logger)
    (code, out.toString, err.toString)
  }

  private def runCli(cwd: java.io.File, args: Seq[String])
      : (Int, String, String) =
    runJvm(cwd, "graft.athenaeum.cli.Main", args)

  private def stage(): java.io.File = {
    val dir = Files.createTempDirectory("cli").toFile
    for (f <- Seq("cities.table.json", "countries.table.json",
        "example-1.ast.json")) {
      val in = getClass.getResourceAsStream(s"/golden/$f")
      try Files.copy(in, Paths.get(dir.toString, f),
        StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    dir
  }

  test("happy path: golden stdout byte-match, exit 0") {
    val dir = stage()
    val (code, out, _) = runCli(dir, Seq("example-1.ast.json"))
    val golden = {
      val in = getClass.getResourceAsStream("/golden/example-1.out")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(code == 0)
    assert(out == golden, s"stdout diverged:\n$out")
  }

  test("sql-to-json --extensions feeds Main: ORDER BY/LIMIT end to end") {
    val dir = stage()
    Files.writeString(Paths.get(dir.toString, "q.sql"),
      "SELECT name, population FROM cities ORDER BY population DESC LIMIT 2\n")
    val (c1, json, e1) =
      runJvm(dir, "graft.athenaeum.cli.SqlToJson", Seq("q.sql", "--extensions"))
    assert(c1 == 0, s"sql-to-json failed: $e1")
    assert(json.contains("\"order_by\"") && json.contains("\"limit\": 2"))
    Files.writeString(Paths.get(dir.toString, "q.ast.json"), json)
    val (c2, out, e2) = runCli(dir, Seq("q.ast.json"))
    assert(c2 == 0, s"runner failed: $e2")
    val rows = out.linesIterator
      .filterNot(_.startsWith("- Loaded")).drop(2).toSeq
    assert(rows.map(_.split('|')(0).trim) == Seq("Tokyo", "Mumbai"),
      out)
    // without the flag the same SQL fails with the reference tokenizer
    // error — the parity surface is untouched
    val (c3, _, e3) =
      runJvm(dir, "graft.athenaeum.cli.SqlToJson", Seq("q.sql"))
    assert(c3 == 1 && e3.contains("invalid token: \"ORDER\""), e3)
  }

  test("bad argv and unreadable input: reference error text, exit 1") {
    val dir = stage()
    val (code1, _, err1) = runCli(dir, Seq())
    assert(code1 == 1)
    assert(err1.contains("Expecting exactly 1 command-line argument, got 0."))
    val (code2, _, err2) = runCli(dir, Seq("nope.ast.json"))
    assert(code2 == 1)
    assert(err2.contains("Input file \"nope.ast.json\" is not valid."))
  }
}
