package graft

import scala.sys.process._

/** Test-only bridge to the container's DuckDB (via python3) so cross-engine
  * oracle SQL can be pinned by ScalaTest instead of only by the driver's
  * end-to-end gate (ADVICE r7: the generated-XXH64 and chain-pair-branch
  * code paths need committed regression cover on corpora the fixtures never
  * produce). DuckDB is strictly a DEV-GATE dependency — nothing under
  * src/main references it; suites cancel (assume) when it is absent. */
object DuckDb {

  lazy val available: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  /** Run `sql` with each (name → parquet directory) registered as a view;
    * rows come back tab-separated, NULL as `\N`, floats via python repr
    * (round-trip precision). */
  def query(sql: String, views: Map[String, String] = Map.empty): Seq[Array[String]] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-duck")
    val sqlFile = dir.resolve("q.sql")
    java.nio.file.Files.write(sqlFile, sql.getBytes("UTF-8"))
    val viewsJson = views
      .map { case (n, p) => s""""$n": "$p"""" }
      .mkString("{", ", ", "}")
    val py =
      """import duckdb, json, sys
        |con = duckdb.connect()
        |# Queries slower than ~2s (ambient load) trigger DuckDB's progress
        |# bar, which prints to STDOUT and would parse as result rows.
        |for s in ("SET enable_progress_bar=false",
        |          "SET enable_progress_bar_print=false"):
        |    try: con.execute(s)
        |    except Exception: pass
        |for name, path in json.loads(sys.argv[2]).items():
        |    con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/*.parquet')" % (name, path))
        |rows = con.execute(open(sys.argv[1]).read()).fetchall()
        |def cell(v):
        |    if v is None: return "\\N"
        |    if isinstance(v, float): return repr(v)
        |    return str(v)
        |sys.stdout.write("\n".join("\t".join(cell(v) for v in r) for r in rows))
        |""".stripMargin
    val err = new StringBuilder
    val raw = Process(Seq("python3", "-c", py, sqlFile.toString, viewsJson))
      .!!(ProcessLogger(l => err.append(l).append('\n')))
    require(err.isEmpty || !err.toString.toLowerCase.contains("error"),
      s"duckdb stderr: $err")
    val out = raw.replaceAll("\n+$", "") // scala.sys.process appends a newline
    if (out.isEmpty) Seq.empty else out.split("\n", -1).toSeq.map(_.split("\t", -1))
  }
}
