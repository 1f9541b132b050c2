package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the CTE-materialization rewrite: shared CTEs get the hint,
  * chain-consumed ones don't, recursive bodies are skipped, and paren
  * matching survives regex literals. Semantic neutrality is the
  * correctness gate's job (every oracle runs through the rewrite). */
class SqlMatSpec extends AnyFunSuite {

  test("a CTE referenced twice is materialized; a chained one is not") {
    val sql =
      """WITH a AS (SELECT 1 AS x),
        |b AS (SELECT x + 1 AS y FROM a),
        |c AS (SELECT y FROM b UNION ALL SELECT y + 1 FROM b)
        |SELECT * FROM c""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(out.contains("b AS MATERIALIZED (SELECT x + 1"))
    assert(out.contains("a AS (SELECT 1"), "single-reference CTE untouched")
    assert(out.contains("c AS (SELECT y FROM b"), "final CTE untouched")
  }

  test("the first CTE after WITH is eligible") {
    val sql =
      """WITH qe AS (SELECT 1 AS v),
        |p AS (SELECT v FROM qe),
        |s AS (SELECT a.v FROM p a JOIN qe b ON a.v = b.v)
        |SELECT * FROM s""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(out.contains("qe AS MATERIALIZED (SELECT 1 AS v)"))
  }

  test("a self-referencing (recursive) CTE is never hinted") {
    val sql =
      """WITH RECURSIVE r AS (
        |  SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5),
        |u AS (SELECT n FROM r),
        |w AS (SELECT a.n FROM u a JOIN u b ON a.n = b.n)
        |SELECT * FROM w""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(!out.contains("r AS MATERIALIZED"))
    assert(out.contains("u AS MATERIALIZED"))
  }

  test("parens inside string literals don't derail body delimiting") {
    val sql =
      """WITH m AS (SELECT regexp_extract(t, '(?is)<a(x)>(', 1) AS g
        |           FROM src),
        |n AS (SELECT g FROM m WHERE g <> ''),
        |o AS (SELECT a.g FROM n a JOIN n b ON a.g = b.g)
        |SELECT * FROM o""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(out.contains("n AS MATERIALIZED"))
    assert(out.contains("m AS (SELECT regexp_extract"))
  }

  test("a name defined twice (inner WITH shadowing) is never hinted") {
    val sql =
      """WITH n AS (SELECT 1 AS x),
        |h AS (FROM (WITH n AS (SELECT 2 AS x) SELECT x FROM n)),
        |w AS (SELECT a.x FROM n a JOIN n b ON a.x = b.x JOIN h ON true)
        |SELECT * FROM w""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(!out.contains("n AS MATERIALIZED"),
      "shadowed names must stay plain CTEs — DuckDB rejects the hint")
  }

  test("string literals are masked: data text can neither define nor count") {
    // literal containing a line that looks like a CTE definition — a
    // naive pass would inject MATERIALIZED inside the data text
    val sql =
      """WITH a AS (SELECT 'x AS (' AS t),
        |b AS (SELECT t FROM a UNION ALL SELECT t FROM a)
        |SELECT * FROM b""".stripMargin
    val out = SqlMat.materializeShared(sql)
    assert(out.contains("'x AS ('"), "literal text must survive byte-identical")
    assert(out.contains("a AS MATERIALIZED"), "real shared CTE still hinted")
    // literal mentioning a CTE's name must not inflate its ref count
    val sql2 =
      """WITH zq AS (SELECT 1 AS x),
        |w AS (SELECT x, 'zq zq zq' AS note FROM zq)
        |SELECT * FROM w""".stripMargin
    assert(!SqlMat.materializeShared(sql2).contains("zq AS MATERIALIZED"),
      "one code reference + literal mentions must stay inlined")
  }

  test("plain SELECT without CTEs passes through unchanged; idempotent") {
    val plain = "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1"
    assert(SqlMat.materializeShared(plain) == plain)
    val chain =
      """WITH a AS (SELECT 1 AS x),
        |b AS (SELECT x FROM a UNION ALL SELECT x FROM a)
        |SELECT * FROM b""".stripMargin
    val once = SqlMat.materializeShared(chain)
    assert(SqlMat.materializeShared(once) == once)
  }

  test("every registered oracle is DuckDB-parseable shape: balanced parens") {
    // cheap structural guard — the full semantic check is the gate
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val depth = sql.foldLeft((0, false)) {
        case ((d, inStr), '\'') => (d, !inStr)
        case ((d, false), '(') => (d + 1, false)
        case ((d, false), ')') => (d - 1, false)
        case (acc, _) => acc
      }
      assert(depth._1 == 0, s"unbalanced parens in $name")
    }
  }
}
