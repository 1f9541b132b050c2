package graft

/** DuckDB CTE-materialization pass over the oracle SQL strings.
  *
  * DuckDB 1.0 INLINES every non-recursive CTE at each reference site, so
  * a WITH-chain whose stage is consumed twice evaluates the stage's whole
  * subtree twice — and an unrolled iterative chain (rank fixed points,
  * preset funnels) re-expands the expensive extraction prelude once per
  * round. Measured on this repo's gate at sf0.01: `web_trustrank` 153 s
  * inlined vs 2.2 s with its shared CTEs materialized; the r10 driver
  * gate (which timed out into an empty artifact) spent ~12 of its ~13.5
  * compare minutes in exactly these chains.
  *
  * The pass is a syntactic rewrite of `name AS (` → `name AS MATERIALIZED (`
  * for every top-level CTE that is REFERENCED at least twice outside its
  * own body. It is correctness-neutral by construction — `MATERIALIZED`
  * is an evaluation hint, never a semantic change — and conservative:
  *
  *   - `name AS (` is taken as a CTE definition (column aliases are
  *     `expr AS name`, cast targets are types — nothing else in this
  *     repo's SQL dialect puts `AS (` after a bare identifier);
  *   - the body is delimited by paren matching; a body that references
  *     its own name is recursive and is left alone (DuckDB rejects the
  *     hint on recursive CTEs);
  *   - reference counting is word-boundary occurrences of the name
  *     outside the definition's own body and header, over text whose
  *     single-quoted literals are masked out (r12) — a literal that
  *     contains `name AS (` or a CTE's name is data, not code, and
  *     must neither define nor count. Residual over-counting (a CTE
  *     name that also appears as a column name) only over-materializes
  *     — safe, at worst a lost pushdown on a small intermediate.
  *
  * Applied centrally in [[SparkEntry.oracleSql]] so every registered
  * oracle gets the same treatment and new chains can't regress the gate
  * wall-clock by forgetting the hint.
  */
object SqlMat {

  private val CteDef =
    "(?m)(^|,|\\b(?i:WITH)\\s|\\b(?i:RECURSIVE)\\s)(\\s*)([A-Za-z_][A-Za-z0-9_]*) AS \\(".r

  /** Same-length copy of `sql` with every single-quoted literal's
    * CONTENT blanked to 'x' (quotes kept, so offsets line up 1:1 with
    * the original). Definition detection and reference counting run on
    * this masked text so a string literal that happens to contain
    * `name AS (` — or a CTE's name — can neither create a phantom
    * definition (the r11 ADVICE hazard: MATERIALIZED injected inside
    * data text) nor skew a reference count. The `''` escape folds
    * naturally: the closing quote ends one span and the next quote
    * opens another, exactly as [[matchParen]] walks them. */
  private def maskLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    while (i < out.length) {
      if (out(i) == '\'') {
        i += 1
        while (i < out.length && out(i) != '\'') { out(i) = 'x'; i += 1 }
      }
      i += 1
    }
    new String(out)
  }

  /** End index (exclusive) of the paren group opening at `open`
    * (index of '('), or -1 if unbalanced. */
  private def matchParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case '\'' => // skip string literals ('' escapes fold naturally)
          i += 1
          while (i < sql.length && sql.charAt(i) != '\'') i += 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  def materializeShared(sql: String): String = {
    if (!sql.contains(" AS (")) return sql
    // All detection/counting runs over the literal-masked text (same
    // offsets as `sql`); only the final rewrite touches the original.
    val masked = maskLiterals(sql)
    // (name, headerStart, bodyOpen, bodyEnd) per top-level-looking def
    val defs = CteDef.findAllMatchIn(masked).flatMap { m =>
      val open = m.end - 1
      val close = matchParen(masked, open)
      if (close < 0) None
      else Some((m.group(3), m.start(3), open, close))
    }.toList
    // A name DEFINED twice (an inner WITH shadowing an outer CTE) stays
    // inlined: DuckDB accepts the shadowing only while both are plain
    // CTEs — materializing either side raises "Duplicate alias".
    val shadowed = defs.groupBy(_._1).collect {
      case (name, ds) if ds.sizeIs > 1 => name
    }.toSet
    val toMaterialize = defs.filter { case (name, defStart, open, close) =>
      val re = ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      val body = masked.substring(open, close)
      val recursive = re.findFirstIn(body).isDefined
      lazy val outside =
        re.findAllMatchIn(masked).count(m => m.start < defStart || m.start >= close)
      !shadowed(name) && !recursive && outside >= 2
    }
    // rewrite right-to-left so earlier offsets stay valid
    toMaterialize.sortBy(-_._2).foldLeft(sql) {
      case (acc, (name, defStart, _, _)) =>
        acc.substring(0, defStart) + name + " AS MATERIALIZED (" +
          acc.substring(defStart + name.length + " AS (".length)
    }
  }
}
