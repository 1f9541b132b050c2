package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Density-based main-content extraction
  * (`html_main_content` query) — the jusText/Boilerpipe heuristic class
  * (Pomikálek 2011; Kohlschütter et al. 2010): navigation chrome,
  * footers, and link farms announce themselves by SHAPE — short blocks
  * whose words mostly live inside anchors — so block-level word count
  * and link density separate main content from boilerplate without any
  * site-specific selector. Complements [[Html]], which mirrors the
  * reference's selector cascade exactly: the cascade needs to know the
  * site; this operator is the generic-web fallback the cascade falls
  * back TO at crawl scale.
  *
  * Shape: pure per-row higher-order expressions (split → transform →
  * filter → aggregate) — scan-stage, shuffle-free, whole-stage-codegen
  * friendly; no UDF. Every regex is Java/RE2-common, so the DuckDB
  * mirror runs the identical patterns and the oracle hash-matches. The
  * link-density gate compares in INTEGER cross-multiplication
  * (link_words·100 ≤ words·maxLinkPct) — no float division to drift.
  *
  * Block model: the html splits at closing block-level tags (`</p>`,
  * `</div>`, `</li>`, `</h1..6>`, `</td>`, `</section>`, `</article>`,
  * `<br>`); a block KEEPS when it carries ≥ minWords words after tag
  * stripping AND at most maxLinkPct percent of them inside `<a>`
  * anchors. Kept blocks join with a single newline, whitespace
  * collapsed — deterministic output for the gate.
  */
object Boilerplate {

  /** Closing block-level tags (case-insensitive) — the split points. */
  val BlockSplitRe: String =
    "(?i)</(?:p|div|li|h[1-6]|td|section|article)>|<br ?/?>"

  private val TagRe = "<[^>]*>"
  private val AnchorRe = "(?is)<a[^>]*>(.*?)</a>"
  private val WsRe = "[ \\t\\n\\x0B\\f\\r]+"

  private def stripTags(s: Column): Column =
    regexp_replace(s, TagRe, " ")

  private def wordCount(s: Column): Column =
    size(graft.text.TextAnalysis.tokens(stripTags(s)))

  /** Per-document main text plus the audit counts:
    * (idCol, n_blocks, n_kept, main_text). n_blocks counts blocks with
    * at least one word (raw splitting yields empty structural tails). */
  def mainContent(docs: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html", minWords: Int = 3,
                  maxLinkPct: Int = 33): DataFrame = {
    require(minWords >= 1, "minWords must be >= 1")
    require(maxLinkPct >= 0 && maxLinkPct <= 100, "maxLinkPct is a percentage")
    val feats = transform(split(col(htmlCol), BlockSplitRe), b => {
      val linkWords = aggregate(
        regexp_extract_all(b, lit(AnchorRe), lit(1)),
        lit(0), (acc, inner) => acc + wordCount(inner))
      struct(
        trim(regexp_replace(stripTags(b), WsRe, " ")).as("text"),
        wordCount(b).as("words"),
        linkWords.as("link_words"))
    })
    val nonEmpty = filter(feats, f => f.getField("words") >= 1)
    val kept = filter(nonEmpty, f =>
      f.getField("words") >= minWords &&
        f.getField("link_words") * 100 <= f.getField("words") * maxLinkPct)
    docs.select(
        col(idCol),
        size(nonEmpty).cast("long").as("n_blocks"),
        size(kept).cast("long").as("n_kept"),
        array_join(transform(kept, f => f.getField("text")), "\n")
          .as("main_text"))
      .orderBy(col(idCol))
  }

  /** DuckDB mirror over an html expression — identical patterns, list
    * lambdas for the per-block fold, same integer density gate. Emits
    * the four output columns (caller supplies FROM/ORDER BY). */
  def sqlMainContent(html: String, minWords: Int = 3,
                     maxLinkPct: Int = 33): String = {
    def toks(s: String) = s"len(regexp_extract_all(regexp_replace($s, '$TagRe', ' ', 'gs'), '[^ \\t\\n\\x0B\\f\\r]+'))"
    val feats =
      s"""list_transform(regexp_split_to_array($html, '$BlockSplitRe'), b ->
         |    struct_pack(
         |      txt := trim(regexp_replace(regexp_replace(b, '$TagRe', ' ', 'gs'), '$WsRe', ' ', 'g')),
         |      words := ${toks("b")},
         |      link_words := list_reduce(
         |        list_prepend(0, list_transform(
         |          regexp_extract_all(b, '$AnchorRe', 1), i -> ${toks("i")})),
         |        (a, x) -> a + x)))""".stripMargin
    s"""ne AS (SELECT doc_id, list_filter($feats, f -> f.words >= 1) AS fs
       |       FROM h),
       |ko AS (SELECT doc_id, fs,
       |         list_filter(fs, f -> f.words >= $minWords
       |           AND f.link_words * 100 <= f.words * $maxLinkPct) AS ks
       |       FROM ne)
       |SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_blocks,
       |  CAST(len(ks) AS BIGINT) AS n_kept,
       |  list_reduce(list_prepend('', list_transform(ks, f -> f.txt)),
       |    (a, x) -> CASE WHEN a = '' THEN x ELSE a || chr(10) || x END)
       |    AS main_text
       |FROM ko""".stripMargin
  }
}
