package graft.ingest

import scala.util.matching.Regex

/** Pure-Scala HTML field extraction mirroring the reference crawler's
  * BeautifulSoup pipeline (`/root/reference/crawl.py:40-100`):
  * selector cascade → per-block first link → per-page title / paragraphs /
  * publish-date cascade.
  *
  * Implemented with regex (no HTML parser is available in the offline jar
  * set). Divergence, recorded deliberately: nested same-tag blocks truncate
  * at the first closing tag (a real parser balances them). The ingest
  * fixtures and specs use flat article markup, where both implementations
  * agree.
  *
  * All functions are total: any malformed input yields an empty result /
  * null, never an exception — the reference skips bad pages per record
  * (`crawl.py:116-124`), it never fails a run.
  */
object Html extends Serializable {

  private val TagStrip = "(?s)<[^>]*>".r
  private val AttrRe: Regex = """([a-zA-Z:_-]+)\s*=\s*(?:"([^"]*)"|'([^']*)')""".r

  private def attrs(tagBody: String): Map[String, String] =
    AttrRe.findAllMatchIn(tagBody).map { m =>
      m.group(1).toLowerCase -> Option(m.group(2)).getOrElse(m.group(3))
    }.toMap

  /** bs4 `.get_text()` analog: drop tags, decode the common entities.
    * `&amp;` decodes LAST (standard chained-replacement order), so
    * pre-escaped entities like `&amp;lt;` yield `&lt;` — matching bs4 —
    * instead of double-decoding to `<`. */
  def text(html: String): String = {
    if (html == null) return ""
    TagStrip.replaceAllIn(html, "")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
  }

  private def blockRe(tag: String): Regex =
    s"(?is)<$tag\\b([^>]*)>(.*?)</$tag>".r

  /** All `<tag …>…</tag>` blocks (attrs, inner) whose class attribute
    * satisfies `classPred` (pred receives the raw class value, "" if
    * absent). Returns the OUTER html (reference inserts whole soup nodes
    * and later calls `.find` on them). */
  private def blocks(html: String, tag: String, classPred: String => Boolean): Seq[String] =
    blockRe(tag).findAllMatchIn(html)
      .filter(m => classPred(attrs(m.group(1)).getOrElse("class", "")))
      .map(_.matched).toSeq

  private def hasClassToken(token: String)(cls: String): Boolean =
    cls.split("\\s+").contains(token)

  /** Selector cascade (`crawl.py:42-59`): `article`, `div.post`,
    * `div.blog-post`, `div.article` — first selector with hits wins; then
    * the fallback: `article`/`div` whose class contains any of
    * post/article/blog/entry case-insensitively as a SUBSTRING. */
  def articleBlocks(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    val cascade = Seq(
      blocks(html, "article", _ => true),
      blocks(html, "div", hasClassToken("post")),
      blocks(html, "div", hasClassToken("blog-post")),
      blocks(html, "div", hasClassToken("article")))
    cascade.find(_.nonEmpty).getOrElse {
      val sub = Seq("post", "article", "blog", "entry")
      val pred = (cls: String) =>
        cls.nonEmpty && sub.exists(cls.toLowerCase.contains)
      // bs4 find_all(['article','div']) returns document order; our two
      // scans concatenate — fixture markup keeps the tags unmixed.
      blocks(html, "article", pred) ++ blocks(html, "div", pred)
    }
  }

  /** First `<a href=…>` in a block (`crawl.py:65`); null when absent
    * (caller skips the block, `crawl.py:66-68`). Empty href attribute is
    * still a hit for bs4 `find('a', href=True)` — preserved. */
  def firstHref(block: String): String = {
    if (block == null) return null
    blockRe("a").findAllMatchIn(block)
      .flatMap(m => attrs(m.group(1)).get("href"))
      .nextOption().orNull
  }

  /** `urljoin(base, href)` (`crawl.py:70`) via RFC 3986 resolution. */
  def resolveUrl(base: String, href: String): String = {
    if (href == null) return null
    try {
      if (base == null) href
      else new java.net.URI(base).resolve(href).toString
    } catch { case _: Exception => null }
  }

  /** Title cascade (`crawl.py:81-82`): first `<h1>` else `<title>` else
    * the literal "No Title Found"; text is stripped. */
  def title(html: String): String = {
    if (html == null) return "No Title Found"
    val h1 = blockRe("h1").findFirstMatchIn(html).map(m => text(m.group(2)).trim)
    val t = h1.orElse(
      blockRe("title").findFirstMatchIn(html).map(m => text(m.group(2)).trim))
    t.getOrElse("No Title Found")
  }

  /** All `<p>` texts, stripped, empties dropped, joined with "\n"
    * (`crawl.py:85-86`). */
  def paragraphs(html: String): String = {
    if (html == null) return ""
    blockRe("p").findAllMatchIn(html)
      .map(m => text(m.group(2)).trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** Publish-date cascade (`crawl.py:88-100`): `<time datetime>` attr,
    * else non-empty `<time>` body (NOT trimmed — reference uses `.text`
    * raw), else meta property=article:published_time / name=pubdate /
    * name=date content. Null when nothing matches. */
  def publishDate(html: String): String = {
    if (html == null) return null
    val time = blockRe("time").findFirstMatchIn(html)
    val fromTime = time.flatMap { m =>
      attrs(m.group(1)).get("datetime").filter(_.nonEmpty)
        .orElse(Some(text(m.group(2))).filter(_.nonEmpty))
    }
    fromTime.orElse {
      val metas = "(?is)<meta\\b([^>]*?)/?>".r.findAllMatchIn(html)
        .map(m => attrs(m.group(1))).toSeq
      def byAttr(k: String, v: String): Option[String] =
        metas.find(_.get(k).contains(v)).flatMap(_.get("content"))
      byAttr("property", "article:published_time")
        .orElse(byAttr("name", "pubdate"))
        .orElse(byAttr("name", "date"))
    }.orNull
  }
}
