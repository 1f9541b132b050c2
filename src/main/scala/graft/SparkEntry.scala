package graft

import graft.Mat.Pinnable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.{RecentArticles, SourceDistribution, Timeline, Totals}
import graft.dedup.Dedup
import graft.ingest.{Dates, Ingest}
import graft.multimodal.Multimodal
import graft.relational.Relational
import graft.similarity.{FittedOracle, Ivf, Pq, Similarity}
import graft.streaming.EventWindows
import graft.text.{Stopwords, TextAnalysis, WordFrequencies}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is deterministic (total orderBy with
  * tie-breaks) and every numeric output is either exact (BIGINT counts,
  * integer-cents sums — see [[graft.relational.Money]]) or rounded
  * identically on both sides, so the driver's DuckDB hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Source distribution (reference `app.py:74-82`) — the reference's
    * simplest complete query: scan → hash agg → pct window → sort. */
  def entry(spark: SparkSession): DataFrame =
    SourceDistribution(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntriesDashboard.queries ++
    EntriesGraph.queries ++
    EntriesText.queries ++
    EntriesDedup.queries ++
    EntriesSimilarity.queries ++
    EntriesIngest.queries ++
    EntriesPipeline.queries ++
    EntriesTokenizer.queries ++
    EntriesMultimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Every registered oracle runs through [[SqlMat.materializeShared]]:
    * DuckDB 1.0 inlines CTEs per reference site, and the gate's heavy
    * WITH-chains (preset funnels, unrolled rank iterations, banded
    * dedup) re-evaluated their extraction preludes once per reference —
    * ~12 of the r10 gate's ~13.5 compare minutes, the likely cause of
    * the round's empty driver artifact. The hint is correctness-neutral
    * (same rows, different evaluation order), so applying it centrally
    * keeps future chains from regressing the gate wall-clock. */
  def oracleSql: Map[String, String] =
    oracleSqlRaw.map { case (k, v) => k -> SqlMat.materializeShared(v) }

  private def oracleSqlRaw: Map[String, String] =
    (EntriesDashboard.oracleSql ++
      EntriesGraph.oracleSql ++
      EntriesText.oracleSql ++
      EntriesDedup.oracleSql ++
      EntriesSimilarity.oracleSql ++
      EntriesIngest.oracleSql ++
      EntriesPipeline.oracleSql ++
      EntriesTokenizer.oracleSql ++
      EntriesMultimodal.oracleSql) ++
    // Printed-constant oracles for the k-means ANN family: present only
    // after the corresponding query has run and stashed its seeded
    // deterministic fit (Verify executes every query before dumping this
    // map — see FittedOracle). Absent → the driver's rows-only fallback.
    FittedOracle.oracleEntries
}

/** Planted robots rules for `robots_exclusion` — every decision branch:
  * whole-host block, section block with a longer allow punched through,
  * an exact-length tie (allow wins), an allow-only host, unlisted hosts
  * (allowed by default), and the RFC 9309 wildcards (r10): a mid-`*`
  * disallow, an end-anchored `$` disallow, and a wildcard disallow with
  * a more specific wildcard allow punched through. Shared by the query
  * and its VALUES oracle. */
object RobotsRulesFixture {
  val rules: Seq[(String, String, String)] = Seq(
    ("news.example.com", "disallow", "/"),
    ("blog.example.com", "disallow", "/sec1"),
    ("blog.example.com", "allow", "/sec1/page"),
    ("docs.data.net", "disallow", "/sec"),
    ("docs.data.net", "allow", "/sec3"),
    ("mirror.openweb.org", "disallow", "/sec2"),
    ("mirror.openweb.org", "allow", "/sec2"),
    ("archive.foo.co.uk", "allow", "/"),
    // wildcards: shop blocks ids starting '1' in any section; cdn blocks
    // paths ENDING in 44; static blocks all sections but re-allows sec2
    // via the longer wildcard allow
    ("shop.example.com", "disallow", "/sec*/page/1*"),
    ("cdn.example.com", "disallow", "*44$"),
    ("static.example.com", "disallow", "/sec*"),
    ("static.example.com", "allow", "/sec2/*"))
}

/** Cleanup for the per-app IVF store scratch dirs (`knn_ivf_stored`):
  * per-app paths can't collide across concurrent JVMs, but they would
  * accumulate in tmp across runs without reclamation. Two layers —
  * a shutdown delete (clean exits) and a stale-sibling sweep (crashed
  * runs never reach their shutdown hook; the next run deletes siblings
  * untouched for 6+ hours — far beyond any live run, so a CONCURRENT
  * JVM's fresh store is never swept). Registration is idempotent per
  * path; sweep failures are best-effort by design (cleanup must never
  * fail a query). */
object IvfStoreScratch {
  private val StaleMs = 6L * 3600 * 1000
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def deleteOnExit(path: String): Unit =
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
        catch { case _: java.io.IOException => () }))
      sweepStaleSiblings(new java.io.File(path))
    }
  private def sweepStaleSiblings(dir: java.io.File): Unit = {
    val sibs = Option(dir.getParentFile).flatMap(p => Option(p.listFiles()))
      .getOrElse(Array.empty[java.io.File])
    val cutoff = System.currentTimeMillis() - StaleMs
    sibs.foreach { f =>
      if (f.getAbsolutePath != dir.getAbsolutePath && f.lastModified() < cutoff)
        try org.apache.commons.io.FileUtils.deleteDirectory(f)
        catch { case _: java.io.IOException => () }
    }
  }
}

/** Inline PII corpus (the synthetic documents contain no PII, so the scrub
  * query gets its own fixture; the same literals feed the VALUES oracle). */
object PiiFixture {
  val docs: Seq[(Long, String)] = Seq(
    (1L, "contact alice.smith+spam@example.co.uk or call +1 (555) 123-4567 today"),
    (2L, "server at 192.168.1.254 responded; backup at 10.0.0.7 did not"),
    (3L, "no sensitive content here, just words and the number 42"),
    (4L, "mail bob@corp.io and carol_d@mail.example.org from 555-867-5309"),
    (5L, "edge: version 1.2.3.4 of the lib pinged 8.8.8.8 at dawn"))
}

/** Edge corpus for the Gopher rule signals: the synthetic documents are
  * single-line low-stopword word soup (every doc fails the stop-hits
  * rule), so this fixture plants one document per rule branch — a
  * genuine PASS, bullet walls, ellipsis walls, symbol spam, digit spam,
  * over-long tokens, a too-short doc, the four-dot edge, and the empty
  * string (NULL-ratio parity). */
object GopherFixture {
  private val prose =
    "The committee met with the board to review all of the plans that " +
    "have been made for the coming year and they agreed that the work " +
    "should continue with the same care and attention to detail that " +
    "the team have shown before because the results of the effort were " +
    "clear to everyone and the plan will be ready to share with all of " +
    "the members next week after the final review is complete there."
  val docs: Seq[(Long, String)] = Seq(
    (1L, prose),                                  // passes every rule
    (2L, "- alpha item one here\n- beta item two here\n* gamma item three\n" +
         "\t- delta four\n• epsilon five\n- zeta six\n- eta seven\n" +
         "* theta eight\n- iota nine\nonly prose line of the page"),
    (3L, "the first thought trails off...\nthe second does too... \n" +
         "and the third as well...\t\na final plain line of the text"),
    (4L, "### heading spam ## with #tags# and more... dots... here... " +
         "plus #extra #hash #marks everywhere... in the text"),
    (5L, "just nine words of text in this tiny doc"),
    (6L, "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis " +
         "antidisestablishmentarianism floccinaucinihilipilification " +
         "honorificabilitudinitatibus incomprehensibilities"),
    (7L, "1234 5678 9012 3456 7890 1234 5678 9012 3456 7890 " +
         "the and of 42 17 93 55 28 61 84"),
    (8L, "dots.... four in the a row with to of and"),
    (9L, ""))
}

/** Planted repeats for the Gopher repetition signals (the synthetic
  * documents are single-line, so the line/paragraph rules never fire on
  * them): a clean multi-line page that PASSES, a duplicated line, a
  * duplicated paragraph, a stuffed bigram, a doc whose ONLY violation
  * is a twice-occurring 5-gram (distinct filler dilutes every shorter
  * n-gram under its cut, demonstrating the threshold ladder), a
  * repeated 10-gram sentence (which necessarily drags its sub-n-grams
  * over their cuts too — the ladder is monotone downward), the empty
  * doc, and a tiny all-distinct doc that must NOT fire the top-n-gram
  * rule. */
object RepetitionFixture {
  private val fiveGram = "one two three four five"
  private val tenGram =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  val docs: Seq[(Long, String)] = Seq(
    (1L, "the morning report covers local news from the harbor district\n" +
         "a second line adds fresh detail about evening market trading\n" +
         "closing notes thank readers for their continued weekly support\n" +
         "nothing on this page repeats so every fraction stays small\n" +
         "a final sentence rounds out the sample with calm words"),
    (2L, "subscribe to our newsletter today\nsome genuine article content\n" +
         "subscribe to our newsletter today\nmore real words in between\n" +
         "subscribe to our newsletter today"),
    (3L, "news update for the town\n\nnews update for the town\n\n" +
         "fresh other words now"),
    (4L, "best price best price best price now with some other calm words here"),
    (5L, fiveGram + " " + (1 to 60).map(i => s"w$i").mkString(" ") +
         " " + fiveGram),
    (6L, tenGram + " filler words sit between the copies " + tenGram),
    (7L, ""),
    (8L, "tiny doc here"))
}

/** Multi-line pages for the C4 line filters (the synthetic documents are
  * single-line): kept/dropped line variants plus each page-level drop. */
object C4Fixture {
  val docs: Seq[(Long, String)] = Seq(
    (1L, "This is the first good sentence of the page.\n" +
         "short line.\n" +
         "this line has plenty of words but no terminal punctuation\n" +
         "Enable javascript to view the comments on this page.\n" +
         "Is this a fine question sentence with enough words?\n" +
         "An exclamation sentence with plenty of words here!\n" +
         "He said \"this quoted sentence ends with a quote mark.\"\n" +
         "   A sentence with trailing spaces after the period.   "),
    (2L, "A perfectly fine long sentence number one here.\n" +
         "This page however mentions Lorem Ipsum filler text.\n" +
         "A perfectly fine long sentence number three here.\n" +
         "A perfectly fine long sentence number four here."),
    (3L, "A good long sentence before the code block starts.\n" +
         "function f() { return 42; }\n" +
         "Another good long sentence right after the code.\n" +
         "And one more good long sentence to close it."),
    (4L, "Only one good long sentence lives on this page.\n" +
         "plus a short tail.\n" +
         "and nothing else without punctuation"),
    (5L, "Exactly three good sentences make this page survive.\n" +
         "Here then is the second of the three sentences.\n" +
         "And here at last is the third full sentence."))
}

/** Line-structured corpus for the FineWeb end-to-end preset — every stage
  * gets a designated victim (validated in FineWebPipelineSpec):
  * C4 page kills (3 braces, 4 lorem-ipsum, 5 thin), a C4 line kill inside
  * a survivor (2), a Gopher-rules kill (6, under the word floor), a
  * repetition kill (7, duplicated lines), an offset-shifted shared
  * passage for the ANCHORED substring dedup (8 keeper / 9 loser — the
  * shared 25-token passage sits at different token offsets), an
  * exact-dup pair whose leading tokens are all non-anchors so it reaches
  * the exact stage intact (11 keeper / 13 loser), a contaminated doc
  * sharing two sentences with the benchmark slice (12), the benchmark
  * doc itself (20, `% 10`), and DSIR targets (9, 21, `% 3` among
  * survivors) vs the common-vocabulary docs the per-token weight floor
  * drops. */
object FineWebFixture {
  private val passage =
    "the ancient library held countless scrolls from forgotten ages of distant history.\n" +
    "scholars traveled great distances to study the rare manuscripts kept safely stored within."
  val docs: Seq[(Long, String)] = Seq(
    (1L, "morning light spread slowly across the quiet valley floor.\n" +
         "farmers walked out early to tend their growing fields.\n" +
         "children played beside the river while elders watched calmly.\n" +
         "evening brought a gentle rain that cooled the warm earth."),
    (2L, "click here\n" +
         "please visit our javascript page for more details now.\n" +
         "travelers crossed the old wooden bridge before sunrise today.\n" +
         "merchants sold spices and cloth in the crowded market square.\n" +
         "lanterns glowed softly along the narrow cobbled streets tonight."),
    (3L, "this page contains code like {var x = 1} inside.\n" +
         "the parser should reject every page that has braces.\n" +
         "three more words complete this line properly today friend."),
    (4L, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\n" +
         "the filler text above marks this page as boilerplate.\n" +
         "nothing here should ever survive the cleaning stage today."),
    (5L, "only two proper lines exist within this short page.\n" +
         "that is one line fewer than the cleaner requires."),
    (6L, "five short words end here.\n" +
         "the line also stays tiny.\n" +
         "of course this stops now."),
    (7L, "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "the same sentence repeats again and again without change.\n" +
         "one different closing line ends this strange page quietly."),
    (8L, "archivists opened the heavy eastern door.\n" + passage + "\n" +
         "visitors often remained inside reading until the lamps burned low."),
    (9L, "seven caretakers guarded the heavy eastern door.\n" + passage + "\n" +
         "copied chronicles filled the lower shelves beyond the great staircase.\n" +
         "apprentices carried fresh candles upstairs every single winter evening."),
    (11L, "matching mirrored replica volumes repeat every word precisely today.\n" +
          "the deduplicator must keep only the earliest copy.\n" +
          "later copies should quietly disappear now."),
    (12L, "the benchmark suite contains famous questions about rivers.\n" +
          "which long river crosses the largest desert on earth.\n" +
          "students answered the difficult geography quiz with ease."),
    (13L, "matching mirrored replica volumes repeat every word precisely today.\n" +
          "the deduplicator must keep only the earliest copy.\n" +
          "later copies should quietly disappear now."),
    (14L, "zephyr quartz vortex jumbled kaleidoscope fragments drifted with haze.\n" +
          "prism nebula quasar flux shimmered behind murky violet fog.\n" +
          "glyph runes etched obsidian tablets humming with arcane static."),
    (21L, "quiet market mornings brought farmers and merchants to the river.\n" +
          "the old library beside the bridge stored countless village records.\n" +
          "children watched lanterns glow along the valley streets each evening."),
    (20L, "the benchmark suite contains famous questions about rivers.\n" +
          "which long river crosses the largest desert on earth.\n" +
          "examiners graded every answer sheet before the deadline passed."))
}

/** Gnarly-URL fixture for the canonicalization queries: case games,
  * default and non-default ports, tracking params, unsorted params,
  * fragments, trailing and duplicate slashes, empty paths, a scheme-less
  * malformed link, and two pairs (1/8, 3/4) that only collide AFTER
  * canonicalization. */
object UrlFixture {
  val urls: Seq[(Long, String)] = Seq(
    (1L, "https://Example.COM:443/Path/To/Page?utm_source=x&b=2&a=1#frag"),
    (2L, "HTTP://example.com:80//a//b/?z=1&y=2&"),
    (3L, "https://example.com/"),
    (4L, "https://example.com#top"),
    (5L, "https://example.com/a?fbclid=abc123"),
    (6L, "relative/path#section"),
    (7L, "http://example.com:8080/x?port=kept"),
    (8L, "https://example.com/Path/To/Page?a=1&utm_medium=m&b=2"),
    (9L, " https://blog.example.com/posts/spark-tips/ "),
    (10L, "ftp://Files.Example.com:21/pub/data.csv"),
    (11L, "https://example.com/search?q=spark+sql&gclid=1&lang=en"),
    (12L, "https://example.com/a/b/c///"))
}

/** Inline multi-paragraph corpus for the paragraph-dedup queries (the
  * synthetic documents table is single-line text, so paragraph structure
  * needs its own fixture; the same literals feed the VALUES oracle).
  * Engineered edges: a case/whitespace variant of the license paragraph
  * (doc 3 — normalization must merge it), a pure-boilerplate doc (5 —
  * must come back empty), a whitespace-only paragraph (doc 7 — dropped,
  * counted neither kept nor removed), and a 2-occurrence repeat (docs
  * 7/8 — removed at minOccurrences=2, SURVIVES at 3). */
/** Fixture for the CCNet preset: every stage has designated victims —
  * repeated License/Nav paragraphs (stage-1 paragraph dedup; doc 4 is
  * ALL boilerplate and vanishes), a French doc and a gibberish doc
  * (stage-2 language gate), and an English doc of rare vocabulary whose
  * self-fit bigram cost lands it in the tail tier (stage-3 cut). */
object CcNetFixture {
  private val License =
    "This document is licensed under the terms of the open content license."
  private val Nav = "Home | About | Contact | Privacy"
  val docs: Seq[(Long, String)] = Seq(
    (1L, s"$License\n\nthe quick brown fox jumps over the lazy dog and runs to the river.\n\n$Nav"),
    (2L, s"$License\n\nthe cat sat on the mat and the dog sat on the rug by the door.\n\n$Nav"),
    (3L, s"the sun rose over the hills and the farmers went to the fields early.\n\n$Nav"),
    (4L, s"$License\n\n$Nav"),
    (5L, "le vieux port de la ville est dans la brume et les bateaux dorment pour la nuit."),
    (6L, "zorp blick frumble quax vantor miskle dron plif warx jentu klavor brint."),
    (7L, "the rain fell on the roof and the children listened to the storm in the dark."),
    (8L, "the baker made bread in the morning and the town came to the shop for it."),
    (9L, "quantum chromodynamics explains that confinement of the color charge is in the gluon field."),
    (10L, "the teacher read the book to the class and the students wrote notes in the hall."))
}

object ParagraphFixture {
  private val License =
    "This document is licensed under the Creative Commons Attribution license."
  private val Nav = "Home | About | Contact | Privacy Policy"
  private val Subscribe = "Subscribe to our newsletter for weekly updates."
  val docs: Seq[(Long, String)] = Seq(
    (1L, s"$License\n\nSpark shuffles data between stages when keys change.\n\n$Nav"),
    (2L, s"$License\n\nBroadcast joins avoid shuffles for small dimension tables.\n\n$Nav"),
    (3L, "  this   DOCUMENT is Licensed under the creative commons attribution license.  " +
      s"\n\nPartition pruning skips files outside the predicate range.\n\n$Subscribe"),
    (4L, s"$Nav\n\n$Subscribe\n\nAdaptive execution re-plans joins at runtime using observed sizes."),
    (5L, s"$License\n\n$Nav\n\n$Subscribe"),
    (6L, "A wholly unique document with a single paragraph."),
    (7L, s"Columnar formats let scans skip unread columns.\n\n   \n\n$Subscribe"),
    (8L, s"Columnar formats let scans skip unread columns.\n\n$License"))
}

/** Inline page fixtures for the ingest driver queries (deterministic —
  * the same literals are embedded in the DuckDB oracle VALUES). */
object IngestFixture {
  val listings: Seq[(String, String)] = Seq(
    ("https://ex.com/list",
      """<article><a href="/a/1">one</a></article>
        |<article><a href="/a/2">two</a></article>
        |<article><p>no link, skipped</p></article>""".stripMargin))

  val pages: Seq[(String, String)] = Seq(
    ("https://ex.com/a/1",
      "<h1>Title One</h1><p>Body 1.</p><time datetime=\"2024-01-01\">x</time>"),
    ("https://ex.com/a/2",
      "<title>Title Two</title><p>Body 2a.</p><p>Body 2b.</p>"))

  val rawDates: Seq[String] = Seq(
    "2024-03-01T10:15:30", "2024-07-04 08:30:00", "2024-03-01",
    "March 1, 2024", "Mar 15, 2024", "01/03/2024", "not a date",
    " 2024-12-25 ",
    // dateutil-breadth forms (app.py:90): RFC-2822 with zone name and
    // offset, bare dd-Mon-yyyy, month-name+time, slash-ISO
    "Tue, 01 Mar 2024 10:15:30 GMT", "Fri, 05 Jul 2024 23:59:01 +0200",
    "01 Mar 2024 10:15:30", "15 Mar 2024", "March 1, 2024 10:30 AM",
    "2024/03/01", "Sat, 32 Jan 2024 00:00:00 GMT")

  /** The dateutil free-text tail (r12): ordinal suffixes, dotted/Sept
    * month tokens, comma-less month-name forms, single-digit days —
    * plus the documented-out-of-contract negatives ('of'-phrases,
    * defaulted-field dates, impossible days) that must stay null. */
  val rawDatesFree: Seq[String] = Seq(
    "March 3rd, 2024", "August 21st, 2024 3:05 PM", "June 2nd, 2024",
    "22nd February 2024", "23rd March 2024", "1st Mar 2024",
    "3th March 2024", // dateutil strips ANY digit+suffix, grammatical or not
    "Sept. 5, 2024", "Sept 5, 2024", "Mar. 3 2024",
    "3 Mar 2024", "3 Mar 2024 10:15:30", "3 March 2024 10:15:30",
    "March 3 2024", "March 3 2024 10:30 AM", "Mar 3 2024",
    "Feb 31st, 2024",      // impossible day: null in both engines
    "3rd of March 2024",   // 'of' = dateutil fuzzy mode: out of contract
    "March 2024",          // defaulted day: nondeterministic in dateutil
    "the 3rd quarter",     // ordinal strips, then no format matches
    // Multi-occurrence pin (r13 advice): DuckDB regexp_replace is
    // first-match-only without the 'g' option; every format has exactly
    // one day token, so a two-ordinal string can never PARSE under
    // either normalization — the pin locks the null on both engines
    // while exercising the global-replace path the mirrors now share.
    "1st March 3rd, 2024")
}

