package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] The release-compliance trio as ONE sweep
  * (`compliance_sweep` / `compliance_funnel` queries): content-hash
  * takedowns, eTLD+1 domain blocklist, and robots path rules are three
  * operators this repo already owns ([[Curation.excludeByKey]],
  * [[graft.ingest.Robots]]); a corpus release runs all three, and wants
  * ONE auditable pass — which documents survive, and how many each leg
  * removes — not three separate corpus scans.
  *
  * Shape: [[flags]] annotates each document with the three leg verdicts
  * in a single text-bearing scan — the takedown and blocklist marks are
  * broadcast LEFT joins (lists deduplicated first: a mark join, unlike
  * the anti join, would duplicate rows on duplicate keys), the robots
  * verdict joins the host-keyed election computed over an (id, url)
  * projection (column-pruned — text never enters the robots path).
  * [[sweep]] filters the conjunction; [[funnel]] is ONE aggregate over
  * the flags frame (the `refinedweb_funnel` cumulative-flag discipline —
  * never a count per stage).
  */
object Compliance {

  /** Per-document leg verdicts: (docs.* minus helpers, f_takedown,
    * f_blocklist, f_robots) — true = the leg KEEPS the document.
    * `takedownHashes`/`blockedDomains` expose their key in the first
    * column; `robotsRules` is the [[graft.ingest.Robots]] (host, rule,
    * prefix) table (RFC 9309 wildcards included). */
  def flags(docs: DataFrame, idCol: String = "doc_id",
            urlCol: String = "url", textCol: String = "text",
            takedownHashes: DataFrame, blockedDomains: DataFrame,
            robotsRules: DataFrame): DataFrame = {
    val td = takedownHashes
      .select(col(takedownHashes.columns.head).as("__h")).distinct()
      .withColumn("__td", lit(true))
    val bl = blockedDomains
      .select(col(blockedDomains.columns.head).as("__dom")).distinct()
      .withColumn("__bl", lit(true))
    val dec = graft.ingest.Robots
      .decisions(docs.select(col(idCol), col(urlCol)), urlCol, robotsRules, idCol)
      .select(col(idCol), col("allowed").as("f_robots"))
    docs
      .withColumn("__h", md5(col(textCol)))
      .join(broadcast(td), Seq("__h"), "left")
      .withColumn("__dom", graft.ingest.Urls.registeredDomain(col(urlCol)))
      .join(broadcast(bl), Seq("__dom"), "left")
      .join(dec, Seq(idCol))
      .withColumn("f_takedown", col("__td").isNull)
      .withColumn("f_blocklist", col("__bl").isNull)
      .drop("__h", "__td", "__dom", "__bl")
  }

  /** Documents surviving all three legs. */
  def sweep(docs: DataFrame, idCol: String = "doc_id",
            urlCol: String = "url", textCol: String = "text",
            takedownHashes: DataFrame, blockedDomains: DataFrame,
            robotsRules: DataFrame): DataFrame =
    flags(docs, idCol, urlCol, textCol, takedownHashes, blockedDomains,
        robotsRules)
      .filter(col("f_takedown") && col("f_blocklist") && col("f_robots"))
      .drop("f_takedown", "f_blocklist", "f_robots")

  /** Attrition per leg, cumulatively in sweep order (takedowns →
    * blocklist → robots) — ONE aggregate over the flags frame. */
  def funnel(docs: DataFrame, idCol: String = "doc_id",
             urlCol: String = "url", textCol: String = "text",
             takedownHashes: DataFrame, blockedDomains: DataFrame,
             robotsRules: DataFrame): DataFrame =
    flags(docs, idCol, urlCol, textCol, takedownHashes, blockedDomains,
        robotsRules)
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("f_takedown"), 1L).otherwise(0L))
          .as("n_after_takedowns"),
        sum(when(col("f_takedown") && col("f_blocklist"), 1L).otherwise(0L))
          .as("n_after_blocklist"),
        sum(when(col("f_takedown") && col("f_blocklist") && col("f_robots"),
          1L).otherwise(0L)).as("n_after_robots"))

  /** The flags frame as DuckDB CTEs ending in `fl`(doc_id, source, f1 =
    * takedown-keeps, f2 = blocklist-keeps, f3 = robots-keeps), over a
    * relation `u` the caller supplies exposing (doc_id, source, text,
    * url) — prepend [[graft.ingest.Psl.sqlPslCte]]. `takedownSql` is a
    * one-column relation of requested md5 hashes; `blockedList` the
    * blocked eTLD+1 literals; `rulesRel` the robots VALUES relation. */
  def sqlFlagsCtes(takedownSql: String, blockedList: Seq[String],
                   rulesRel: String): String = {
    val blocked = blockedList.map(d => s"'$d'").mkString("[", ", ", "]")
    // blocklist as a LEFT-JOIN mark, not NOT IN: a NULL domain (null /
    // scheme-less url) must KEEP the row in both engines — the r10
    // null-URL-group lesson.
    s"""${graft.ingest.Psl.sqlDomainCtes("u", "doc_id", Seq("source", "text"), "url", "dd")},
       |td AS (SELECT DISTINCT h FROM ($takedownSql)),
       |bl AS (SELECT DISTINCT UNNEST($blocked) AS bdom),
       |rd AS (${graft.ingest.Robots.sqlDecisions("u", "url", rulesRel)}),
       |fl AS (
       |  SELECT dd.doc_id, dd.source,
       |    (td.h IS NULL) AS f1,
       |    (bl.bdom IS NULL) AS f2,
       |    rd.allowed AS f3
       |  FROM dd LEFT JOIN td ON md5(dd.text) = td.h
       |          LEFT JOIN bl ON dd.domain = bl.bdom
       |          JOIN rd ON dd.doc_id = rd.doc_id)""".stripMargin
  }
}
