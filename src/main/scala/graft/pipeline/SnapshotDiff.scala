package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Corpus snapshot diff (`corpus_diff` query) — the data-versioning
  * audit between two corpus versions: which documents were ADDED,
  * REMOVED, or CHANGED (same id, different content). Reference anchor:
  * the crawler's per-run "new articles" delta (`crawl.py:118`,
  * A7) generalized to a full bidirectional version compare — the
  * artifact a corpus release pipeline publishes beside each snapshot so
  * downstream training runs know exactly what moved.
  *
  * Content equality is by md5(text): the join exchanges (id, 16-byte
  * hash) only — document payloads never shuffle, so the diff of two
  * 100 TB snapshots moves ~24 bytes per document. One full-outer join
  * keyed by doc id; with both snapshots bucketed by id the join is
  * co-partitioned and shuffle-free. Unchanged documents drop out before
  * the sort, so the output is proportional to the CHURN, not the corpus.
  */
object SnapshotDiff {

  /** Per-document diff rows: (doc_id, status ∈ added|removed|changed),
    * unchanged docs omitted, ordered by doc_id. */
  def snapshotDiff(oldV: DataFrame, newV: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldV.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("h_old"))
    val n = newV.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("h_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** Churn summary: one row per status with its count (the release-notes
    * number), ordered by status. */
  def summary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("status"))

  /** DuckDB mirror of the fixture-version construction used by the
    * `corpus_diff` query: old = docs with id % 7 != 0; new = docs with
    * id % 5 != 0, where id % 11 == 0 texts gained a " v2" suffix. */
  def sqlDiff(from: String): String =
    s"""WITH o AS (
       |  SELECT doc_id, md5(text) AS h FROM $from WHERE doc_id % 7 <> 0),
       |n AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS h
       |  FROM $from WHERE doc_id % 5 <> 0),
       |d AS (
       |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |    CASE WHEN o.doc_id IS NULL THEN 'added'
       |         WHEN n.doc_id IS NULL THEN 'removed'
       |         WHEN o.h <> n.h THEN 'changed' END AS status
       |  FROM o FULL JOIN n ON o.doc_id = n.doc_id)
       |SELECT doc_id, status FROM d WHERE status IS NOT NULL
       |ORDER BY doc_id""".stripMargin
}
