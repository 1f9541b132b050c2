package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Offline maintenance for the persisted dedup indexes — the
  * "compactable offline" promise the incremental/streaming docstrings
  * make ([[graft.streaming.StreamingIngest]],
  * [[Dedup.exactIndex]] / [[ParagraphDedup.paragraphIndex]] /
  * [[SubstringDedup.windowIndex]]), kept.
  *
  * Why needed: the incremental discipline APPENDS index entries per
  * batch (one parquet file per micro-batch, entries for hashes the
  * index had never seen). Two kinds of debt accumulate at 100 TB:
  *
  *  1. **Row debt** — `foreachBatch` is at-least-once, and a crash
  *     between the sink and index appends can replay a batch against an
  *     index that already holds its hashes; the per-batch
  *     `dropDuplicates("h")` defense keeps a batch internally unique,
  *     but a replayed append can still land the same `h` twice ACROSS
  *     files. Duplicate `h` rows multiply matched units through the
  *     incremental left joins downstream.
  *  2. **File debt** — thousands of small per-batch files turn the
  *     index probe's scan into an open/close storm.
  *
  * [[compact]] removes both: one row per hash (the MINIMUM keeper tuple
  * — under the append-only id discipline history ids precede batch ids,
  * so min(struct(...)) IS the true first keeper; for a well-formed
  * index it is a no-op), and [[rewriteCompacted]] lands the result as
  * `numFiles` hash-range-clustered, internally sorted files so the
  * anti-join/left-join probes read a pruned, splittable layout.
  * Schema-generic: works for the exact content-hash index
  * (h, keeper_id), the paragraph-norm index (h, keeper_doc_id,
  * keeper_idx), and the window-hash index (h, keeper_doc_id,
  * keeper_start) — any table whose first invariant is "one row per h,
  * earliest keeper wins". IndexMaintenanceSpec pins: idempotence,
  * no-op on well-formed indexes, and that compacting a
  * replay-corrupted index restores exactly the from-scratch index for
  * all three schemas.
  */
object IndexMaintenance {

  /** One row per `h`, earliest keeper tuple wins (min over the struct of
    * the non-key columns, in their schema order — keeper ids/positions
    * lead in every index schema, so struct-min is keeper-min). */
  def compact(index: DataFrame): DataFrame = compactBy(index, "h")

  /** [[compact]] generalized over the key column (r9): the signature
    * index the near-dup streaming faces persist is keyed by `doc_id`
    * (one signature row per admitted doc), not by a hash — the same
    * replay-debt argument applies, with min-struct as the deterministic
    * tiebreak (signature rows for one doc are identical by construction,
    * so any winner is THE row). */
  def compactBy(index: DataFrame, keyCol: String): DataFrame = {
    val valCols = index.columns.filterNot(_ == keyCol).toSeq
    index.groupBy(col(keyCol))
      .agg(min(struct(valCols.map(col): _*)).as("first"))
      .select(col(keyCol) +: valCols.map(c => col("first").getField(c).as(c)): _*)
  }

  /** Read an appended index directory, [[compact]] it, and rewrite it as
    * `numFiles` hash-range-clustered files (sorted within each file, so
    * parquet min/max stats prune probe scans). Writes to `outPath` —
    * swap paths atomically outside Spark (write-new-then-rename), never
    * overwrite the live index in place while a stream is running. */
  def rewriteCompacted(spark: SparkSession, inPath: String, outPath: String,
                       numFiles: Int): Unit =
    rewriteCompactedBy(spark, inPath, outPath, "h", numFiles)

  /** [[rewriteCompacted]] over an arbitrary key column (the `doc_id`-keyed
    * signature index case). */
  def rewriteCompactedBy(spark: SparkSession, inPath: String, outPath: String,
                         keyCol: String, numFiles: Int): Unit =
    compactBy(spark.read.parquet(inPath), keyCol)
      .repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(outPath)
}
