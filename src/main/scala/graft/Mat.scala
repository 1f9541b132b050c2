package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-wide stage-frame materializer — the one production knob that
  * closes the fault-tolerance caveat of `localCheckpoint` EVERYWHERE, not
  * just at the preset surface: operators that pin a shared frame (dedup
  * keeper tables, gated preset stages, classifier features, funnel
  * inputs) call [[pin]] instead of hard-coding `localCheckpoint(true)`,
  * so one Spark conf switches the whole library:
  *
  *   `spark.graft.materialize` =
  *     - `localCheckpoint` (default) — executor-local blocks, lineage
  *       truncated. Fastest; correct single-JVM and on clusters that can
  *       afford a job retry on executor loss (a lost local checkpoint is
  *       NOT recomputable — the job fails and must rerun).
  *     - `diskOnly` / `memoryAndDisk` — `persist` at that level, eagerly
  *       populated. Lineage is kept, so executor loss recomputes the
  *       missing partitions instead of failing the job; `diskOnly` is
  *       the 100 TB default recommendation (stage frames rarely fit in
  *       executor memory at scale).
  *     - `reliable` — `checkpoint(eager = true)` to the reliable
  *       checkpoint dir (`spark.graft.checkpointDir` conf, or a
  *       previously set `SparkContext.setCheckpointDir`): survives ANY
  *       executor loss AND truncates lineage; the right mode for very
  *       long pipelines on preemptible nodes.
  *
  * All modes are EAGER (the persist modes run a `count()`), which the
  * callers rely on: funnel Observation metrics resolve at pin time, and
  * the streaming faces' materialize-before-append ordering stays an
  * ordering, not a race. Output values are mode-invariant (MatSpec pins
  * dedup + preset outputs equal across all modes).
  *
  * An explicit `materialize` parameter on the preset builders still
  * wins — [[pin]] is their DEFAULT, so parameterized callers keep full
  * control per stage.
  */
object Mat {

  val ConfKey = "spark.graft.materialize"
  val CheckpointDirKey = "spark.graft.checkpointDir"

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ConfKey, "localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint(true)
      case "diskOnly" => eager(df.persist(StorageLevel.DISK_ONLY))
      case "memoryAndDisk" => eager(df.persist(StorageLevel.MEMORY_AND_DISK))
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(spark.conf.get(CheckpointDirKey))
        df.checkpoint(eager = true)
      case other =>
        throw new IllegalArgumentException(
          s"$ConfKey=$other (expected localCheckpoint | diskOnly | " +
            "memoryAndDisk | reliable)")
    }
  }

  /** [[pin]] for TRANSIENT per-micro-batch frames (the streaming
    * `foreachBatch` bodies): identical except `reliable` maps to
    * `diskOnly`. A reliable checkpoint per stage per micro-batch would
    * write directories Spark never deletes (reliable checkpoints are
    * only reclaimed under `spark.cleaner.referenceTracking
    * .cleanCheckpoints=true`, default false) — unbounded storage growth
    * on a long stream, and pointless: the stream's own checkpoint +
    * at-least-once batch replay is already the recovery story for
    * in-flight frames. */
  def pinTransient(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case "reliable" => eager(df.persist(StorageLevel.DISK_ONLY))
      case _ => pin(df)
    }

  private def eager(df: DataFrame): DataFrame = { df.count(); df }

  /** `df.pinned` — postfix [[pin]], so operator code reads like the
    * `localCheckpoint` it replaces; `df.pinnedTransient` is the
    * micro-batch variant ([[pinTransient]]). */
  implicit final class Pinnable(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Mat.pin(df)
    def pinnedTransient: DataFrame = Mat.pinTransient(df)
  }
}
