package graft

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for expensive map stages. */
object Par {

  /** Repartition UP to the session's default parallelism when the input
    * has fewer partitions.
    *
    * A small parquet table arrives as one split, and every narrow stage
    * downstream of it — tokenize folds, MinHash signatures, the stream
    * side of a broadcast join — then runs on a single core no matter how
    * many the session has; measured as the dominant cost of the dedup and
    * similarity queries at sf0.1 (one 2 s single-threaded tokenize ahead
    * of a 32-core join). At cluster scale inputs already carry more
    * partitions than defaultParallelism, so this is a structural no-op —
    * it never repartitions DOWN and never changes row contents, only
    * split count.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
