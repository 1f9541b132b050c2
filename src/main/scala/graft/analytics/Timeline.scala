package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-filled daily timeline — the data behind the reference's line chart.
  *
  * Reference (`app.py:84-110`): parse each document's publish time leniently
  * (failures dropped, `app.py:88-92`), count per calendar day (`app.py:97-98`),
  * then reindex onto the dense daily range [min, max] with absent days = 0
  * (`pd.date_range` + `reindex(fill_value=0)`, `app.py:99-100`), ascending.
  *
  * Date-spine join (SURVEY §2.3 J2): counts aggregate first (one shuffle on
  * date — low cardinality), the spine is `sequence(min,max)` exploded from a
  * 1-row aggregate, and the spine⟕counts join is broadcast (both sides are
  * #days rows). Input size never reaches the join.
  */
object Timeline {
  /** Daily counts over a timestamp column, gap-filled with 0. */
  def apply(df: DataFrame, tsCol: String = "ts"): DataFrame = {
    val counts = df
      .filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("date"))
      .agg(count(lit(1)).as("n"))
    val spine = counts
      .agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("date"))
    spine.join(counts, Seq("date"), "left")
      .na.fill(0L, Seq("n"))
      .orderBy(col("date").asc)
  }

  /** Lenient-parse variant for raw string dates (reference `published_at`,
    * SURVEY §2.7 F8): try ISO timestamp, ISO date, and the meta-tag formats
    * the writer can emit; unparseable → null → row dropped (P7). */
  def fromRawDates(df: DataFrame, rawCol: String): DataFrame = {
    val parsed = lenientTs(col(rawCol))
    apply(df.withColumn("_ts", parsed), "_ts")
  }

  /** `coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2), ...)` —
    * null on failure, never throws (ANSI-safe). */
  def lenientTs(raw: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      try_to_timestamp(raw),                                       // "2024-01-02 03:04:05" / ISO
      try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),      // <time datetime="...">
      try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(raw, lit("yyyy-MM-dd")),
      try_to_timestamp(raw, lit("MMMM d, yyyy")),                  // free-text "January 2, 2024"
      try_to_timestamp(raw, lit("MMM d, yyyy"))
    )
}
