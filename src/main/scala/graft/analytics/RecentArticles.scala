package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}

/** Recency top-k — the reference's "recent articles" list.
  *
  * Reference (`app.py:137`): sort desc + limit 5. (The reference sorts on a
  * never-written field — SURVEY §1.3 documents that bug; we implement the
  * intended semantics: newest by ingest/event time.) Also `crawl.py:141`
  * (k=3, newest by surrogate id).
  *
  * `orderBy(...).limit(k)` compiles to `TakeOrderedAndProject`: each input
  * partition keeps a k-element heap, the driver merges #partitions × k rows —
  * no global sort, no full shuffle. This is the plan shape that survives
  * 100 TB (k is constant; cost is one scan + tiny merge).
  */
object RecentArticles {
  def apply(df: DataFrame, k: Int, orderKeys: Column*): DataFrame =
    df.orderBy(orderKeys: _*).limit(k)
}
