package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StopwordsSpec extends SparkSpec {
  import spark.implicits._

  test("set matches the reference literal: spot checks incl. the typos") {
    // `somthimes` and `anohter` are misspelled IN the reference
    // (app.py:47) — part of the pinned semantics.
    for (w <- Seq("the", "notion", "somthimes", "anohter", "s", "t"))
      assert(Stopwords.set.contains(w), w)
    assert(!Stopwords.set.contains("spark"))
  }

  test("keep() removes exactly the stopword rows") {
    val df = Seq("the", "spark", "and", "query").toDF("word")
    val kept = df.filter(Stopwords.keep(col("word"))).as[String].collect().toSet
    assert(kept == Set("spark", "query"))
  }

  test("anti-join variant is equivalent to the InSet predicate") {
    val df = (Stopwords.words ++ Seq("alpha", "beta", "the")).toDF("word")
    val viaSet  = df.filter(Stopwords.keep(col("word"))).as[String].collect().sorted
    val viaJoin = Stopwords.removeViaAntiJoin(df, "word").as[String].collect().sorted
    assert(viaSet.toSeq == viaJoin.toSeq)
    assert(viaSet.toSeq == Seq("alpha", "beta"))
  }

  test("double application is idempotent (reference applies it twice)") {
    val df = Seq("the", "spark").toDF("word")
    val once  = df.filter(Stopwords.keep(col("word")))
    val twice = once.filter(Stopwords.keep(col("word")))
    assert(once.count() == twice.count())
  }
}
