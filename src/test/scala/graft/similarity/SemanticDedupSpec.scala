package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The document-family SemDeDup faces (r16, the r15 verdict's #1).
  *
  * The load-bearing test is the first one: a PARAPHRASE pair — same
  * meaning, zero shared tokens — that the lexical dedup family provably
  * cannot see (disjoint token sets ⇒ exact Jaccard 0 ⇒ MinHash's
  * exact-verify step rejects every candidate regardless of banding
  * luck), while the embedding face merges it. That pair is exactly why
  * semantic dedup is a distinct MODALITY and not a variant of MinHash. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // Hand-planted embedding space: docs 0 and 1 are paraphrases (cosine
  // ≈ 0.9998), doc 2 is orthogonal content. 4-dim is enough — the
  // operators never assume a dimensionality.
  private val parVecs = Seq(
    (0L, Seq(1.0, 0.02, 0.0, 0.0)),
    (1L, Seq(0.99, 0.05, 0.01, 0.0)),
    (2L, Seq(0.0, 0.0, 1.0, 0.03)))
  // Two hand centers: the paraphrase direction and the orthogonal one —
  // assignment puts {0,1} in cluster 0 and {2} in cluster 1.
  private val centers: IndexedSeq[IndexedSeq[Double]] =
    IndexedSeq(IndexedSeq(1.0, 0.0, 0.0, 0.0), IndexedSeq(0.0, 0.0, 1.0, 0.0))

  test("paraphrase pair: disjoint tokens, MinHash provably misses, " +
      "semantic dedup merges (the modality claim)") {
    val docs = Seq(
      (0L, "the automobile accelerates rapidly beside elevated motorways"),
      (1L, "a car speeds up fast near tall highways"),
      (2L, "simmer chopped garlic gently while stirring fresh pasta sauce"))
      .toDF("doc_id", "text")
    // Provably disjoint: the engine's OWN tokenizer sees zero overlap
    // between the paraphrases, so their exact Jaccard is 0 and no
    // threshold > 0 can ever admit the pair through the verify step.
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(lower(col("text"))).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(toks(0L).toSet.intersect(toks(1L).toSet).isEmpty,
      "fixture broken: paraphrases share a token")
    val lexical = graft.dedup.Dedup.nearDupMinHash(docs, "doc_id", "text",
      threshold = 0.05)
    assert(lexical.count() == 0L,
      "MinHash must find nothing — the pair shares no tokens")

    val emb = parVecs.toDF("vec_id", "embedding")
    val sem = Similarity.semanticDedupKeepersWith(centers, emb, 0.9)
      .as[(Long, Long)].collect().toMap
    assert(sem(1L) == 0L, "the paraphrase must dedup to its twin")
    assert(sem(0L) == 0L && sem(2L) == 2L)
  }

  test("doc face: covered docs dedup via their embeddings, uncovered " +
      "docs keep themselves (partial-coverage left join)") {
    val docs = Seq(
      (0L, "covered"), (1L, "covered"), (2L, "covered"),
      (3L, "never embedded")).toDF("doc_id", "text")
    val emb = parVecs.toDF("vec_id", "embedding") // no vector for doc 3
    val out = Similarity.semanticDedupDocsWith(centers, docs, emb, 0.9)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  test("incremental face, planted: history match lifts the whole batch " +
      "component; unmatched components are novel exactly once") {
    // history: 0 and 2 are near-dups (component keeper 0); index = the
    // KEEPER's embedding only (the persisted-keepers contract)
    val hist = Seq(
      (0L, Seq(1.0, 0.02, 0.0, 0.0)),
      (2L, Seq(0.99, 0.03, 0.0, 0.0))).toDF("vec_id", "embedding")
    val index = hist.filter(col("vec_id") === 0L)
    // batch: 1 and 5 are mutual near-dups, 1 also matches history; 7 is
    // novel orthogonal content
    val batch = Seq(
      (1L, Seq(0.98, 0.04, 0.0, 0.0)),
      (5L, Seq(0.97, 0.06, 0.0, 0.0)),
      (7L, Seq(0.0, 0.0, 1.0, 0.01))).toDF("vec_id", "embedding")
    val out = Similarity
      .semanticDedupIncrementalWith(centers, batch, index, 0.9)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    // 5 dedups to history keeper 0 THROUGH its batch sibling 1 even if
    // its own direct match also exists — the component lift
    assert(out.toSeq == Seq((1L, 0L, 0), (5L, 0L, 0), (7L, 7L, 1)))
    // equals the full recompute over history ∪ batch, re-labeled to the
    // incremental contract (batch rows only; novel ⟺ component has no
    // history member)
    val full = Similarity.semanticDedupKeepersWith(
      centers, hist.union(batch), 0.9)
      .as[(Long, Long)].collect().toMap
    assert(full(1L) == 0L && full(5L) == 0L && full(7L) == 7L)
  }

  test("incremental face at fixture scale: novel flags are consistent " +
      "with the frozen-quantizer union components") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val hist = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 =!= 0)
    val centers = Ivf.fitCentroids(hist, 8)
    val histKeeperIds = Similarity
      .semanticDedupKeepersWith(centers, hist, 0.4)
      .filter(col("vec_id") === col("keeper_vec_id")).select("vec_id")
    val keeperSet = histKeeperIds.as[Long].collect().toSet
    val index = hist.join(histKeeperIds, Seq("vec_id"))
    val inc = Similarity
      .semanticDedupIncrementalWith(centers, batch, index, 0.4)
      .as[(Long, Long, Int)].collect()
    assert(inc.length == batch.count().toInt)
    // union components under the SAME frozen centers
    val full = Similarity.semanticDedupKeepersWith(centers, emb, 0.4)
      .as[(Long, Long)].collect().toMap
    val compHasHistory = full.groupBy(_._2)
      .map { case (comp, m) => comp -> m.keys.exists(_ % 2 == 0) }
    // The newKeepers novel contract: novel=1 marks exactly the NEW
    // KEEPER row of an unmatched batch component — its dups carry
    // novel=0 with the same (odd) keeper.
    inc.foreach { case (id, keeper, novel) =>
      if (novel == 1)
        assert(id == keeper && keeper % 2 == 1,
          s"novel row $id must be its own (batch) keeper")
      else if (keeper % 2 == 0) {
        // matched into history: the keeper must be a persisted history
        // keeper, and it can never be an INVENTED merge — the direct
        // match edge exists in the union too, so the union component
        // contains the keeper (and therefore a history doc)
        assert(keeperSet.contains(keeper), s"$id -> $keeper not a history keeper")
        assert(compHasHistory(full(id)),
          s"$id matched history but its union component has none")
        assert(full(keeper) == full(id),
          s"$id and its matched keeper $keeper split across union components")
      } else
        // a dup inside a novel batch component: batch edges are a
        // subset of union edges, so the two share a union component
        assert(full(keeper) == full(id),
          s"$id and its batch keeper $keeper split across union components")
    }
    // exactly one novel row per new component
    val novelRows = inc.filter(_._3 == 1)
    assert(novelRows.map(_._2).distinct.length == novelRows.length)
    assert(novelRows.nonEmpty, "fixture sanity: some batch content is new")
    assert(inc.exists(r => r._3 == 0 && r._2 % 2 == 0),
      "fixture sanity: some batch content matches history")
  }
}
