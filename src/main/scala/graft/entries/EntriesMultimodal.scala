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

import graft.EntryFixtures._

/** multimodal codec faces, session/event windows, and the crawl->dashboard capstone — one slice of the [[SparkEntry]] registry (r14
  * split: the registry lived as one 5,100-line file; each slice now
  * carries its domain's `queries` lambdas and their DuckDB `oracleSql`
  * side by side, and SparkEntry concatenates the slices). Entry-level
  * comments and oracle SQL are unchanged — this is a pure move. */
private[graft] object EntriesMultimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Range join: each event matched to the session interval containing
    // it (binned equi-join, one shuffle — not a nested-loop theta join).
    "events_in_sessions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.relational.RangeJoin.pointInInterval(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        EventWindows.userSessions(ev),
        "ts", "session_start", "session_end", Seq("user_id"),
        Seq("session_start" -> "session_start"), binSeconds = 1800L)
        .orderBy(col("event_id"))
    }),
    // media -> stub-decoded feature vectors -> exact kNN: the multimodal/
    // similarity composition end-to-end. FULL oracle since r9: the
    // md5-prefix stub features replay in DuckDB
    // (Multimodal.sqlMediaEmbeddingKnn); MultimodalSpec still pins
    // determinism across runs.
    "media_embedding_knn" -> ((s, dir) => {
      val feats = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Similarity.knnBruteForce(feats, feats.filter(col("vec_id") % 100 === 0), 3)
    }),
    // ---- [EXT] multimodal columns (binary payload + typed metadata) ----
    "multimodal_features" -> ((s, dir) =>
      Multimodal.featureSummary(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameIndex(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    "multimodal_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.mediaFromDocuments(Tables.documents(s, dir)), 64)
        .select(col("media_id"), col("kind"), col("orig_bytes"), col("resized_bytes"))
        .orderBy(col("media_id"))),
    // Perceptual image dedup: aHash signatures (stub decode, md5-prefix
    // grays) through the SAME banded Hamming join as SimHash text dedup.
    // Fixture plants RE-HOSTED COPIES (the real-web case this hash
    // exists for): every image in a 15-id block carries the block
    // anchor's payload, so the 5 images per block pair at hamming 0.
    "image_ahash_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchors = docs
        .select(col("doc_id").as("aid"), encode(col("text"), "UTF-8").as("data"))
      val media = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(anchors, Seq("aid"))
        .select(col("media_id"), lit("image").as("kind"), col("data"))
      Multimodal.imageAhashPairs(media)
    }),
    // REAL-codec aHash (r12): the same planted-copy fixture rendered as
    // actual 16x16 PNGs (deterministic per-pixel grays from the anchor
    // text), decoded back through javax.imageio, area-averaged to the
    // 8x8 grid, hashed, Hamming-joined. The oracle replays the PLANTED
    // pixels numerically, so a pass proves ImageIO's decode returned
    // exactly the encoded image — the stub remains only as the fallback
    // for formats the JDK can't read.
    "image_ahash_real_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.imageAhashPairsDecoded(Multimodal.pngMediaFromAnchors(anchored))
    }),
    // F141 (r13): REAL multi-frame demux — animated GIF is the one
    // frame-sequence container the JDK ships a codec for, so the frame
    // sampler's decode arm is real there: planted 8x8 indexed-gray
    // frames written through the JDK's own GIF sequence writer, demuxed
    // back, per-frame integer gray means hash-checked against the
    // numerically replayed plants. MP4-class containers remain the
    // loudly-documented env-blocked stub arm.
    "video_frames_real" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.videoFramesReal(anchored)
    }),
    // r15 (the r14 verdict's #6): real GIFs store most frames as
    // PARTIAL updates — sub-rect deltas at image-descriptor offsets
    // under disposal rules — so the demux now composites a real canvas
    // instead of rejecting placed frames to the stub. This fixture
    // plants genuine delta-encoded animations (4x4 rects at per-frame
    // offsets, accumulate disposal) through the JDK's own writer; the
    // oracle replays the canvas state numerically per frame.
    "video_frames_composited" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.videoFramesComposited(anchored)
    }),
    // F139 (r13): the F124 move repeated for AUDIO — the planted-copy
    // fixture rendered as real 256-sample PCM WAVs (deterministic u16
    // samples from the anchor text), decoded back through
    // javax.sound.sampled, block-averaged to a 64-bin amplitude grid,
    // hashed, Hamming-joined. The oracle replays the PLANTED samples
    // numerically, so a pass proves the JDK's WAV decode returned
    // exactly the encoded frames; the stub remains only as the
    // fallback for codecs the JDK can't read (MP3/AAC, and video).
    // F140 (r13): REAL image resize — the planted 16x16 PNGs downscaled
    // to 8x8 by exact per-channel integer area averaging (pure JDK, no
    // implementation-defined filtering), re-encoded lossless, decoded
    // BACK, and emitted pixel by pixel. The oracle computes the 2x2
    // block means numerically from the planted grays, so the hash gate
    // proves the whole encode->decode->resize->encode->decode chain is
    // bit-exact; the byte-decimation stub remains only as the fallback
    // arm for undecodable payloads.
    "image_resize_real" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.imageResizeReal(anchored)
    }),
    "audio_ahash_real_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val anchored = docs.filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"),
          (col("doc_id") - col("doc_id") % 15).as("aid"))
        .join(docs.select(col("doc_id").as("aid"), col("text")), Seq("aid"))
        .select(col("media_id"), col("text"))
      Multimodal.audioAhashPairsDecoded(Multimodal.wavMediaFromAnchors(anchored))
    }),
    // ---- E1+E2 capstone (r12): the reference's WHOLE loop end-to-end ----
    // A Trigger.AvailableNow micro-batch crawl (each batch = one 6-hour
    // tick re-fetching the SAME seed listings, whose content has grown)
    // through the sink-keyed anti-join dedup and real extraction, then
    // the four dashboard artifacts over the GROWN table as one frame
    // (crawl.py:155-162 + app.py:112-142 as a single oracle-checked
    // query). The oracle replays batch-equivalence: the streaming-grown
    // sink must equal the one-shot distinct article set, on which every
    // dashboard section is plain SQL over `documents`.
    "crawl_then_dashboard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"), col("text"),
          coalesce(col("source"), lit("Unknown")).as("src"))
        .withColumn("url", concat(lit("https://ex.com/a/"), col("doc_id")))
        .withColumn("tick", (col("doc_id") % 3).cast("int"))
        .withColumn("pdate", date_format(
          date_add(lit("2024-01-01").cast("date"),
            (col("doc_id") % 365).cast("int")), "yyyy-MM-dd"))
      val pages = base.select(col("url").as("sources"),
        concat(lit("<h1>Doc "), col("doc_id"), lit("</h1><p>"), col("text"),
          lit("</p><time datetime=\""), col("pdate"),
          lit("\">x</time>"))
          .as("html"))
      val listings = base
        .withColumn("block", concat(lit("<article><a href=\""),
          col("url"), lit("\">t</a></article>")))
        .join(Seq(0, 1, 2).toDF("tick2"), col("tick") <= col("tick2"))
        .groupBy(col("tick2"), col("src"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("block")))),
          x => x.getField("block"))).as("html"))
        .select(col("tick2").as("tick"), col("src").as("source"), col("html"))
      val parent = s"${System.getProperty("java.io.tmpdir")}/graft_crawl_" +
        System.getProperty("user.name", "u")
      val root = s"$parent/run_${s.sparkContext.applicationId}_${System.nanoTime()}"
      IvfStoreScratch.deleteOnExit(root)
      (0 until 3).foreach { t =>
        listings.filter(col("tick") === t).select("source", "html")
          .coalesce(1).write.mode("append").parquet(s"$root/in")
      }
      val stream = s.readStream.schema("source STRING, html STRING")
        .option("maxFilesPerTrigger", 1).parquet(s"$root/in")
      graft.streaming.StreamingIngest.crawlLoop(
        stream, pages, s"$root/sink", s"$root/ckpt").start().awaitTermination()
      graft.analytics.Dashboard.composite(s.read.parquet(s"$root/sink"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "events_in_sessions" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |sess AS (SELECT user_id, MIN(ts) AS session_start,
        |                MAX(ts) + INTERVAL 30 MINUTE AS session_end
        |         FROM s GROUP BY user_id, sid)
        |SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts,
        |       sess.session_start AS session_start
        |FROM events e JOIN sess ON e.user_id = sess.user_id
        |  AND e.ts >= sess.session_start AND e.ts < sess.session_end
        |ORDER BY event_id""".stripMargin,
    // media stub features (md5-prefix discipline, r9) -> brute-force kNN:
    // the whole multimodal/similarity composition replays in DuckDB.
    "media_embedding_knn" -> Multimodal.sqlMediaEmbeddingKnn(3),
    "image_ahash_pairs" -> Multimodal.sqlImageAhashPairs(3),
    "image_ahash_real_pairs" -> Multimodal.sqlImageAhashRealPairs(3),
    "audio_ahash_real_pairs" -> Multimodal.sqlAudioAhashRealPairs(3),
    "image_resize_real" -> Multimodal.sqlImageResizeReal,
    "video_frames_real" -> Multimodal.sqlVideoFramesReal,
    "video_frames_composited" -> Multimodal.sqlVideoFramesComposited,
    // crawl_then_dashboard: batch-equivalence — the streaming-grown sink
    // IS the one-shot distinct article set (each tick's re-crawls drop
    // in the sink-key anti-join), so the dashboard replays from
    // `documents` with the fixture's derivations inlined.
    "crawl_then_dashboard" ->
      s"""WITH arts AS (
         |  SELECT doc_id,
         |    'https://ex.com/a/' || CAST(doc_id AS VARCHAR) AS sources,
         |    text AS content,
         |    COALESCE(source, 'Unknown') AS src,
         |    strftime(DATE '2024-01-01' + (doc_id % 365) * INTERVAL 1 DAY,
         |             '%Y-%m-%d') AS pdate
         |  FROM documents),
         |tl_counts AS (SELECT pdate, COUNT(*) AS n FROM arts GROUP BY pdate),
         |tl_bounds AS (SELECT MIN(pdate) AS lo, MAX(pdate) AS hi FROM tl_counts),
         |tl_spine AS (
         |  SELECT strftime(CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
         |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d') AS pdate
         |  FROM tl_bounds),
         |words AS (
         |  SELECT word, COUNT(*) AS n
         |  FROM (SELECT UNNEST(regexp_extract_all(lower(content), '[a-zA-Z]+')) AS word
         |        FROM arts)
         |  WHERE length(word) >= 3 AND word NOT IN ${Stopwords.sqlInList}
         |  GROUP BY word ORDER BY n DESC, word ASC LIMIT 150)
         |SELECT section, k, v, n FROM (
         |  SELECT 'total' AS section, 'articles' AS k, CAST(NULL AS VARCHAR) AS v,
         |    (SELECT COUNT(*) FROM arts)::BIGINT AS n
         |  UNION ALL
         |  SELECT 'source', src, NULL, COUNT(*)::BIGINT FROM arts GROUP BY src
         |  UNION ALL
         |  SELECT 'timeline', sp.pdate, NULL, COALESCE(c.n, 0)::BIGINT
         |  FROM tl_spine sp LEFT JOIN tl_counts c USING (pdate)
         |  UNION ALL
         |  SELECT 'recent', CAST(rk AS VARCHAR), sources, CAST(NULL AS BIGINT)
         |  FROM (SELECT sources,
         |          row_number() OVER (ORDER BY pdate DESC, sources DESC) AS rk
         |        FROM arts) WHERE rk <= 5
         |  UNION ALL
         |  SELECT 'word', word, NULL, n::BIGINT FROM words)
         |ORDER BY section, k""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 1 THEN 'audio' WHEN 2 THEN 'video'
        |                  ELSE 'image' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  16 AS feat_dim
        |FROM documents ORDER BY media_id""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  UNNEST(generate_series(0, strlen(text) % 7)) AS frame_idx
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
    // resize stub arithmetic: keep every k-th byte (k = n div target),
    // capped at target; payloads <= target pass through
    "multimodal_resize" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        |  CAST(strlen(text) AS BIGINT) AS orig_bytes,
        |  CAST(CASE WHEN strlen(text) <= 64 THEN strlen(text)
        |       ELSE LEAST(64, (strlen(text) - 1) // GREATEST(1, strlen(text) // 64) + 1)
        |       END AS BIGINT) AS resized_bytes
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY media_id""".stripMargin,
  )
}
