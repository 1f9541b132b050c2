package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal-column operators for LLM-training-data pipelines
  * (north star): images/audio/video ride as opaque `binary` columns with
  * typed metadata, and per-media compute runs as partition-local typed
  * transformations.
  *
  * Codec status (r13): IMAGE DECODE IS REAL — [[imageAhashDecoded]]
  * decodes PNG/BMP/GIF/JPEG through the JDK's own `javax.imageio`
  * registry (no new dependency) and falls back to the deterministic
  * stub only for formats the JDK can't read, with the
  * `image_ahash_real_pairs` gate checking real decoded pixels
  * end-to-end. AUDIO PCM DECODE IS REAL TOO (r13) —
  * [[audioAhashDecoded]] decodes WAV/AIFF/AU through the JDK's
  * `javax.sound.sampled` registry with the same fallback contract and
  * the `audio_ahash_real_pairs` gate checking real decoded frames;
  * compressed audio (MP3/AAC) and ALL video decode REMAIN STUBBED —
  * this container has no such codecs — deriving deterministically from
  * payload bytes (clearly marked below). Everything AROUND the stubs is
  * the real engineering and is tested: the schema, the
  * `Dataset[T]`/`mapPartitions` batch shape (one codec instance per
  * PARTITION, not per row — exactly how a JNI decoder or an inference
  * session is amortized at scale), the 1→N frame-sampling generator,
  * and the driver-oracle-checkable metadata columns.
  *
  * Scale notes: media payloads never shuffle — every operator here is a
  * narrow map/flatMap over the scan; only extracted features (small,
  * fixed-width) flow into joins/aggregations downstream. Partition sizing
  * is controlled by `spark.sql.files.maxPartitionBytes` against the
  * payload column size, not row count.
  */
object Multimodal {

  val FeatureDim = 16

  case class MediaRow(media_id: Long, kind: String, data: Array[Byte])
  case class FeatureRow(media_id: Long, kind: String, n_bytes: Long,
                        feat_dim: Int, features: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic media table derived from `documents` (payload = UTF-8
    * text bytes standing in for encoded media; kind cycles by id). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("data"))

  /** ====== STUB ====== deterministic fake of a media decoder in place of
    * pixel/sample decoding. A real deployment swaps ONLY this function for
    * an actual codec call; the partition shape, schema and everything
    * downstream are unchanged.
    *
    * Feature j = u32(md5(payload ∥ ":j")[0..3]) / 2³² as float32 — the
    * repo's engine-reproducible md5-prefix discipline (r9), chosen over
    * the earlier FNV byte-roll so DuckDB can replay the features
    * (`md5(text || ':' || j)`) and `media_embedding_knn` carries a full
    * oracle instead of a rows-only check. The digest instance is the
    * per-partition "codec" handle, constructed once per partition. */
  private[multimodal] def fakeDecode(md: java.security.MessageDigest,
                                     data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) {
      md.reset()
      md.update(data)
      md.update((":" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = md.digest()
      val u32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      out(j) = (u32.toDouble / 4294967296.0).toFloat
      j += 1
    }
    out
  }

  /** Decode/feature-extract: one "codec" per partition, batch-iterated.
    * This is the Scala/JVM analog of an arrow-batched pandas UDF. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .mapPartitions { rows =>
        // ====== STUB ====== a real codec/session is constructed HERE,
        // once per partition, and closed when the iterator drains.
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { m =>
          val feats = fakeDecode(md, m.data)
          FeatureRow(m.media_id, m.kind, m.data.length.toLong, FeatureDim, feats)
        }
      }
      .toDF()
  }

  /** ====== STUB ====== deterministic byte decimation to ~targetBytes —
    * the single source of the resize fallback arithmetic, shared by the
    * stub operator [[resize]] and [[resizeImagesDecoded]]'s fallback
    * arm so their bit-identity is structural (r13 review). */
  private def stubDecimate(data: Array[Byte], targetBytes: Int): Array[Byte] = {
    val n = data.length
    if (n <= targetBytes) data
    else {
      val step = math.max(1, n / targetBytes)
      data.indices.collect { case i if i % step == 0 => data(i) }
        .take(targetBytes).toArray
    }
  }

  /** ====== STUB ====== the frame-count + byte-slice generator — the
    * single source of the frame fallback arithmetic, shared by the stub
    * operator [[sampleFrames]] and [[sampleFramesDecoded]]'s fallback
    * arm (r13 review). */
  private def stubFrameSlices(data: Array[Byte]): IndexedSeq[(Int, Array[Byte])] = {
    val nFrames = (data.length % 7) + 1
    (0 until nFrames).map { i =>
      val step = math.max(1, data.length / nFrames)
      val from = math.min(i * step, data.length)
      val until = math.min(from + step, data.length)
      (i, data.slice(from, until))
    }
  }

  /** Resize (image → image): binary-in/binary-out per-row transform, the
    * shape a real resampler plugs into. The payload transform is a STUB
    * ([[stubDecimate]]); schema and metadata handling are real: output
    * rows carry the original id/kind, the new payload, and both sizes
    * for audit. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .filter(_.kind == "image")
      .map { m =>
        val resized = stubDecimate(m.data, targetBytes)
        (m.media_id, m.kind, m.data.length.toLong, resized.length.toLong, resized)
      }
      .toDF("media_id", "kind", "orig_bytes", "resized_bytes", "data")
  }

  /** Frame sampling (video → 1..N frame rows): the 1→N generator shape.
    * Frame count and slices are the STUB generator
    * ([[stubFrameSlices]]); the real demux arm lives in
    * [[sampleFramesDecoded]]. */
  def sampleFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .filter(_.kind == "video")
      .flatMap(m => stubFrameSlices(m.data).map { case (i, bytes) =>
        FrameRow(m.media_id, i, bytes)
      })
      .toDF()
  }

  /** [EXT] Average-hash (aHash) image signatures — the classic
    * perceptual near-dup hash (downsample to 8×8 gray, threshold each
    * pixel at the mean, pack 64 bits): unlike the byte-level md5 exact
    * dedup, re-encoded/resized COPIES of an image keep their aHash
    * close, so image dedup runs as a Hamming-ball join exactly like
    * SimHash text dedup. The decode+downsample is the repo's
    * ====== STUB ====== (gray pixel i = u32 md5-prefix of
    * payload ∥ ":px" ∥ i — DuckDB-replayable, the [[fakeDecode]]
    * discipline); everything downstream is real: the exact integer
    * mean (Σ DIV 64), MSB-first bit pack in plain long arithmetic, and
    * the banded Hamming self-join REUSED from the text family
    * ([[graft.dedup.Dedup.hammingPairs]]) — one signature machinery,
    * two modalities. Scan-stage per-row expressions; payloads never
    * shuffle, only (id, 8-byte hash) rows reach the join. */
  def imageAhash(media: DataFrame): DataFrame = {
    val grays = (0 until 64).map { i =>
      conv(substring(md5(concat(col("data"),
        lit(s":px$i").cast("binary"))), 1, 8), 16, 10).cast("long")
    }
    media.filter(col("kind") === "image")
      .select(col("media_id"), array(grays: _*).as("g"))
      .withColumn("mean", expr("aggregate(g, 0L, (a, x) -> a + x) DIV 64"))
      .withColumn("sh", expr(
        "aggregate(transform(sequence(0, 63), i -> " +
          "CASE WHEN element_at(g, i + 1) > mean " +
          "THEN shiftleft(1L, 63 - i) ELSE 0L END), 0L, (a, x) -> a + x)"))
      .select(col("media_id"), col("sh"))
  }

  /** Near-dup image pairs at Hamming ≤ maxDist over [[imageAhash]] —
    * `image_ahash_pairs` query. */
  def imageAhashPairs(media: DataFrame, maxDist: Int = 3): DataFrame =
    graft.dedup.Dedup.hammingPairs(
      imageAhash(media).select(col("media_id").as("id"), col("sh")), maxDist)

  // ------------------------------------------------ real codec path (r12)

  /** Decode `data` with the JDK's OWN codec registry (`javax.imageio` —
    * PNG/BMP/GIF/JPEG readers ship in every JRE; zero new dependencies)
    * and downsample to aHash's 8×8 integer grayscale grid: per pixel
    * gray = (299·r + 587·g + 114·b) / 1000 (integer Rec-601 luma), per
    * block value = block-sum / block-pixel-count (integer area
    * average over exact `⌊k·dim∕8⌋` boundaries). `None` when no
    * registered reader accepts the bytes or the image is smaller than
    * the grid — the caller falls back to the deterministic stub, which
    * keeps the operator TOTAL on formats the JDK can't read (the
    * retained-stub contract; the stub is no longer the only path). */
  private[multimodal] def decodeGray8(data: Array[Byte]): Option[Array[Long]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case _: java.io.IOException => null; case _: RuntimeException => null }
    if (img == null || img.getWidth < 8 || img.getHeight < 8) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Long](64)
      var by = 0
      while (by < 8) {
        val y0 = by * h / 8
        val y1 = (by + 1) * h / 8
        var bx = 0
        while (bx < 8) {
          val x0 = bx * w / 8
          val x1 = (bx + 1) * w / 8
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += (299L * r + 587L * g + 114L * b) / 1000L
              n += 1
              x += 1
            }
            y += 1
          }
          out(by * 8 + bx) = sum / n
          bx += 1
        }
        by += 1
      }
      Some(out)
    }
  }

  /** The [[imageAhash]] stub grays as driver/executor-side Scala — the
    * fallback arm of [[imageAhashDecoded]], bit-identical to the column
    * expression (u32 md5 prefix of payload ∥ ":px" ∥ i). */
  private def stubGray64(md: java.security.MessageDigest,
                         data: Array[Byte]): Array[Long] = {
    val out = new Array[Long](64)
    var i = 0
    while (i < 64) {
      md.reset()
      md.update(data)
      md.update((":px" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = md.digest()
      out(i) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      i += 1
    }
    out
  }

  /** 64 grays → the aHash long: exact integer mean (Σ / 64), MSB-first
    * sign pack — the [[imageAhash]] arithmetic in plain Scala. */
  private[multimodal] def packAhash(g: Array[Long]): Long = {
    var sum = 0L
    var i = 0
    while (i < 64) { sum += g(i); i += 1 }
    val mean = sum / 64
    var sh = 0L
    i = 0
    while (i < 64) {
      if (g(i) > mean) sh |= (1L << (63 - i))
      i += 1
    }
    sh
  }

  /** aHash over REAL decoded pixels where the JDK can decode the
    * payload, the deterministic stub elsewhere — one total operator,
    * two arms. Partition-mapped like [[decodeFeatures]] (codec state
    * per partition: the in-memory-only ImageIO mode is set once, the
    * stub's digest instance is reused). Payloads never shuffle; only
    * (id, 8-byte hash) rows leave the scan stage. */
  def imageAhashDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("media_id", "kind", "data").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { m =>
          val g = decodeGray8(m.data).getOrElse(stubGray64(md, m.data))
          (m.media_id, packAhash(g))
        }
      }
      .toDF("media_id", "sh")
  }

  /** Near-dup image pairs over [[imageAhashDecoded]] —
    * `image_ahash_real_pairs` query (real-codec arm on its PNG
    * fixture). */
  def imageAhashPairsDecoded(media: DataFrame, maxDist: Int = 3): DataFrame =
    graft.dedup.Dedup.hammingPairs(
      imageAhashDecoded(media).select(col("media_id").as("id"), col("sh")),
      maxDist)

  /** Deterministic 16×16 grayscale PNG per row of `anchored(media_id,
    * text)` — the ENCODE half of the real-codec roundtrip: pixel
    * idx = y·16+x carries gray = first byte of md5(text ∥ ":q" ∥ idx),
    * a function DuckDB replays numerically, so the oracle checks the
    * REAL ImageIO decode end-to-end (encode → PNG bytes → decode →
    * 2×2 area average → hash) without ever decoding in SQL. Copies
    * come from the caller feeding block-anchor texts, as in the stub
    * fixture. */
  def pngMediaFromAnchors(anchored: DataFrame): DataFrame = {
    val spark = anchored.sparkSession
    import spark.implicits._
    anchored.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var idx = 0
          while (idx < 256) {
            md.reset()
            md.update((text + ":q" + idx)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val gray = md.digest()(0) & 0xff
            img.setRGB(idx % 16, idx / 16, (gray << 16) | (gray << 8) | gray)
            idx += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "data")
  }

  /** DuckDB mirror of the real-codec pipeline over the PNG fixture:
    * the 16×16 planted grays replay from the md5 byte, the 2×2 area
    * average and luma are exact integer identities on equal channels
    * ((299+587+114)·v / 1000 = v), then the [[sqlImageAhashPairs]]
    * mean/pack/Hamming tail. What this checks is that ImageIO's
    * PNG decode returned EXACTLY the planted pixels — a lossy or
    * color-managed roundtrip would flip hash bits and fail the gate. */
  def sqlImageAhashRealPairs(maxDist: Int): String =
    s"""WITH img AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 0),
       |px AS (
       |  SELECT media_id, pp.i AS i,
       |    CAST(('0x' || substring(md5(text || ':q' || pp.i), 1, 2))::UBIGINT
       |      AS BIGINT) AS gray
       |  FROM img CROSS JOIN (SELECT UNNEST(range(0, 256)) AS i) pp),
       |g AS (
       |  SELECT media_id,
       |    ((i // 16) // 2) * 8 + (i % 16) // 2 AS bi,
       |    SUM(gray) // 4 AS gray
       |  FROM px GROUP BY media_id, ((i // 16) // 2) * 8 + (i % 16) // 2),
       |m AS (SELECT media_id, SUM(gray) // 64 AS mean FROM g GROUP BY 1),
       |sig AS (
       |  SELECT g.media_id,
       |    CAST(SUM(CASE WHEN g.gray > m.mean THEN
       |      CASE WHEN g.bi = 0 THEN -9223372036854775807 - 1
       |           ELSE CAST(1 AS BIGINT) << CAST(63 - g.bi AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS sh
       |  FROM g JOIN m USING (media_id) GROUP BY 1),
       |p AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |  FROM sig a JOIN sig b ON a.media_id < b.media_id)
       |SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB mirror of [[imageAhashPairs]] over the planted-copy fixture
    * (images are doc_id ≡ 0 mod 3; each carries its 15-id block
    * anchor's payload — the re-hosted-copy case): same md5-prefix
    * grays, integer mean, the simhash sign-bit pack, brute-force
    * Hamming filter (the banding is a lossless candidate generator at
    * maxDist ≤ 3, so brute force IS the semantic). */
  def sqlImageAhashPairs(maxDist: Int): String =
    s"""WITH img AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 0),
       |g AS (
       |  SELECT media_id, bb.i AS i,
       |    CAST(('0x' || substring(md5(text || ':px' || bb.i), 1, 8))::UBIGINT
       |      AS BIGINT) AS gray
       |  FROM img CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i) bb),
       |m AS (SELECT media_id, SUM(gray) // 64 AS mean FROM g GROUP BY 1),
       |sig AS (
       |  SELECT g.media_id,
       |    CAST(SUM(CASE WHEN g.gray > m.mean THEN
       |      CASE WHEN g.i = 0 THEN -9223372036854775807 - 1
       |           ELSE CAST(1 AS BIGINT) << CAST(63 - g.i AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS sh
       |  FROM g JOIN m USING (media_id) GROUP BY 1),
       |p AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |  FROM sig a JOIN sig b ON a.media_id < b.media_id)
       |SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------ real resize path (r13)

  /** REAL image downscale (F140, the F124 move for the resize kernel):
    * per output pixel, the integer area average of its exact
    * `⌊k·dim∕n⌋`-bounded source block, computed per RGB channel — the
    * same arithmetic [[decodeGray8]] proved bit-exact, generalized to
    * color and an arbitrary target grid. Pure JDK: decode through the
    * `javax.imageio` registry, averaged in plain long arithmetic (no
    * `getScaledInstance`/`AffineTransform` — their filtering is
    * implementation-defined, which would break cross-engine replay),
    * re-encoded as lossless PNG. `None` when the payload doesn't decode
    * or is smaller than the target grid — callers keep the
    * deterministic stub for those rows (the retained-stub contract). */
  private[multimodal] def resizeRgb(data: Array[Byte], w: Int,
                                    h: Int): Option[Array[Byte]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
      catch { case _: java.io.IOException => null; case _: RuntimeException => null }
    if (img == null || img.getWidth < w || img.getHeight < h) None
    else {
      val sw = img.getWidth
      val sh = img.getHeight
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var oy = 0
      while (oy < h) {
        val y0 = oy * sh / h
        val y1 = (oy + 1) * sh / h
        var ox = 0
        while (ox < w) {
          val x0 = ox * sw / w
          val x1 = (ox + 1) * sw / w
          var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              n += 1
              x += 1
            }
            y += 1
          }
          out.setRGB(ox, oy,
            (((sr / n).toInt) << 16) | (((sg / n).toInt) << 8) | (sb / n).toInt)
          ox += 1
        }
        oy += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Dimension-targeted image resize over REAL decoded pixels where the
    * JDK can decode, the byte-decimation stub elsewhere — the
    * production face of [[resize]] (which remains the stub operator the
    * stub fixtures pin). Output carries both payloads' byte sizes plus
    * a decoded flag so callers can audit the arm split. */
  def resizeImagesDecoded(media: DataFrame, targetW: Int = 8,
                          targetH: Int = 8,
                          stubTargetBytes: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "data").as[MediaRow]
      .filter(_.kind == "image")
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { m =>
          resizeRgb(m.data, targetW, targetH) match {
            case Some(png) =>
              (m.media_id, m.kind, m.data.length.toLong, png.length.toLong,
                1, png)
            case None =>
              val resized = stubDecimate(m.data, stubTargetBytes)
              (m.media_id, m.kind, m.data.length.toLong,
                resized.length.toLong, 0, resized)
          }
        }
      }
      .toDF("media_id", "kind", "orig_bytes", "resized_bytes", "decoded", "data")
  }

  /** `image_resize_real` query: the planted-PNG fixture resized 16×16 →
    * 8×8 through [[resizeImagesDecoded]], then the OUTPUT PNGs decoded
    * BACK engine-side ([[decodeGray8]] — on an 8×8 image its blocks are
    * single pixels) and emitted as (media_id, pix_idx, gray) rows. The
    * oracle replays the planted 16×16 grays numerically and takes the
    * exact 2×2 integer block means, so a hash match proves the WHOLE
    * chain — encode → PNG → decode → area-average resize → re-encode →
    * re-decode — returned exactly the arithmetic pixels (any lossy or
    * color-managed step anywhere would shift a mean). */
  def imageResizeReal(anchored: DataFrame): DataFrame =
    imageResizeRealFromMedia(pngMediaFromAnchors(anchored))

  /** [[imageResizeReal]]'s media-level face: the resize→re-decode chain
    * over an ALREADY-built media frame — the seam that lets a spec (and
    * any caller with real payloads) drive the stub arm with undecodable
    * bytes, which the anchored face can't reach (it always feeds its own
    * lossless PNGs; r13 ADVICE). */
  def imageResizeRealFromMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    resizeImagesDecoded(media, 8, 8)
      .select("media_id", "decoded", "data").as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, decoded, png) =>
          // TOTAL like every real-codec face (r13 review): a stub-arm
          // row (decimated bytes, not a PNG) still emits its 64 pixel
          // rows — deterministic md5-byte stand-ins — instead of
          // silently vanishing from the output. On the planted-PNG
          // fixture every row decodes, so the oracle never sees this
          // arm; the 8×8 decode of our OWN lossless output can only
          // fail if the resize wrote malformed bytes, which the gate
          // would then catch as missing/mismatched rows.
          val grays: Array[Long] =
            if (decoded == 1) decodeGray8(png).getOrElse(Array.empty[Long])
            else Array.tabulate(64) { i =>
              md.reset()
              md.update(png)
              md.update((":rp" + i)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              (md.digest()(0) & 0xffL)
            }
          grays.iterator.zipWithIndex.map { case (v, i) => (id, i.toLong, v) }
        }
      }
      .toDF("media_id", "pix_idx", "gray")
      .orderBy(col("media_id"), col("pix_idx"))
  }

  /** DuckDB mirror of [[imageResizeReal]] — planted grays, 2×2 integer
    * block means, one row per resized pixel. */
  def sqlImageResizeReal: String =
    s"""WITH img AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 0),
       |px AS (
       |  SELECT media_id, pp.i AS i,
       |    CAST(('0x' || substring(md5(text || ':q' || pp.i), 1, 2))::UBIGINT
       |      AS BIGINT) AS gray
       |  FROM img CROSS JOIN (SELECT UNNEST(range(0, 256)) AS i) pp)
       |SELECT media_id,
       |  ((i // 16) // 2) * 8 + (i % 16) // 2 AS pix_idx,
       |  CAST(SUM(gray) // 4 AS BIGINT) AS gray
       |FROM px GROUP BY media_id, ((i // 16) // 2) * 8 + (i % 16) // 2
       |ORDER BY media_id, pix_idx""".stripMargin

  // ------------------------------------------ real frame-sample path (r13)

  /** Exact 256-gray indexed palette — GIF is palette-based, and the
    * JDK's GIF writer passes an IndexColorModel through LOSSLESSLY
    * while quantizing anything else; planting frames in this model is
    * what makes the container roundtrip bit-exact. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Per-frame GIF control tuple from the native metadata tree:
    * (left, top, disposalMethod) — the image-descriptor placement plus
    * the graphic-control disposal rule ("none" when the extension is
    * absent, the GIF89a default). Real-world animated GIFs routinely
    * store frame 2+ as a sub-rect DELTA over the previous canvas;
    * [[decodeGifComposited]] applies these controls to a real canvas
    * (r15 — the r14 verdict's #6 replaced the r13 reject-to-stub rule
    * with actual compositing). Any metadata failure reads as
    * undecodable — reject to the stub arm. */
  private def gifFrameControl(reader: javax.imageio.ImageReader,
                              f: Int): Option[(Int, Int, String)] =
    try {
      val root = reader.getImageMetadata(f)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = root.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) None
      else {
        val e = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        def at(a: String): Int = {
          val v = e.getAttribute(a)
          if (v == null || v.isEmpty) 0 else v.toInt
        }
        val gce = root.getElementsByTagName("GraphicControlExtension")
        val disp =
          if (gce.getLength == 0) "none"
          else {
            val d = gce.item(0).asInstanceOf[org.w3c.dom.Element]
              .getAttribute("disposalMethod")
            if (d == null || d.isEmpty) "none" else d
          }
        Some((at("imageLeftPosition"), at("imageTopPosition"), disp))
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** GIF logical-screen size from the stream metadata — the display
    * canvas every frame places into. Absent/corrupt metadata → None
    * (the caller falls back to the frames' union extent). */
  private def gifLogicalScreen(
      reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val root = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = root.getElementsByTagName("LogicalScreenDescriptor")
      if (nodes.getLength == 0) None
      else {
        val e = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        Some((e.getAttribute("logicalScreenWidth").toInt,
          e.getAttribute("logicalScreenHeight").toInt))
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None // includes the attr-absent NPEs
    }

  /** Exact integer Rec-601 luma mean over a raster — sum of per-pixel
    * `(299R + 587G + 114B) / 1000` over all pixels, divided by count.
    * For a gray pixel the luma IS the gray (299+587+114 = 1000), the
    * identity every planted-fixture oracle replays. */
  private def lumaMean(img: java.awt.image.BufferedImage): Long =
    lumaSumRect(img, 0, 0, img.getWidth, img.getHeight) /
      (img.getWidth.toLong * img.getHeight.toLong)

  /** The same per-pixel-floored luma, summed over a sub-rect only —
    * the incremental-compositing primitive: [[decodeGifComposited]]
    * rescans each frame's DIRTY RECT (before/after draw and disposal)
    * instead of the whole canvas, so decode cost is O(Σ frame rects),
    * not O(nFrames × canvasPixels) (r15 ADVICE — a few-KB GIF
    * declaring a 4000×4000 screen with thousands of 1×1 delta frames
    * must not buy ~10¹⁰ getRGB calls in one task row). Same integer
    * arithmetic, so the full-canvas mean is bit-identical. */
  private def lumaSumRect(img: java.awt.image.BufferedImage,
                          x0: Int, y0: Int, w: Int, h: Int): Long = {
    var sum = 0L
    var y = y0
    while (y < y0 + h) {
      var x = x0
      while (x < x0 + w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sum += (299L * r + 587L * g + 114L * b) / 1000L
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Canvas ceiling for [[decodeGifComposited]] — payloads declaring a
    * larger logical screen / union extent reject to the stub arm before
    * any allocation. */
  private val MaxGifCanvasPixels = 16L * 1024L * 1024L

  /** COMPOSITED GIF demux (r15, the r14 verdict's #6): real animated
    * GIFs store most frames as partial updates — a sub-rect raster
    * placed at an image-descriptor offset, composited over the living
    * canvas under a per-frame disposal rule — so the reject-to-stub
    * rule r13 shipped made the stub arm the COMMON case in the wild.
    * This is the real decode: frame f's feature is the luma mean of the
    * WHOLE canvas after drawing frame f, exactly what a viewer shows.
    *
    *  - canvas = logical screen, widened to the frames' union extent
    *    when a frame escapes it (defensive: such files exist); pixels
    *    no frame ever covers render BLACK (luma 0) — viewers disagree
    *    between background color and transparency here, and black keeps
    *    the mean total and deterministic;
    *  - placement honors (left, top); transparent pixels leave the
    *    underlying canvas visible (Java2D bitmask transparency);
    *  - disposal: `none`/`doNotDispose` accumulate,
    *    `restoreToBackgroundColor` clears the frame's rect back to
    *    BLACK — a deliberate, deterministic approximation: modern
    *    viewers render this disposal as clear-to-TRANSPARENT (the
    *    GIF background color index is near-universally ignored), and
    *    transparent over this RGB canvas's black base IS black, so
    *    the approximation matches dominant browser behavior; wild
    *    GIFs relying on a literal palette background color deviate
    *    here (r15 ADVICE — claim narrowed to what is implemented);
    *    `restoreToPrevious` restores the pre-frame canvas;
    *  - a full-canvas opaque frame sequence composites to exactly the
    *    raw per-frame means, so the pre-r15 planted fixture is
    *    bit-identical through this path (MultimodalSpec pins it).
    *
    * `None` (→ stub arm) when any frame's metadata or raster fails to
    * decode, or the canvas is under the 8×8 grid floor. */
  private def decodeGifComposited(reader: javax.imageio.ImageReader,
                                  n: Int): Option[Array[Long]] = {
    val ctrls = new Array[(Int, Int, String)](n)
    val dims = new Array[(Int, Int)](n)
    var f = 0
    var ok = true
    while (ok && f < n) {
      gifFrameControl(reader, f) match {
        case Some(c) =>
          ctrls(f) = c
          try dims(f) = (reader.getWidth(f), reader.getHeight(f))
          catch {
            case _: java.io.IOException => ok = false
            case _: RuntimeException => ok = false
          }
        case None => ok = false
      }
      f += 1
    }
    if (!ok) None
    else {
      val (lw, lh) = gifLogicalScreen(reader).getOrElse((0, 0))
      val cw = math.max(lw, (0 until n).map(i => ctrls(i)._1 + dims(i)._1).max)
      val ch = math.max(lh, (0 until n).map(i => ctrls(i)._2 + dims(i)._2).max)
      // canvas dims come straight from untrusted header fields (u16
      // logical screen + u16 placement + frame dims) and the allocation
      // happens before any raster decodes — an uncapped 40000×40000
      // header would OOM the task and 65535+65535 overflows Int, both
      // violating the totality contract (stub arm, never a task kill).
      // 16 MPx ≈ 64 MB INT_RGB, far above any real animated GIF.
      if (cw < 8 || ch < 8 || cw.toLong * ch.toLong > MaxGifCanvasPixels) None
      else {
        val canvas = new java.awt.image.BufferedImage(
          cw, ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = canvas.createGraphics()
        try {
          val out = new Array[Long](n)
          val totalPx = cw.toLong * ch.toLong
          // Incremental luma sum: the canvas starts all-black (sum 0);
          // each frame only touches its own rect (draw, background
          // clear, previous-restore are all rect-local), so the sum is
          // maintained by rescanning the DIRTY RECT before/after each
          // mutation — O(Σ frame rects) total, never O(n × canvas)
          // (r15 ADVICE CPU-amplification fix). Snapshots for
          // restoreToPrevious copy the rect only, for the same reason.
          var lumaSum = 0L
          f = 0
          while (ok && f < n) {
            val img =
              try reader.read(f)
              catch {
                case _: java.io.IOException => null
                case _: RuntimeException => null
              }
            if (img == null) ok = false
            else {
              val (left, top, disp) = ctrls(f)
              // clip to the canvas: drawImage/fillRect clip silently,
              // and the rect sums must walk the same clipped region
              val fw = math.min(img.getWidth, cw - left)
              val fh = math.min(img.getHeight, ch - top)
              if (fw <= 0 || fh <= 0) out(f) = lumaSum / totalPx // empty rect: canvas unchanged
              else {
                val rect = new java.awt.Rectangle(left, top, fw, fh)
                val before = lumaSumRect(canvas, left, top, fw, fh)
                val snapshot =
                  if (disp == "restoreToPrevious") canvas.getData(rect) else null
                g2.drawImage(img, left, top, null)
                val after = lumaSumRect(canvas, left, top, fw, fh)
                lumaSum += after - before
                out(f) = lumaSum / totalPx
                disp match {
                  case "restoreToBackgroundColor" =>
                    g2.setColor(java.awt.Color.BLACK)
                    g2.fillRect(left, top, fw, fh)
                    lumaSum -= after // rect is now all-black (luma 0)
                  case "restoreToPrevious" =>
                    canvas.setData(snapshot)
                    lumaSum += before - after
                  case _ => ()
                }
              }
              f += 1
            }
          }
          if (ok) Some(out) else None
        } finally g2.dispose()
      }
    }
  }

  /** Decode a MULTI-FRAME payload through the JDK's imageio registry
    * (GIF is the one shipped container with real frame sequences) into
    * per-frame grayscale means.
    *
    * GIF takes the COMPOSITED path ([[decodeGifComposited]], r15):
    * placement offsets, sub-canvas partial updates, transparency and
    * disposal rules all apply to a real canvas, and frame f's mean is
    * the canvas luma after drawing frame f — what a viewer shows. Other
    * multi-frame containers keep the raw full-frame rule (every frame
    * equal-sized) since they carry no placement semantics.
    *
    * `None` when the bytes don't decode, expose no frame count, or the
    * canvas is under the 8×8 grid — the caller falls back to the
    * deterministic stub (MP4-class containers stay env-blocked and
    * loudly documented). */
  private[multimodal] def decodeFrameMeans(data: Array[Byte]): Option[Array[Long]] = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      catch { case _: java.io.IOException => null }
    if (iis == null) None
    else {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          // RuntimeException caught beside IOException throughout: a
          // payload with a valid magic but a corrupt body makes the
          // JDK's GIF reader throw unchecked (index/negative-size)
          // errors, and the operator's totality contract says such
          // rows take the stub arm, never kill the task (r13 review).
          val n =
            try reader.getNumImages(true)
            catch {
              case _: java.io.IOException => -1
              case _: RuntimeException => -1
            }
          if (n < 1) None
          else {
            val isGif =
              try "gif".equalsIgnoreCase(reader.getFormatName)
              catch {
                case _: java.io.IOException => false
                case _: RuntimeException => false
              }
            if (isGif) decodeGifComposited(reader, n)
            else {
              // non-GIF sequences carry no placement semantics: raw
              // equal-size full frames, frame mean = raster mean
              val out = new Array[Long](n)
              var f = 0
              var ok = true
              var w0 = -1; var h0 = -1
              while (ok && f < n) {
                val img =
                  try reader.read(f)
                  catch {
                    case _: java.io.IOException => null
                    case _: RuntimeException => null
                  }
                if (f == 0 && img != null) { w0 = img.getWidth; h0 = img.getHeight }
                if (img == null || img.getWidth < 8 || img.getHeight < 8 ||
                    img.getWidth != w0 || img.getHeight != h0)
                  ok = false
                else {
                  out(f) = lumaMean(img)
                  f += 1
                }
              }
              if (ok) Some(out) else None
            }
          }
        } finally { reader.dispose(); iis.close() }
      }
    }
  }

  /** Frame sampling over REAL decoded containers where the JDK can
    * demux (animated GIF), the deterministic stub elsewhere — the
    * [[sampleFrames]] contract with real frames: one row per frame,
    * carrying the frame's exact integer gray mean as the
    * oracle-checkable feature. Stub arm: the [[sampleFrames]] slice
    * generator's frame count with mean = first byte of md5(slice)
    * (deterministic, spec-pinned). */
  def sampleFramesDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "kind", "data").as[MediaRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { m =>
          decodeFrameMeans(m.data) match {
            case Some(means) =>
              means.iterator.zipWithIndex.map { case (g, i) =>
                (m.media_id, i, g, 1)
              }
            case None =>
              stubFrameSlices(m.data).iterator.map { case (i, bytes) =>
                md.reset()
                md.update(bytes)
                (m.media_id, i, (md.digest()(0) & 0xff).toLong, 0)
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "mean_gray", "decoded")
  }

  /** Deterministic animated GIF per row of `anchored(media_id, text)` —
    * the ENCODE half of the frame roundtrip: nFrames = (|text| mod 3)+2
    * frames of 8×8 indexed-gray pixels, frame f pixel idx carrying
    * gray = first byte of md5(text ∥ ":f" ∥ f ∥ ":p" ∥ idx), written
    * through the JDK's own GIF sequence writer. DuckDB replays the
    * planted grays numerically, so the oracle checks the REAL
    * multi-frame demux end-to-end. */
  def gifMediaFromAnchors(anchored: DataFrame): DataFrame = {
    val spark = anchored.sparkSession
    import spark.implicits._
    anchored.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val nFrames = (text.length % 3) + 2
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
              grayPalette)
            var idx = 0
            while (idx < 64) {
              md.reset()
              md.update((text + ":f" + f + ":p" + idx)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val gray = md.digest()(0) & 0xff
              img.setRGB(idx % 8, idx / 8, (gray << 16) | (gray << 8) | gray)
              idx += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          (id, "video", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "data")
  }

  /** Deterministic PARTIAL-UPDATE animated GIF per row of
    * `anchored(media_id, text)` — the encode half of the COMPOSITED
    * frame roundtrip (r15): frame 0 is the full 8×8 base raster (grays
    * planted like [[gifMediaFromAnchors]]), every later frame f is a
    * 4×4 sub-rect DELTA placed at `((2f) mod 5, (3f) mod 5)` with grays
    * md5(text ∥ ":f" ∥ f ∥ ":p" ∥ rectIdx), disposal `doNotDispose` so
    * updates accumulate — the partial-update idiom real animated GIFs
    * use. Placement and disposal ride the per-frame image metadata
    * through the JDK's own GIF sequence writer, so the bytes are a real
    * delta-encoded animation, not a synthetic metadata pose. */
  def gifPartialMediaFromAnchors(anchored: DataFrame): DataFrame = {
    val spark = anchored.sparkSession
    import spark.implicits._
    anchored.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val md = java.security.MessageDigest.getInstance("MD5")
        def gray(text: String, f: Int, idx: Int): Int = {
          md.reset()
          md.update((text + ":f" + f + ":p" + idx)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.digest()(0) & 0xff
        }
        rows.map { case (id, text) =>
          val nFrames = (text.length % 3) + 2
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val full = f == 0
            val side = if (full) 8 else 4
            val img = new java.awt.image.BufferedImage(
              side, side, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED,
              grayPalette)
            var idx = 0
            while (idx < side * side) {
              val g = gray(text, f, idx)
              img.setRGB(idx % side, idx / side, (g << 16) | (g << 8) | g)
              idx += 1
            }
            val meta = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), null)
            val fmt = "javax_imageio_gif_image_1.0"
            val root = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
            val desc = root.getElementsByTagName("ImageDescriptor").item(0)
              .asInstanceOf[org.w3c.dom.Element]
            desc.setAttribute("imageLeftPosition",
              (if (full) 0 else (f * 2) % 5).toString)
            desc.setAttribute("imageTopPosition",
              (if (full) 0 else (f * 3) % 5).toString)
            // the default image metadata carries interlaceFlag=TRUE,
            // and the JDK pair mis-roundtrips interlaced sub-8-row
            // rasters (rows read back zeroed) — plant progressive
            desc.setAttribute("interlaceFlag", "FALSE")
            val gceN = root.getElementsByTagName("GraphicControlExtension")
            val gce =
              if (gceN.getLength > 0)
                gceN.item(0).asInstanceOf[org.w3c.dom.Element]
              else {
                val e = new javax.imageio.metadata
                  .IIOMetadataNode("GraphicControlExtension")
                e.setAttribute("userInputFlag", "FALSE")
                e.setAttribute("transparentColorFlag", "FALSE")
                e.setAttribute("delayTime", "10")
                e.setAttribute("transparentColorIndex", "0")
                root.appendChild(e)
                e
              }
            gce.setAttribute("disposalMethod", "doNotDispose")
            meta.setFromTree(fmt, root)
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, meta), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          (id, "video", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "data")
  }

  /** `video_frames_real` query: the planted-GIF fixture demuxed back
    * through [[sampleFramesDecoded]] — (media_id, frame_idx, mean_gray)
    * per real decoded frame. Video ids are the `doc_id ≡ 2 (mod 3)`
    * rows of the standing media fixture with their 15-id block anchors
    * (the re-hosted-clip case). */
  def videoFramesReal(anchored: DataFrame): DataFrame =
    sampleFramesDecoded(gifMediaFromAnchors(anchored))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("mean_gray"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** DuckDB mirror of [[videoFramesReal]]: planted per-frame grays from
    * the md5 byte, exact integer mean over each frame's 64 pixels (the
    * luma of a gray pixel is the gray itself — (299+587+114)·v∕1000 =
    * v), one row per (media, frame). A pass proves the JDK's GIF
    * sequence writer+reader roundtripped every planted frame. */
  def sqlVideoFramesReal: String =
    s"""WITH vid AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 2),
       |fr AS (
       |  SELECT media_id, text, UNNEST(range(0, (length(text) % 3) + 2)) AS f
       |  FROM vid),
       |px AS (
       |  SELECT media_id, f, pp.i AS i,
       |    CAST(('0x' || substring(md5(text || ':f' || f || ':p' || pp.i), 1, 2))::UBIGINT
       |      AS BIGINT) AS gray
       |  FROM fr CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i) pp)
       |SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(SUM(gray) // 64 AS BIGINT) AS mean_gray
       |FROM px GROUP BY media_id, f
       |ORDER BY media_id, frame_idx""".stripMargin

  /** `video_frames_composited` query (r15): the PARTIAL-UPDATE planted
    * fixture ([[gifPartialMediaFromAnchors]]) demuxed through the real
    * composited arm — per-frame canvas luma means after applying
    * placement offsets and accumulate disposal. Same output shape as
    * [[videoFramesReal]]; a pass proves the decoder composites exactly
    * (offsets honored, earlier canvas preserved outside each delta
    * rect, later deltas overwriting earlier ones where they overlap). */
  def videoFramesComposited(anchored: DataFrame): DataFrame =
    sampleFramesDecoded(gifPartialMediaFromAnchors(anchored))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("mean_gray"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** DuckDB mirror of [[videoFramesComposited]]: the canvas state is
    * replayed NUMERICALLY — pixel (x, y) at frame f holds the planted
    * gray of the LATEST delta g ∈ [1, f] whose 4×4 rect at
    * `((2g) mod 5, (3g) mod 5)` covers it, else the frame-0 base gray;
    * the mean is the exact integer sum over the 8×8 canvas div 64. A
    * pass proves the JDK demux + canvas compositing reproduced every
    * placed delta bit-for-bit. */
  def sqlVideoFramesComposited: String =
    s"""WITH vid AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 2),
       |fr AS (
       |  SELECT media_id, text, UNNEST(range(0, (length(text) % 3) + 2)) AS f
       |  FROM vid),
       |px AS (
       |  SELECT media_id, text, f, pp.p AS p, pp.p % 8 AS x, pp.p // 8 AS y
       |  FROM fr CROSS JOIN (SELECT UNNEST(range(0, 64)) AS p) pp),
       |cov AS (
       |  SELECT media_id, text, f, p, x, y, max(gg.g) AS g
       |  FROM px LEFT JOIN (SELECT UNNEST(range(1, 4)) AS g) gg
       |    ON gg.g <= px.f
       |    AND px.x >= (gg.g * 2) % 5 AND px.x < (gg.g * 2) % 5 + 4
       |    AND px.y >= (gg.g * 3) % 5 AND px.y < (gg.g * 3) % 5 + 4
       |  GROUP BY media_id, text, f, p, x, y),
       |val AS (
       |  SELECT media_id, f, p,
       |    CASE WHEN g IS NULL THEN
       |      ('0x' || substring(md5(text || ':f0:p' || p), 1, 2))::UBIGINT
       |    ELSE
       |      ('0x' || substring(md5(text || ':f' || g || ':p' ||
       |         ((y - (g * 3) % 5) * 4 + (x - (g * 2) % 5))), 1, 2))::UBIGINT
       |    END AS gray
       |  FROM cov)
       |SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(SUM(gray) // 64 AS BIGINT) AS mean_gray
       |FROM val GROUP BY media_id, f
       |ORDER BY media_id, frame_idx""".stripMargin

  // ------------------------------------------------ real audio path (r13)

  /** Sample count of the planted WAV fixture — 64 blocks of 4. */
  private val WavSamples = 256

  /** Decode `data` with the JDK's OWN audio registry
    * (`javax.sound.sampled` — WAV/AIFF/AU PCM readers ship in every
    * JRE; zero new dependencies, the F124 move repeated for audio) and
    * reduce the signed 16-bit mono PCM stream to a 64-block unsigned
    * amplitude grid: u_i = sample_i + 32768 ∈ [0, 65535], block value =
    * block-sum / block-frame-count (integer area average over exact
    * `⌊k·n∕64⌋` boundaries — the [[decodeGray8]] discipline on a 1-D
    * signal). `None` when no registered reader accepts the bytes, the
    * decoded format is not 16-bit signed mono PCM, or fewer than 64
    * frames decode — the caller falls back to the deterministic stub,
    * keeping the operator TOTAL on formats the JDK can't read
    * (compressed codecs stay env-blocked and loudly documented). */
  private[multimodal] def decodeAudio64(data: Array[Byte]): Option[Array[Long]] = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) None
    else {
      val fmt = ais.getFormat
      if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) {
        ais.close(); None
      } else {
        val bytes = ais.readAllBytes()
        ais.close()
        val n = bytes.length / 2
        if (n < 64) None
        else {
          val big = fmt.isBigEndian
          val u = new Array[Long](n)
          var i = 0
          while (i < n) {
            val b0 = bytes(2 * i) & 0xff
            val b1 = bytes(2 * i + 1) & 0xff
            val s = (if (big) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
            u(i) = s.toLong + 32768L
            i += 1
          }
          val out = new Array[Long](64)
          var b = 0
          while (b < 64) {
            val i0 = b * n / 64
            val i1 = (b + 1) * n / 64
            var sum = 0L
            var c = 0L
            var j = i0
            while (j < i1) { sum += u(j); c += 1; j += 1 }
            out(b) = sum / c
            b += 1
          }
          Some(out)
        }
      }
    }
  }

  /** aHash-style audio fingerprint over REAL decoded samples where the
    * JDK can decode the payload, the deterministic stub elsewhere — the
    * [[imageAhashDecoded]] contract for the audio column: block
    * amplitudes thresholded at their mean, MSB-first 64-bit pack, so
    * re-containered copies of a clip land at Hamming 0 and the banded
    * Hamming join dedups audio exactly like images and text. Payloads
    * never shuffle; only (id, 8-byte hash) rows leave the scan. */
  def audioAhashDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("media_id", "kind", "data").as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { m =>
          val g = decodeAudio64(m.data).getOrElse(stubGray64(md, m.data))
          (m.media_id, packAhash(g))
        }
      }
      .toDF("media_id", "sh")
  }

  /** Near-dup audio pairs over [[audioAhashDecoded]] —
    * `audio_ahash_real_pairs` query (real-codec arm on its WAV
    * fixture). */
  def audioAhashPairsDecoded(media: DataFrame, maxDist: Int = 3): DataFrame =
    graft.dedup.Dedup.hammingPairs(
      audioAhashDecoded(media).select(col("media_id").as("id"), col("sh")),
      maxDist)

  /** Deterministic 256-sample WAV per row of `anchored(media_id, text)`
    * — the ENCODE half of the audio roundtrip ([[pngMediaFromAnchors]]
    * for sound): sample i carries the unsigned 16-bit value
    * u16(md5(text ∥ ":s" ∥ i)[0..1]) stored signed as u − 32768 in
    * 16-bit little-endian mono PCM at 8 kHz, written through
    * `AudioSystem.write` into real WAVE container bytes. DuckDB replays
    * the planted u16s numerically, so the oracle checks the REAL
    * `javax.sound.sampled` decode end-to-end (encode → WAV bytes →
    * decode → block average → hash) without ever decoding in SQL. */
  def wavMediaFromAnchors(anchored: DataFrame): DataFrame = {
    val spark = anchored.sparkSession
    import spark.implicits._
    anchored.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val pcm = new Array[Byte](WavSamples * 2)
          var i = 0
          while (i < WavSamples) {
            md.reset()
            md.update((text + ":s" + i)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val h = md.digest()
            val u = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
            val s = u - 32768
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, "audio", bos.toByteArray)
        }
      }
      .toDF("media_id", "kind", "data")
  }

  /** DuckDB mirror of the real-audio pipeline over the WAV fixture:
    * the 256 planted u16 samples replay from the md5 prefix, the
    * 4-sample block average is exact integer arithmetic, then the
    * shared mean/pack/Hamming tail. A pass proves the JDK's WAV decode
    * returned EXACTLY the planted PCM frames — any header
    * misalignment, endianness slip, or sample-width coercion would
    * flip hash bits and fail the gate. Audio ids are the
    * `doc_id ≡ 1 (mod 3)` rows of the standing media fixture, carrying
    * their 15-id block anchor's clip (the re-containered-copy case). */
  def sqlAudioAhashRealPairs(maxDist: Int): String =
    s"""WITH aud AS (
       |  SELECT d.doc_id AS media_id, a.text AS text
       |  FROM documents d
       |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 15)
       |  WHERE d.doc_id % 3 = 1),
       |px AS (
       |  SELECT media_id, pp.i AS i,
       |    CAST(('0x' || substring(md5(text || ':s' || pp.i), 1, 4))::UBIGINT
       |      AS BIGINT) AS u
       |  FROM aud CROSS JOIN (SELECT UNNEST(range(0, $WavSamples)) AS i) pp),
       |g AS (
       |  SELECT media_id, i // 4 AS bi, SUM(u) // 4 AS gray
       |  FROM px GROUP BY media_id, i // 4),
       |m AS (SELECT media_id, SUM(gray) // 64 AS mean FROM g GROUP BY 1),
       |sig AS (
       |  SELECT g.media_id,
       |    CAST(SUM(CASE WHEN g.gray > m.mean THEN
       |      CASE WHEN g.bi = 0 THEN -9223372036854775807 - 1
       |           ELSE CAST(1 AS BIGINT) << CAST(63 - g.bi AS INTEGER) END
       |      ELSE 0 END) AS BIGINT) AS sh
       |  FROM g JOIN m USING (media_id) GROUP BY 1),
       |p AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |  FROM sig a JOIN sig b ON a.media_id < b.media_id)
       |SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle-checkable metadata projection of the decode output. */
  def featureSummary(media: DataFrame): DataFrame =
    decodeFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"), col("feat_dim"))
      .orderBy(col("media_id"))

  /** Oracle-checkable frame index table (frame payloads stay engine-side). */
  def frameIndex(media: DataFrame): DataFrame =
    sampleFrames(media)
      .select(col("media_id"), col("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** DuckDB mirror of the `media_embedding_knn` query (FULL oracle since
    * r9): the md5-prefix stub features replay as
    * `md5(text || ':' || j)` → u32 prefix / 2³² → FLOAT (DuckDB's
    * double→float32 cast rounds to nearest-even exactly like Scala's
    * `.toFloat`), then the `knn_bruteforce` oracle tail — float→double
    * cast before arithmetic, left-assoc dot/norm folds, the
    * (cosine desc, cand asc) window — over the probe convention
    * `media_id % 100 == 0`. */
  def sqlMediaEmbeddingKnn(k: Int): String =
    s"""WITH f AS (
       |  SELECT doc_id AS vec_id,
       |    list_transform(range(0, $FeatureDim), jj ->
       |      CAST(CAST(CAST(('0x' || substring(md5(text || ':' || CAST(jj AS VARCHAR)), 1, 8))::UBIGINT
       |        AS DOUBLE) / 4294967296.0 AS FLOAT) AS DOUBLE)) AS v
       |  FROM documents),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) AS nv
       |  FROM f),
       |s AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |    round(list_reduce(list_transform(range(1, len(p.v)+1), i -> p.v[i]*c.v[i]),
       |                      (a,b) -> a+b) / (p.nv * c.nv), 6) AS cosine
       |  FROM n p CROSS JOIN n c
       |  WHERE p.vec_id % 100 = 0 AND c.vec_id <> p.vec_id),
       |r AS (SELECT probe_id, cand_id, cosine,
       |        row_number() OVER (PARTITION BY probe_id
       |                           ORDER BY cosine DESC, cand_id ASC) AS rk
       |      FROM s)
       |SELECT probe_id, rk, cand_id, cosine FROM r WHERE rk <= $k
       |ORDER BY probe_id, rk""".stripMargin
}
