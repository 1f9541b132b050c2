package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the multimodal plumbing: schema, determinism, 1→N frame shape,
  * and partition-local execution (payloads never shuffle). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text"))

  test("media table: kind cycles, payload is utf-8 bytes") {
    val rows = media.orderBy("media_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("audio", "video", "image"))
    assert(new String(rows(0).getAs[Array[Byte]]("data"), "UTF-8") == "alpha beta")
  }

  test("decodeFeatures: fixed dim, correct byte counts, deterministic") {
    val f1 = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(f1.map(_.getLong(2)).toSeq == Seq(10L, 5L, 18L))
    assert(f1.forall(_.getInt(3) == Multimodal.FeatureDim))
    assert(f1.forall(_.getSeq[Float](4).length == Multimodal.FeatureDim))
    assert(f1.map(_.getSeq[Float](4)).toSeq == f2.map(_.getSeq[Float](4)).toSeq)
  }

  test("sampleFrames: only videos, n_frames = len%7+1, frames tile the payload") {
    val frames = Multimodal.sampleFrames(media).orderBy("media_id", "frame_idx").collect()
    assert(frames.forall(_.getLong(0) == 2L)) // only doc 2 is video
    assert(frames.length == ("gamma".length % 7) + 1) // 5%7+1 = 6
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame")).toSeq
    assert(new String(joined.toArray, "UTF-8") == "gamma")
  }

  test("resize: images only, bounded size, deterministic, small stays intact") {
    val out = Multimodal.resize(media, targetBytes = 8).orderBy("media_id").collect()
    assert(out.forall(_.getString(1) == "image")) // only doc 3 is image
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 18L)                   // "delta epsilon zeta"
    assert(r.getLong(3) <= 8L)
    assert(r.getAs[Array[Byte]]("data").length == r.getLong(3))
    val again = Multimodal.resize(media, 8).orderBy("media_id").collect()
    assert(again.head.getAs[Array[Byte]]("data").toSeq == r.getAs[Array[Byte]]("data").toSeq)
    // payload already under target passes through untouched
    val big = Multimodal.resize(media, 1000).collect()
    assert(big.head.getLong(2) == big.head.getLong(3))
  }

  test("decode plan is a narrow map — no exchange above the scan") {
    val plan = Multimodal.decodeFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("media -> features -> kNN composition is deterministic across runs") {
    def run() = graft.SparkEntry.queries("media_embedding_knn")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    val a = run()
    val b = run()
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("imageAhash: bit pack matches a JVM reference; exact copies pair at 0 (r10)") {
    // doc_id 3 and 6 are both images (id % 3 == 0) with IDENTICAL
    // payloads; 9 is an image with different bytes.
    val m = Multimodal.mediaFromDocuments(
      Seq((3L, "same bytes"), (6L, "same bytes"), (9L, "other"),
        (1L, "same bytes") /* audio — must not pair */)
        .toDF("doc_id", "text"))
    val sig = Multimodal.imageAhash(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.keySet == Set(3L, 6L, 9L))
    // JVM reference: same md5-prefix grays, integer mean, MSB-first pack
    def ref(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val grays = (0 until 64).map { i =>
        val h = md.digest((text + s":px$i").getBytes("UTF-8"))
        ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      }
      val mean = grays.sum / 64
      grays.zipWithIndex.foldLeft(0L) { case (acc, (g, i)) =>
        if (g > mean) acc + (1L << (63 - i)) else acc
      }
    }
    assert(sig(3L) == ref("same bytes"))
    assert(sig(9L) == ref("other"))
    val pairs = Multimodal.imageAhashPairs(m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((3L, 6L, 0L))) // the exact copy, hamming 0
    // the shared banded machinery finds planted near-dups at hamming <= 3
    val sigs = Seq((1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdecL),
      (3L, -1L)).toDF("id", "sh")
    val nd = graft.dedup.Dedup.hammingPairs(sigs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(nd.toSeq == Seq((1L, 2L, 2L))) // ...ef vs ...ec differ in 2 bits
  }

  test("decodeGray8: PNG and BMP roundtrip the planted pixels exactly (r12)") {
    // 16x16 image, pixel (x,y) gray = (x * 16 + y) mod 256 — every 2x2
    // block average is hand-computable
    def plant(): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = (x * 16 + y) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def expected: Array[Long] = {
      val g = Array.tabulate(16, 16)((y, x) => ((x * 16 + y) % 256).toLong)
      Array.tabulate(64) { bi =>
        val by = bi / 8; val bx = bi % 8
        (g(2 * by)(2 * bx) + g(2 * by)(2 * bx + 1) +
          g(2 * by + 1)(2 * bx) + g(2 * by + 1)(2 * bx + 1)) / 4
      }
    }
    for (fmt <- Seq("png", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(plant(), fmt, bos), s"no $fmt writer")
      val got = Multimodal.decodeGray8(bos.toByteArray)
      assert(got.isDefined, s"$fmt must decode")
      assert(got.get.toSeq == expected.toSeq, s"$fmt pixel roundtrip")
    }
    // undecodable bytes and sub-grid images fall back (None)
    assert(Multimodal.decodeGray8("not an image".getBytes("UTF-8")).isEmpty)
    val tiny = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    assert(Multimodal.decodeGray8(bos.toByteArray).isEmpty,
      "sub-8x8 images are out of the grid's contract")
  }

  test("imageAhashDecoded: stub fallback equals the column path; real copies pair (r12)") {
    // text payloads are undecodable -> the decoded operator must fall
    // back to EXACTLY the stub column path's signatures
    val m = Multimodal.mediaFromDocuments(
      Seq((3L, "same bytes"), (6L, "same bytes"), (9L, "other"))
        .toDF("doc_id", "text"))
    val stub = Multimodal.imageAhash(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dec = Multimodal.imageAhashDecoded(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dec == stub, "fallback arm must be bit-identical to the stub path")
    // real PNGs from anchors: same text -> identical pixels -> hamming 0
    val png = Multimodal.pngMediaFromAnchors(
      Seq((3L, "block anchor text"), (6L, "block anchor text"),
        (9L, "a different article")).toDF("media_id", "text"))
    val rows = png.collect()
    assert(rows.forall(r => {
      val b = r.getAs[Array[Byte]]("data")
      // PNG magic: the payloads really are encoded images
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    }))
    val pairs = Multimodal.imageAhashPairsDecoded(png).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((3L, 6L, 0L)), s"planted copy must pair: ${pairs.toSeq}")
  }

  test("resizeRgb: exact per-channel area averages; fallback arm equals the stub (F140)") {
    // 16x16 with distinct per-channel gradients — every 2x2 block mean
    // is hand-computable per channel
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | ((x + y) * 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeRgb(bos.toByteArray, 8, 8)
    assert(out.isDefined)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.get))
    assert(back.getWidth == 8 && back.getHeight == 8)
    for (oy <- 0 until 8; ox <- 0 until 8) {
      val rgb = back.getRGB(ox, oy)
      def mean(f: (Int, Int) => Int) =
        (f(2 * ox, 2 * oy) + f(2 * ox + 1, 2 * oy) +
          f(2 * ox, 2 * oy + 1) + f(2 * ox + 1, 2 * oy + 1)) / 4
      assert(((rgb >> 16) & 0xff) == mean((x, _) => x * 16), s"r at $ox,$oy")
      assert(((rgb >> 8) & 0xff) == mean((_, y) => y * 16), s"g at $ox,$oy")
      assert((rgb & 0xff) == mean((x, y) => (x + y) * 8), s"b at $ox,$oy")
    }
    // undecodable and sub-grid payloads refuse (stub arm takes over)
    assert(Multimodal.resizeRgb("not an image".getBytes("UTF-8"), 8, 8).isEmpty)
    // the operator's fallback arm must equal the stub operator's
    // byte-decimation on the same undecodable payloads
    val m = Multimodal.mediaFromDocuments(
      Seq((3L, "some text payload standing in for bytes"), (6L, "tiny"))
        .toDF("doc_id", "text"))
    val stub = Multimodal.resize(m, 64).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("data").toSeq).toMap
    val dec = Multimodal.resizeImagesDecoded(m, 8, 8, 64).collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getAs[Array[Byte]]("data").toSeq))
    assert(dec.forall(_._2 == 0), "text payloads must take the stub arm")
    assert(dec.map(t => t._1 -> t._3).toMap == stub,
      "fallback arm must be bit-identical to the stub operator")
    // imageResizeReal stays TOTAL on stub-arm rows (r13 review): an
    // undecodable payload must still emit its 64 deterministic pixel
    // rows rather than silently vanishing from the output
    val rr = Multimodal.imageResizeReal(
      Seq((3L, "block anchor text")).toDF("media_id", "text"))
    assert(rr.count() == 64, "decodable row emits its 64 pixel rows")
    // ...and ACTUALLY drive the decoded==0 branch (r13 ADVICE): the
    // anchored face always feeds its own PNGs, so sabotage goes through
    // the media-level seam with TEXT bytes where a PNG is expected —
    // the stand-in rows must be the spec'd md5(resized-bytes ∥ ":rp"+i)
    // first-byte grays, all 64 of them
    val sab = Multimodal.imageResizeRealFromMedia(m.filter($"media_id" === 3L))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sab.length == 64, "stub-arm row must still emit 64 pixel rows")
    val stubBytes = stub(3L).toArray
    val mdig = java.security.MessageDigest.getInstance("MD5")
    sab.foreach { case (i, gray) =>
      mdig.reset()
      mdig.update(stubBytes)
      mdig.update((":rp" + i).getBytes("UTF-8"))
      assert(gray == (mdig.digest()(0) & 0xffL), s"stand-in gray at $i")
    }
  }

  test("decodeFrameMeans: placed (delta) GIF frames COMPOSITE onto the " +
      "canvas (r15 — supersedes the r13 reject-to-stub rule)") {
    // a frame stored as a sub-canvas delta (nonzero image-descriptor
    // offset) must be drawn at its offset over the living canvas; the
    // frame feature is the mean of the WHOLE canvas, viewer semantics
    def gif(offsetSecond: Boolean): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until 2) {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (i <- 0 until 64)
          img.setRGB(i % 8, i / 8, 0x404040 + f * 0x080808)
        val meta =
          if (offsetSecond && f == 1) {
            val m = writer.getDefaultImageMetadata(
              javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
              null)
            val fmt = "javax_imageio_gif_image_1.0"
            val root = m.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
            val desc = root.getElementsByTagName("ImageDescriptor").item(0)
              .asInstanceOf[org.w3c.dom.Element]
            desc.setAttribute("imageLeftPosition", "8")
            m.setFromTree(fmt, root)
            m
          } else null
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    // control: the same 2-frame GIF with all frames at (0,0) decodes to
    // the two solid-frame means (read them back rather than assuming
    // the planted values — TYPE_BYTE_GRAY/palette quantization may
    // shift the absolute grays, but solid frames stay solid)
    val control = Multimodal.decodeFrameMeans(gif(offsetSecond = false))
    assert(control.exists(_.length == 2))
    val v0 = control.get(0)
    val v1 = control.get(1)
    // placing frame 2 at left=8 extends the canvas to 16x8: frame 1
    // covers the left half (right half never drawn -> black), frame 2
    // adds the right half — whole-canvas means, exact integer division
    val placed = Multimodal.decodeFrameMeans(gif(offsetSecond = true))
    assert(placed.exists(_.length == 2),
      "a placed frame must now decode through the composited real arm")
    assert(placed.get(0) == 64L * v0 / 128L, s"got ${placed.get.toSeq}")
    assert(placed.get(1) == (64L * v0 + 64L * v1) / 128L,
      s"got ${placed.get.toSeq}")
  }

  test("decodeFrameMeans: disposal rules composite like a viewer (r15)") {
    // frames planted in the exact 256-gray indexed palette so the
    // decoded grays equal the planted ones bit-for-bit
    val g = Array.tabulate(256)(_.toByte)
    val pal = new java.awt.image.IndexColorModel(8, 256, g, g, g)
    def frame(side: Int, gray: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, pal)
      for (i <- 0 until side * side)
        img.setRGB(i % side, i / side, (gray << 16) | (gray << 8) | gray)
      img
    }
    def gif(frames: Seq[(Int, Int, Int, Int, String)]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (side, left, top, gray, disposal) =>
        val img = frame(side, gray)
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
        val desc = root.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        // default metadata says interlaceFlag=TRUE and the JDK pair
        // mis-roundtrips interlaced sub-8-row rasters — write progressive
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
        gce.setAttribute("disposalMethod", disposal)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    // accumulate (doNotDispose): the 4x4 delta at (2,2) overwrites only
    // its rect; the rest of the canvas keeps frame 0's gray
    val acc = Multimodal.decodeFrameMeans(gif(Seq(
      (8, 0, 0, 100, "doNotDispose"), (4, 2, 2, 200, "doNotDispose"))))
    assert(acc.exists(_.toSeq == Seq(100L, (48L * 100 + 16L * 200) / 64L)),
      s"accumulate: ${acc.map(_.toSeq)}")
    // restoreToBackgroundColor: frame 0's rect clears to black after
    // sampling, so frame 1's canvas is its own 16 pixels over black
    val bg = Multimodal.decodeFrameMeans(gif(Seq(
      (8, 0, 0, 100, "restoreToBackgroundColor"),
      (4, 0, 0, 200, "doNotDispose"))))
    assert(bg.exists(_.toSeq == Seq(100L, 16L * 200 / 64L)),
      s"restoreToBackgroundColor: ${bg.map(_.toSeq)}")
    // restoreToPrevious: frame 1's delta is sampled, then the canvas
    // reverts, so frame 2 composites over frame 0's canvas, not frame 1's
    val prev = Multimodal.decodeFrameMeans(gif(Seq(
      (8, 0, 0, 100, "doNotDispose"),
      (4, 2, 2, 200, "restoreToPrevious"),
      (4, 0, 0, 50, "doNotDispose"))))
    assert(prev.exists(_.toSeq == Seq(100L,
      (48L * 100 + 16L * 200) / 64L, (48L * 100 + 16L * 50) / 64L)),
      s"restoreToPrevious: ${prev.map(_.toSeq)}")
    // the pre-r15 full-frame fixture path is bit-identical through the
    // composited arm: full-canvas opaque frames leave nothing uncovered
    val full = Multimodal.decodeFrameMeans(gif(Seq(
      (8, 0, 0, 100, "doNotDispose"), (8, 0, 0, 200, "doNotDispose"))))
    assert(full.exists(_.toSeq == Seq(100L, 200L)), s"full frames: ${full.map(_.toSeq)}")
    // canvas bomb: the logical-screen descriptor is attacker-controlled
    // header bytes — patch a valid GIF to declare 40000x40000 (~6.4 GB
    // INT_RGB) and the decoder must REFUSE to the stub arm before
    // allocating, never OOM the task (r15 review)
    val bomb = gif(Seq((8, 0, 0, 100, "doNotDispose"))).clone()
    bomb(6) = 0x40.toByte; bomb(7) = 0x9c.toByte // width 40000 (u16 LE)
    bomb(8) = 0x40.toByte; bomb(9) = 0x9c.toByte // height 40000
    assert(Multimodal.decodeFrameMeans(bomb).isEmpty,
      "oversized declared canvas must take the stub arm")
  }

  test("decodeFrameMeans: corrupt GIF body refuses instead of throwing (r13)") {
    // valid magic, garbage body — the JDK reader throws unchecked on
    // such payloads; the operator's totality contract turns that into
    // the stub arm, never a task failure
    val corrupt = "GIF89a".getBytes("ISO-8859-1") ++
      Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(Multimodal.decodeFrameMeans(corrupt).isEmpty)
    val m = Multimodal.mediaFromDocuments(
      Seq((2L, "payload")).toDF("doc_id", "text"))
      .withColumn("data", lit(corrupt))
    val dec = Multimodal.sampleFramesDecoded(m).collect()
    assert(dec.nonEmpty && dec.forall(_.getInt(3) == 0),
      "corrupt container must take the stub arm")
  }

  test("decodeAudio64: WAV roundtrips the planted samples exactly (F139)") {
    // 256 samples, sample i carries u16 = (i * 181) mod 65536 — every
    // 4-sample block average is hand-computable
    def wav(big: Boolean): Array[Byte] = {
      val pcm = new Array[Byte](512)
      for (i <- 0 until 256) {
        val s = ((i * 181) % 65536) - 32768
        if (big) {
          pcm(2 * i) = ((s >> 8) & 0xff).toByte
          pcm(2 * i + 1) = (s & 0xff).toByte
        } else {
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, big)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 256L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val expected = Array.tabulate(64) { b =>
      (0 until 4).map(j => ((4 * b + j) * 181L) % 65536L).sum / 4
    }
    // WAVE is little-endian on disk; both source endiannesses must
    // decode to the same planted samples
    for (big <- Seq(false, true)) {
      val got = Multimodal.decodeAudio64(wav(big))
      assert(got.isDefined, s"wav(big=$big) must decode")
      assert(got.get.toSeq == expected.toSeq, s"sample roundtrip big=$big")
    }
    // undecodable bytes and sub-64-frame clips fall back (None)
    assert(Multimodal.decodeAudio64("not audio".getBytes("UTF-8")).isEmpty)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val shortAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](40)), fmt, 20L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(shortAis,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudio64(bos.toByteArray).isEmpty,
      "sub-64-frame clips are out of the grid's contract")
  }

  test("audioAhashDecoded: stub fallback equals the stub arithmetic; real copies pair (F139)") {
    // text payloads are undecodable -> the decoded audio operator must
    // fall back to EXACTLY the signatures the stub column path computes
    // (relabel the same payloads as images to read the stub's answer)
    val m = Multimodal.mediaFromDocuments(
      Seq((1L, "same clip"), (4L, "same clip"), (7L, "other clip"))
        .toDF("doc_id", "text"))
    val stub = Multimodal.imageAhash(m.withColumn("kind", lit("image")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dec = Multimodal.audioAhashDecoded(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dec == stub, "fallback arm must be bit-identical to the stub arithmetic")
    // real WAVs from anchors: same text -> identical samples -> hamming 0
    val wavs = Multimodal.wavMediaFromAnchors(
      Seq((1L, "block anchor text"), (4L, "block anchor text"),
        (7L, "a different clip")).toDF("media_id", "text"))
    val rows = wavs.collect()
    assert(rows.forall(r => {
      val b = r.getAs[Array[Byte]]("data")
      // RIFF....WAVE magic: the payloads really are WAV containers
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    }))
    val pairs = Multimodal.audioAhashPairsDecoded(wavs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 4L, 0L)), s"planted copy must pair: ${pairs.toSeq}")
  }

  test("decodeFrameMeans: GIF sequence roundtrips planted frames exactly (F141)") {
    // the encode half on a known text, decoded back by hand-replayed
    // expectation: frame f mean = sum of 64 planted md5 bytes // 64
    val gifs = Multimodal.gifMediaFromAnchors(
      Seq((1L, "anchor text one"), (2L, "anchor text one"),
        (3L, "a different clip text")).toDF("media_id", "text"))
    val rows = gifs.collect()
    assert(rows.forall(r => {
      val b = r.getAs[Array[Byte]]("data")
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' // GIF87a/89a magic
    }))
    val md = java.security.MessageDigest.getInstance("MD5")
    def expected(text: String): Seq[Long] = {
      val nFrames = (text.length % 3) + 2
      (0 until nFrames).map { f =>
        (0 until 64).map { p =>
          md.reset()
          md.update((text + ":f" + f + ":p" + p).getBytes("UTF-8"))
          (md.digest()(0) & 0xff).toLong
        }.sum / 64
      }
    }
    rows.foreach { r =>
      val got = Multimodal.decodeFrameMeans(r.getAs[Array[Byte]]("data"))
      assert(got.isDefined, "planted GIF must demux")
      val text = if (r.getLong(0) == 3L) "a different clip text"
                 else "anchor text one"
      assert(got.get.toSeq == expected(text),
        s"frame means for media ${r.getLong(0)}")
    }
    // undecodable bytes refuse — stub arm takes over with the slice
    // generator's count and the documented md5-byte stub mean
    assert(Multimodal.decodeFrameMeans("not a video".getBytes("UTF-8")).isEmpty)
    val m = Multimodal.mediaFromDocuments(
      Seq((2L, "plain text payload here")).toDF("doc_id", "text"))
    val dec = Multimodal.sampleFramesDecoded(m).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
    val payload = "plain text payload here".getBytes("UTF-8")
    assert(dec.length == (payload.length % 7) + 1, "stub frame count")
    assert(dec.forall(_._3 == 0), "undecodable payloads take the stub arm")
  }

  test("hammingPairs banding is LOSSLESS at maxDist <= 3: random sigs == brute force (r10)") {
    // The pigeonhole claim both modalities lean on: 4 chunks, <= 3
    // differing bits => some 16-bit chunk is untouched, so the banded
    // join can never miss a qualifying pair. Randomized: signatures
    // seeded near-collided (flip 0-4 bits of shared bases) so pairs at
    // every hamming distance 0..4 actually occur.
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(30)(rnd.nextLong())
    val sigRows = (0 until 120).map { i =>
      val b = bases(i % 30)
      val flips = i / 30 // 0..3 bit flips within a shared-base family
      var s = b
      (0 until flips).foreach { k => s = s ^ (1L << ((i * 7 + k * 13) % 64)) }
      (i.toLong, s)
    } ++ (0 until 5).map(i => ((200 + i).toLong, bases(i))) // exact dups
    val sigs = sigRows.toDF("id", "sh")
    for (maxDist <- Seq(0, 1, 2, 3)) {
      val banded = graft.dedup.Dedup.hammingPairs(sigs, maxDist).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ia, sa) <- sigRows; (ib, sb) <- sigRows
        if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxDist
      } yield (ia, ib, h.toLong)).toSet
      assert(banded == brute,
        s"maxDist=$maxDist: banded ${banded.size} != brute ${brute.size}")
      assert(brute.nonEmpty, s"fixture must produce pairs at $maxDist")
    }
  }
}
