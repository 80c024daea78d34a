package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {

  test("aHash of a half-bright image sets exactly the bright half's bits") {
    import spark.implicits._
    // 16x8: left half black (gray 0), right half white (gray 255).
    // Blocks bx<4 avg 0, bx>=4 avg 255 → bits set iff bx>=4.
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val Array(h) = Multimodal.imageAHash(media).collect()
    // aHash bits: bright half (bx >= 4); dHash chain bits: avg rises
    // only at the dark→bright step inside each row, i % 8 == 3
    val expected = (0 until 32).filter(i => i % 8 >= 4)
      .map(1L << _).sum +
      Seq(3, 11, 19, 27).map(i => 1L << (32 + i)).sum
    assert(h.width === 16 && h.height === 8 && h.phash === expected)
  }

  test("JPEG re-encode stays within the near-dup Hamming bound of " +
    "the source PNG hash") {
    import spark.implicits._
    // The mm13 story: the SAME pixels through the lossless and lossy
    // codecs must land close enough that banded Hamming NN still pairs
    // them — otherwise "JPEG support" is a decode that breaks the
    // near-dup contract. Re-encode each smooth fixture image as PNG
    // (exact pixels) and compare hashes against the JPEG round trip.
    val rows = Seq(6L, 12L, 30L, 48L, 90L).map { id =>
      val w = (id % 24 + 8).toInt
      val h = (id % 16 + 6).toInt
      val jpegBytes = Multimodal.syntheticJpeg(id, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegBytes))
      // decode the JPEG, then write those EXACT pixels as PNG: the two
      // payloads differ only by one JPEG quantization pass
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, jpegBytes, bos.toByteArray)
    }
    val jpegH = Multimodal.imageAHash(
      rows.map(r => (r._1, r._2)).toDF("doc_id", "payload")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    // a SECOND lossy pass (decode → re-encode JPEG) — the actual
    // near-dup scenario: same content, independently re-compressed
    val jpeg2 = rows.map { case (id, jpegBytes, _) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegBytes))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      (id, bos.toByteArray)
    }
    val jpeg2H = Multimodal.imageAHash(jpeg2.toDF("doc_id", "payload"))
      .collect().map(h => h.doc_id -> h.phash).toMap
    val pngH = Multimodal.imageAHash(
      rows.map(r => (r._1, r._3)).toDF("doc_id", "payload")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    rows.foreach { case (id, _, _) =>
      val dPng = java.lang.Long.bitCount(jpegH(id) ^ pngH(id))
      val dRe = java.lang.Long.bitCount(jpegH(id) ^ jpeg2H(id))
      // PNG of the same decoded pixels: identical hash by construction
      assert(dPng === 0, s"doc $id: JPEG vs exact-pixel PNG hamming $dPng")
      // independent re-compression: within the near-dup band (the
      // smooth fixture keeps block means stable under quantization).
      // Measured max on this fixture set is 9/63 (doc 30, 14x12 — the
      // smallest blocks, so means move most); 12 leaves headroom for
      // JDK JPEG-encoder quantization-table drift without weakening
      // the claim that most bits survive an independent lossy pass.
      assert(dRe <= 12, s"doc $id: JPEG re-encode hamming $dRe > 12")
    }
    // the verdict's literal variant: JPEG re-encodes of the NOISY PNG
    // fixtures (worst case for a DCT codec — per-pixel error is large,
    // but block MEANS average it out, which is the aHash design bet)
    val noisy = Seq(6L, 12L, 30L).map { id =>
      val w = (id % 24 + 8).toInt
      val h = (id % 16 + 6).toInt
      val png = Multimodal.syntheticPng(id, w, h)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      (id, png, bos.toByteArray)
    }
    val nPng = Multimodal.imageAHash(
      noisy.map(r => (r._1, r._2)).toDF("doc_id", "payload")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    val nJpg = Multimodal.imageAHash(
      noisy.map(r => (r._1, r._3)).toDF("doc_id", "payload")).collect()
      .map(h => h.doc_id -> h.phash).toMap
    noisy.foreach { case (id, _, _) =>
      val d = java.lang.Long.bitCount(nPng(id) ^ nJpg(id))
      assert(d <= 16, s"noisy doc $id: PNG vs JPEG hamming $d > 16")
    }
  }

  test("audioAHash sets exactly the loud half's window bits") {
    import spark.implicits._
    // 64 samples: first half silent (0), second half amplitude 1000 →
    // windows 0..15 mean 0, 16..31 mean 1000; bits set iff w >= 16
    val n = 64
    val data = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      data(2 * i) = (1000 & 0xFF).toByte
      data(2 * i + 1) = ((1000 >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq((7L, bos.toByteArray)).toDF("doc_id", "payload")
    val Array(h) = Multimodal.audioAHash(media).collect()
    // aHash: loud windows 16..31; dHash: energy rises only at the
    // silent→loud step, window 15 → 16
    val expected = (16 until 32).map(1L << _).sum + (1L << (32 + 15))
    assert(h.n_samples === n && h.phash === expected)
  }

  test("videoAHash: strict per-bit majority across frames") {
    import spark.implicits._
    // 3 frames, 8x8: two frames bright on the right half, one bright on
    // the left -> majority picks the right-half bits only.
    // GIF gray palette encode via the same writer the corpus uses.
    def frame(brightLeft: Boolean): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 8) {
        val bright = if (brightLeft) x < 4 else x >= 4
        val v = if (bright) 200 else 10
        img.getRaster.setSample(x, y, 0, v)
      }
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(false, true, false).foreach { left =>
      writer.writeToSequence(
        new javax.imageio.IIOImage(frame(left), null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val media = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    val Array(h) = Multimodal.videoAHash(media).collect()
    // cells: idx = row*4 + colcell; right half = colcell 2,3 (avg 200
    // vs 10). Two right-bright frames carry the majority on every bit,
    // so expected = the right-bright frame's 63-bit layout:
    //  0..15 aHash: bright cells (i % 4 >= 2)
    // 16..30 row chain: dark→bright step at i % 4 == 1
    // 31..45 col chain: one rise at col-major position 7→8 (bit 38)
    // 46..59 second-order: idx+2 jumps dark→bright for i % 4 <= 1
    // 60..62 quadrants: (40, 800, 40, 800) → only q1 > q2 (bit 61)
    val expected = (0 until 16).filter(i => i % 4 >= 2).map(1L << _).sum +
      Seq(1, 5, 9, 13).map(i => 1L << (16 + i)).sum +
      (1L << 38) +
      Seq(0, 1, 4, 5, 8, 9, 12, 13).map(i => 1L << (46 + i)).sum +
      (1L << 61)
    assert(h.n_frames === 3 && h.phash === expected)
  }

  test("videoAHash composites delta frames onto the logical screen") {
    import spark.implicits._
    // explicit 256-gray indexed palette (the corpus builder's trick) —
    // TYPE_BYTE_GRAY would get palette-quantized by the GIF writer,
    // and the two encodes could quantize differently
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    def gray(w: Int, h: Int)(v: (Int, Int) => Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, v(x, y))
      img
    }
    def writeGif(frames: Seq[(java.awt.image.BufferedImage, Int, Int)])
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, left, top) =>
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        // the default metadata fabricates a generic web-safe
        // LocalColorTable that would clobber the gray palette — strip
        // it so the writer derives the table from the image itself
        val lct = tree.getElementsByTagName("LocalColorTable")
        if (lct.getLength > 0) tree.removeChild(lct.item(0))
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    // base 8x8 gradient; delta GIF patches a 4x4 block at (2,2) in
    // frame 1 while the full-frame GIF re-encodes the composited result
    val base = gray(8, 8)((x, y) => (x * 20 + y * 7) % 256)
    val patch = gray(4, 4)((x, y) => 250 - x * 30 - y * 11)
    val composited = gray(8, 8)((x, y) =>
      if (x >= 2 && x < 6 && y >= 2 && y < 6)
        250 - (x - 2) * 30 - (y - 2) * 11
      else (x * 20 + y * 7) % 256)
    val delta = writeGif(Seq((base, 0, 0), (patch, 2, 2)))
    val full = writeGif(Seq((base, 0, 0), (composited, 0, 0)))
    val media = Seq((1L, delta), (2L, full)).toDF("doc_id", "payload")
    val out = Multimodal.videoAHash(media).collect()
      .map(v => v.doc_id -> (v.n_frames, v.phash)).toMap
    assert(out(1L)._1 === 2)
    assert(out(1L) === out(2L),
      "delta-encoded GIF must hash equal to its full-frame re-encode")
  }

  test("videoAHash: transparent delta pixels preserve the canvas " +
    "(optimized-GIF transparency compositing)") {
    import spark.implicits._
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays,
      grays, 255) // index 255 = transparent (the optimizer's marker)
    def gray(w: Int, h: Int)(v: (Int, Int) => Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, v(x, y))
      img
    }
    def writeGif(frames: Seq[(java.awt.image.BufferedImage, Int, Int)])
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, left, top) =>
        val meta = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        desc.setAttribute("imageLeftPosition", left.toString)
        desc.setAttribute("imageTopPosition", top.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        val gce = tree.getElementsByTagName("GraphicControlExtension")
          .item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        gce.setAttribute("transparentColorFlag", "TRUE")
        gce.setAttribute("transparentColorIndex", "255")
        val lct = tree.getElementsByTagName("LocalColorTable")
        if (lct.getLength > 0) tree.removeChild(lct.item(0))
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      bos.toByteArray
    }
    val base = gray(8, 8)((x, y) => (x * 20 + y * 7) % 200)
    // delta frame: a full-screen raster that changes ONLY a 2x2 block;
    // everything else is the transparent index (the optimizer's shape)
    val delta = gray(8, 8)((x, y) =>
      if (x >= 3 && x < 5 && y >= 3 && y < 5) 180 else 255)
    val composited = gray(8, 8)((x, y) =>
      if (x >= 3 && x < 5 && y >= 3 && y < 5) 180
      else (x * 20 + y * 7) % 200)
    val optimized = writeGif(Seq((base, 0, 0), (delta, 0, 0)))
    val full = writeGif(Seq((base, 0, 0), (composited, 0, 0)))
    val media = Seq((1L, optimized), (2L, full)).toDF("doc_id", "payload")
    val out = Multimodal.videoAHash(media).collect()
      .map(v => v.doc_id -> (v.n_frames, v.phash)).toMap
    assert(out(1L) === out(2L),
      "transparent pixels must composite as 'preserve', not as color 255")
  }

  test("video 63-bit/16-bit-band layout does not saturate the cap " +
    "(mm12 invariant: zero dropped rows at the production cap)") {
    // the r7 31-bit/8-bit layout had 1,024 possible (band, value)
    // buckets — at corpus scale every bucket exceeds the frequency cap
    // and near-dup recall silently collapses. The widened layout must
    // show zero drops on the gate corpus.
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val hashes = Multimodal.videoAHash(
      Multimodal.videoPayloads(docs)).toDF()
    val audit = Multimodal.hammingCapAudit(hashes, bandBits = 16,
      numBands = 4, maxBucket = 1000).head()
    assert(audit.getAs[Long]("dropped_rows") === 0L,
      s"video near-dup cap saturated: $audit")
  }

  test("nearestByHamming: band-mates ranked by bit_count, ties to smallest id; loners get -1") {
    import spark.implicits._
    // a/b share bands 0,2,3 and differ in 1 bit of band 1;
    // c shares no band with anyone (all bytes distinct from a/b's).
    val hashes = Seq(
      (1L, 8, 4, 0x00010111L), // bands 11 01 01 00
      (2L, 8, 4, 0x00010311L), //      11 03 01 00 -> shares bytes 0,2,3 with 1
      (3L, 8, 4, 0x7F22FF44L)) //      44 FF 22 7F -> no shared band
      .toDF("doc_id", "width", "height", "phash")
    val out = Multimodal.nearestByHamming(hashes)
      .orderBy("doc_id")
      .select("doc_id", "nn_id", "nn_hamming")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, -1L, -1L)))
  }

  test("nearestByHamming maxBucket drops hot buckets; audit counts them") {
    import spark.implicits._
    // ten flat payloads collapse onto phash 0 (every band value 0 —
    // the degenerate bucket the cap exists for); two structured hashes
    // share a band with each other but not with the flat glut
    val flat = (1L to 10L).map(i => (i, 0L))
    val pair = Seq((101L, 0x0101010101010101L),
      (102L, 0x0101010101010102L))
    val hashes = (flat ++ pair).toDF("doc_id", "phash")
    val capped = Multimodal
      .nearestByHamming(hashes, bandBits = 16, numBands = 4,
        maxBucket = 5)
      .select("doc_id", "nn_id").as[(Long, Long)].collect().toMap
    // flat glut: every (band, 0) bucket holds 10 > 5 rows -> dropped,
    // no candidates, nn = -1; the pair still pairs up through its
    // surviving small buckets
    assert((1L to 10L).forall(capped(_) === -1L))
    assert(capped(101L) === 102L && capped(102L) === 101L)
    val uncapped = Multimodal
      .nearestByHamming(hashes, bandBits = 16, numBands = 4)
      .select("doc_id", "nn_id").as[(Long, Long)].collect().toMap
    assert(capped(1L) !== uncapped(1L)) // the cap is load-bearing
    val Array(a) = Multimodal
      .hammingCapAudit(hashes, bandBits = 16, numBands = 4, maxBucket = 5)
      .as[(Long, Long, Long)].collect()
    // 4 hot buckets (band 0..3, value 0) x 10 rows each; hottest = 10
    assert(a === ((4L, 40L, 10L)))
  }
}
