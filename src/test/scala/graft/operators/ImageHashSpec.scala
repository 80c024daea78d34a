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
    // cells: idx = row*4 + colcell; right half = colcell 2,3. The two
    // right-bright frames carry the majority for both the aHash bits
    // and the dark→bright chain-step dHash bits (i % 4 == 1).
    val expected = (0 until 16).filter(i => i % 4 >= 2).map(1L << _).sum +
      Seq(1, 5, 9, 13).map(i => 1L << (16 + i)).sum
    assert(h.n_frames === 3 && h.phash === expected)
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
