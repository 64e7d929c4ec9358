package graft

import graft.multimodal.MultimodalOps

/** Randomized DIFFERENTIAL tests for the perceptual image-hash
  * family: dHash replayed on the driver for BOTH tiers — real decodes
  * over driver-generated lossless PNGs (block-average pooling with
  * the ≥1-pixel cell clamps, BT.601 luma, the 9→8 comparison ladder)
  * and the deterministic byte-grid stub for undecodable payloads —
  * plus the banded-hamming near-dup join against a brute all-pairs
  * hamming model (the pigeonhole guarantee: ≤7 differing bits over 8
  * byte-bands must always meet in one band). Image shapes straddle
  * the pooling boundaries: 1×1 (every cell clamps), sub-grid sizes
  * (3×5), and grids that divide evenly (18×16).
  */
class MultimodalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def mStubHash(bytes: Array[Byte]): Long = {
    val g = new Array[Double](72)
    if (bytes.nonEmpty)
      (0 until 72).foreach(i => g(i) = (bytes(i % bytes.length) & 0xff).toDouble)
    ladder(g)
  }

  private def ladder(g: Array[Double]): Long = {
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (g(r * 9 + c + 1) > g(r * 9 + c)) h |= 1L << (r * 8 + c)
    h
  }

  private def mDecodedHash(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val g = new Array[Double](72)
    for (r <- 0 until 8; c <- 0 until 9) {
      val x0 = c * w / 9; val x1 = math.max(x0 + 1, (c + 1) * w / 9)
      val y0 = r * h / 8; val y1 = math.max(y0 + 1, (r + 1) * h / 8)
      var sum = 0.0
      for (y <- y0 until math.min(y1, h); x <- x0 until math.min(x1, w)) {
        val rgb = im.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      val nPix = math.max(1, (math.min(x1, w) - x0) * (math.min(y1, h) - y0))
      g(r * 9 + c) = sum / nPix
    }
    ladder(g)
  }

  private def png(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def randImage(rnd: scala.util.Random, w: Int, h: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, rnd.nextInt(0x1000000))
    im
  }

  test("imageDHash decode tier ≡ pooling replay on PNGs straddling the cell boundaries") {
    val rnd = new scala.util.Random(17070)
    val shapes = Seq((1, 1), (3, 5), (9, 8), (18, 16), (40, 23))
    val imgs = shapes.zipWithIndex.map { case ((w, h), i) =>
      (i.toLong, randImage(rnd, w, h))
    }
    val rows = imgs.map { case (id, im) => (id, png(im)) }
    val got = MultimodalOps.imageDHash(spark, rows.toDF("media_id", "content"))
      .collect().map(r => r.media_id -> ((r.dhash, r.decoded))).toMap
    imgs.foreach { case (id, im) =>
      assert(got(id)._2, s"id $id must decode (lossless png)")
      assert(got(id)._1 == mDecodedHash(im), s"id $id hash")
    }
  }

  test("imageDHash stub tier ≡ byte-grid replay: undecodable, single-byte, empty payloads") {
    val rnd = new scala.util.Random(17071)
    val rows: Seq[(Long, Array[Byte])] =
      (0L until 10L).map(id => id -> Array.fill(1 + rnd.nextInt(100))(rnd.nextInt().toByte)) ++
        Seq(100L -> Array[Byte](7), 101L -> Array.empty[Byte])
    val got = MultimodalOps.imageDHash(spark, rows.toDF("media_id", "content"))
      .collect().map(r => r.media_id -> ((r.dhash, r.decoded))).toMap
    rows.foreach { case (id, bytes) =>
      assert(!got(id)._2, s"id $id must be a stub")
      assert(got(id)._1 == mStubHash(bytes), s"id $id stub hash")
    }
    assert(got(100L)._1 == 0L && got(101L)._1 == 0L,
      "constant and empty grids compare equal everywhere -> hash 0")
  }

  test("imageNearDupPairs ≡ brute hamming replay (pigeonhole never misses ≤ maxHamming)") {
    val rnd = new scala.util.Random(17072)
    // stub payloads with SHARED byte stems → hashes cluster within a
    // few bits; plus identical payloads → hamming 0
    val stem = Array.fill(72)(rnd.nextInt().toByte)
    val rows: Seq[(Long, Array[Byte])] = (0L until 16L).map { id =>
      val b = stem.clone()
      (0 until rnd.nextInt(4)).foreach(_ => b(rnd.nextInt(72)) = rnd.nextInt().toByte)
      id -> b
    } ++ Seq(50L -> stem.clone(), 51L -> stem.clone())
    val maxHamming = 6
    val hashes = rows.map { case (id, b) => id -> mStubHash(b) }
    val expect = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
    } yield (a, b, d)).toSet
    val got = MultimodalOps.imageNearDupPairs(spark, rows.toDF("media_id", "content"),
        maxHamming = maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.catalog.clearCache()
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(expect.exists(_._3 == 0) && expect.exists(_._3 > 0),
      "fixture must exercise both exact and near pairs")
  }
}
