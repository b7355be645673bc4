package graft.multimodal

import graft.SparkSpecBase
import graft.multimodal.Multimodal._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The REAL codec layer (r16): javax.imageio pixel decode +
  * javax.sound.sampled PCM decode behind the MediaDecoder seam, and
  * the two oracle-gated round-trip queries (mm08/mm09). The oracle
  * gate proves encode→decode bit-fidelity at sf0.01; these specs pin
  * the decoder semantics the oracle can't see (pooled luma values,
  * multi-band luma, fallback behavior, real-pixel pHash).
  */
class MediaCodecSpec extends SparkSpecBase {

  // --- PngCodec: lossless gray-8 round trip, bit-exact ---

  test("PngCodec round-trips gray pixels bit-exactly") {
    val w = 13; val h = 9
    def px(x: Int, y: Int): Int = (x * 31 + y * 57 + 5) % 256
    val png = PngCodec.encodeGray(w, h, px)
    // it is a REAL PNG container: the magic-byte sniffer agrees
    assert(ImageHeader.parse(png).contains(ImageHeader.Meta("png", w, h)))
    val (dw, dh, samples) = PngCodec.decodeGray(png).get
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(samples(y * w + x) == px(x, y), s"pixel ($x,$y)")
  }

  test("PngCodec.decodeGray rejects non-image and multi-band payloads") {
    assert(PngCodec.decodeGray("plain text".getBytes).isEmpty)
    val rgb = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream(); ImageIO.write(rgb, "png", bos)
    assert(PngCodec.decodeGray(bos.toByteArray).isEmpty) // 3 bands
  }

  // --- WavCodec: lossless PCM16 round trip ---

  test("WavCodec round-trips 16-bit PCM samples bit-exactly") {
    val samples = Array.tabulate(301)(i =>
      ((i * 104729L) % 65536 - 32768).toShort)
    val wav = WavCodec.encodePcm16(samples)
    // RIFF/WAVE container magic
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val dec = WavCodec.decodePcm16(wav).get
    assert(dec.length == samples.length)
    assert(dec.sameElements(samples))
  }

  test("WavCodec.decodePcm16 rejects non-audio bytes") {
    assert(WavCodec.decodePcm16("not a wav".getBytes).isEmpty)
    assert(WavCodec.decodePcm16(Array.emptyByteArray).isEmpty)
  }

  // --- ImageIODecoder: the real decode seam ---

  test("ImageIODecoder.lumaGrid on an exact 8x8 gray PNG is the pixels themselves") {
    def px(x: Int, y: Int): Int = y * 8 + x // 0..63, one value per cell
    val png = PngCodec.encodeGray(8, 8, px)
    val grid = ImageIODecoder.lumaGrid(png).get
    for (y <- 0 until 8; x <- 0 until 8)
      assert(grid(y * 8 + x) == px(x, y))
  }

  test("ImageIODecoder average-pools larger images with integer cell means") {
    // 16x16 constant-128 image -> every pooled cell is exactly 128
    val png = PngCodec.encodeGray(16, 16, (_, _) => 128)
    assert(ImageIODecoder.lumaGrid(png).get.forall(_ == 128))
  }

  test("ImageIODecoder handles multi-band (RGB) images via integer BT.601 luma") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xff0000) // pure red
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "png", bos)
    val grid = ImageIODecoder.lumaGrid(bos.toByteArray).get
    assert(grid.forall(_ == 255 * 299 / 1000)) // (255*299+0+0)/1000 = 76
  }

  test("ImageIODecoder resolves indexed images (GIF) through the palette, not raw indices") {
    // a palettized single-band image's samples are palette INDICES —
    // the decoder must go through the color model. Constant
    // (100,150,200): BT.601 luma (100*299+150*587+200*114)/1000 = 140
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "gif", bos)
    val decoded = ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(decoded.getColorModel.isInstanceOf[java.awt.image.IndexColorModel],
      "fixture did not palettize — test needs a different encoder")
    val grid = ImageIODecoder.lumaGrid(bos.toByteArray).get
    assert(grid.forall(_ == 140), s"palette indices leaked as luma: ${grid.toSeq.distinct}")
  }

  test("ImageIODecoder scales 16-bit grayscale down to the 0..255 grid contract") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    val r = img.getRaster
    for (y <- 0 until 8; x <- 0 until 8) r.setSample(x, y, 0, 0x8040) // >> 8 = 0x80
    val bos = new ByteArrayOutputStream(); ImageIO.write(img, "png", bos)
    val grid = ImageIODecoder.lumaGrid(bos.toByteArray).get
    assert(grid.forall(_ == 0x80), s"16-bit samples off the 0..255 grid: ${grid.toSeq.distinct}")
  }

  test("ImageIODecoder falls back to a 64-bin histogram for non-image payloads") {
    val f = ImageIODecoder.decode("some plain text payload".getBytes)
    assert(f.length == 64)
    assert(math.abs(f.sum - 1f) < 1e-5) // L1-normalized
    assert(ImageIODecoder.lumaGrid("some plain text payload".getBytes).isEmpty)
  }

  // --- real-pixel perceptual hash ---

  test("phash64 hashes DECODED pixels: near-identical images collide, distinct ones do not") {
    def noisy(seed: Int)(x: Int, y: Int): Int =
      ((x * 7 + y * 13) * seed + seed * seed) % 256
    val a = PngCodec.encodeGray(32, 32, noisy(3))
    // same image with one pixel nudged: pooled grid barely moves
    val b = PngCodec.encodeGray(32, 32,
      (x, y) => if (x == 5 && y == 5) (noisy(3)(x, y) + 4) % 256 else noisy(3)(x, y))
    val c = PngCodec.encodeGray(32, 32, (x, y) => if (x < 16) 0 else 255)
    val ha = phash64(a); val hb = phash64(b); val hc = phash64(c)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3, "near-dup images must near-collide")
    assert(java.lang.Long.bitCount(ha ^ hc) > 10, "distinct images must differ")
    // the decode path is ENGAGED: hashing the container bytes raw
    // gives a different signature than hashing the decoded pixels
    assert(ha != aHash64(a))
  }

  test("hammingPairs finds real-image near-dups from real pHashes") {
    import spark.implicits._
    def base(x: Int, y: Int): Int = (x * 11 + y * 23 + 7) % 256
    val imgs = Seq(
      1L -> PngCodec.encodeGray(24, 24, base),
      2L -> PngCodec.encodeGray(24, 24,
        (x, y) => if (x == 0 && y == 0) (base(x, y) + 2) % 256 else base(x, y)),
      3L -> PngCodec.encodeGray(24, 24, (x, y) => 255 - base(x, y)))
    val sig = imgs.map { case (id, png) => (id, phash64(png)) }.toDF("doc_id", "sig")
    val pairs = hammingPairs(sig, maxHamming = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-dup image pair missed")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "inverted image wrongly paired")
  }

  // --- the oracle-gated queries, spot-checked against the closed form ---

  test("mm08_image_codec: decoded-raster stats equal the closed-form pixel function") {
    val rows = mm08_image_codec(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "png"))
    for (r <- rows.take(20)) {
      val id = r.getLong(0)
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val px = Array.tabulate(w * h)(i => (id * 31 + i.toLong * 13) % 256)
      assert(r.getLong(2) == w && r.getLong(3) == h)
      assert(r.getLong(4) == px.sum, s"px_sum for doc $id")
      assert(r.getLong(5) == px.map(v => v * v).sum, s"px_sq_sum for doc $id")
    }
  }

  test("mm09_wav_codec: decoded-sample stats equal the closed-form PCM function") {
    val rows = mm09_wav_codec(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows.take(20)) {
      val id = r.getLong(0)
      val n = (64 + id % 97).toInt
      val v = Array.tabulate(n)(i => (id * 7919 + i.toLong * 104729) % 65536 - 32768)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == v.map(math.abs).sum, s"sum_abs for doc $id")
      assert(r.getLong(3) == v.map(math.abs).max, s"peak_abs for doc $id")
      assert(r.getLong(4) == v.map(x => x * x).sum, s"sum_sq for doc $id")
    }
  }

  test("mm02 feature seam now carries the 64-dim real-decoder contract") {
    val rows = mm02_decode_stub(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) == 64L)) // feat_dim column
  }
}
