package graft.multimodal

import graft.SparkSpecBase
import graft.multimodal.Multimodal.ImageHeader
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import java.awt.image.BufferedImage

class ImageHeaderSpec extends SparkSpecBase {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("header parse recovers dimensions from real encoded bytes") {
    for (fmt <- Seq("png", "gif", "bmp", "jpg")) {
      val bytes = encode(fmt, 31, 17)
      val meta = ImageHeader.parse(bytes)
      assert(meta.isDefined, s"$fmt: no header parsed")
      assert(meta.get.width == 31 && meta.get.height == 17,
        s"$fmt: got ${meta.get}")
    }
  }

  test("non-image bytes parse to None, not garbage") {
    assert(ImageHeader.parse("just some text".getBytes).isEmpty)
    assert(ImageHeader.parse(Array[Byte]()).isEmpty)
    assert(ImageHeader.parse(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("distributed header extraction over a binary column") {
    import spark.implicits._
    val rows = Seq(
      (1L, encode("png", 8, 4)),
      (2L, encode("gif", 5, 5)),
      (3L, "not an image".getBytes))
    val df = rows.toDF("id", "payload")
    val out = df.map { r =>
      val m = ImageHeader.parse(r.getAs[Array[Byte]]("payload"))
      (r.getLong(0), m.map(_.format).getOrElse("unknown"),
        m.map(_.width).getOrElse(-1))
    }.collect().sortBy(_._1)
    assert(out.toList == List((1L, "png", 8), (2L, "gif", 5), (3L, "unknown", -1)))
  }
}
