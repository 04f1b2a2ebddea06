package graft.functions

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec must be pixel-for-pixel identical to the ImageIO PNG
  * roundtrip — container bytes are allowed to differ (BEST_SPEED
  * deflate, filter 0), decoded content is not. */
class PngCodecSpec extends AnyFunSuite {

  private def render(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed % 251) * (x + 3) + x * x * 7 + y * y * 13) % 256
        val g = ((seed % 241) * (y + 5) + x * 31 + y * 29) % 256
        val b = ((seed % 233) * (x + y + 7) + x * 7) % 256
        img.setRGB(x, y,
          ((r.toInt & 0xff) << 16) | ((g.toInt & 0xff) << 8) |
            (b.toInt & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  private def pixels(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff

  test("ImageIO decodes PngCodec output to the exact source pixels " +
    "across sizes (including 1x1 and non-square)") {
    for ((w, h, seed) <- Seq((1, 1, 7L), (2, 3, 11L), (16, 16, 0L),
      (48, 16, 12345L), (17, 40, 999L), (47, 39, 31L))) {
      val img = render(w, h, seed)
      val bytes = PngCodec.encode(img)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(back != null, s"undecodable PNG at ${w}x$h")
      assert(back.getWidth == w && back.getHeight == h)
      assert(pixels(back) == pixels(img),
        s"pixel mismatch at ${w}x$h seed=$seed")
      // and identical to what the ImageIO writer's roundtrip decodes
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val facadeBack = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert(pixels(back) == pixels(facadeBack),
        "PngCodec and ImageIO roundtrips decode differently")
    }
  }
}
