package graft.functions

import java.awt.image.{BufferedImage, DataBufferInt}
import java.util.zip.{CRC32, Deflater}

/** Minimal PNG encoder for the synthetic-render stages (round-14,
  * VERDICT r13 Next #10): 8-bit truecolor, filter 0, one IDAT, zlib
  * deflate at [[Deflater.BEST_SPEED]].
  *
  * Why not `ImageIO.write(img, "png", …)`: the census showed the
  * image-pipeline per-op cost is real PNG deflate, and the JDK's PNG
  * writer offers no compression dial — it always runs the default
  * deflate level plus adaptive per-scanline filtering, both tuned for
  * ratio, not speed. The pipeline's PNG blobs are mid-pipeline
  * artifacts (encoded, shipped, decoded, discarded), so BEST_SPEED is
  * the honest production dial: container bytes change, DECODED PIXELS
  * do not — every declared query hashes decoded content, never
  * container bytes (PngCodecSpec pins the ImageIO roundtrip
  * pixel-for-pixel). Output is a spec-conformant PNG (signature +
  * IHDR + IDAT + IEND, CRCs included) that `ImageIO.read` — and any
  * other decoder — accepts; only the compression level and the
  * filter-0 choice differ from the facade's output.
  *
  * The int[] raster is read directly (TYPE_INT_RGB, single bank,
  * stride = width for a fresh BufferedImage) — `getRGB` per pixel
  * pays a ColorModel indirection per call.
  */
object PngCodec {

  def encode(img: BufferedImage): Array[Byte] = {
    require(img.getType == BufferedImage.TYPE_INT_RGB,
      s"PngCodec.encode expects TYPE_INT_RGB, got ${img.getType}")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[DataBufferInt].getData
    // raw image stream: per scanline one filter byte (0 = None) +
    // w RGB triples
    val raw = new Array[Byte](h * (1 + 3 * w))
    var i = 0
    var o = 0
    var y = 0
    while (y < h) {
      raw(o) = 0
      o += 1
      var x = 0
      while (x < w) {
        val p = px(i)
        i += 1
        raw(o) = ((p >> 16) & 0xff).toByte
        raw(o + 1) = ((p >> 8) & 0xff).toByte
        raw(o + 2) = (p & 0xff).toByte
        o += 3
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.BEST_SPEED)
    defl.setInput(raw)
    defl.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = comp.toByteArray
    val out = new java.io.ByteArrayOutputStream(idat.length + 64)
    val dos = new java.io.DataOutputStream(out)
    dos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte)  // compression: deflate
      .put(0.toByte)  // filter method 0
      .put(0.toByte)  // no interlace
    writeChunk(dos, "IHDR", ihdr.array())
    writeChunk(dos, "IDAT", idat)
    writeChunk(dos, "IEND", Array.emptyByteArray)
    dos.flush()
    out.toByteArray
  }

  private def writeChunk(dos: java.io.DataOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    dos.writeInt(data.length)
    val t = typ.getBytes("US-ASCII")
    dos.write(t)
    dos.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    dos.writeInt(crc.getValue.toInt)
  }
}
