package graft.fetch

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
import graft.model.ImageRow

/** Deterministic image synthesis + perceptual hashing + PSNR.
  *
  * The image corpus is the engine's payload table (BASELINE.json
  * input_hint): `(image_id, bytes, w, h, fmt, caption, phash)`. Everything
  * here is seeded and pure — `javax.imageio` is JDK-built-in, so encode/
  * decode/verify run fully distributed with no native deps. The per-row
  * invariant vs any reference dump is decoded-pixel PSNR ≥ 40 dB for jpeg
  * (exact for png) + exact caption equality.
  */
object ImageKit {

  /** splitmix64 — stable across JVMs, used for all seeded draws. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix(seed: Long, key: String): Long = {
    var h = seed
    var i = 0
    while (i < key.length) { h = mix(h ^ key.charAt(i).toLong); i += 1 }
    h
  }

  /** Smooth seeded gradient + bands — compresses predictably under JPEG so
    * the PSNR≥40dB invariant holds at quality 0.9. */
  def renderPixels(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val r0 = (mix(seed) & 0xff).toInt
    val g0 = (mix(seed + 1) & 0xff).toInt
    val b0 = (mix(seed + 2) & 0xff).toInt
    val dirX = ((mix(seed + 3) & 0x1) + 1).toInt
    val dirY = ((mix(seed + 4) & 0x1) + 1).toInt
    // triangle wave instead of modulo wrap: hard wrap edges ring badly
    // under JPEG and would break the PSNR≥40dB invariant
    def tri(v: Int): Int = { val t = v % 510; if (t > 255) 510 - t else t }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = tri(r0 + (x * dirX * 255) / math.max(1, w))
        val g = tri(g0 + (y * dirY * 255) / math.max(1, h))
        val b = tri(b0 + ((x + y) * 255) / math.max(1, w + h))
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fmt match {
      case "jpeg" | "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(0.95f)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), params)
        ios.close(); writer.dispose()
      case _ =>
        ImageIO.write(img, "png", out)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** 64-bit average hash: 8×8 grayscale downsample, bit = above mean. */
  def phash(img: BufferedImage): Long = {
    val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val gray = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      val v = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      gray(i) = v
      sum += v
      i += 1
    }
    val mean = sum / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (gray(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  def phashOf(bytes: Array[Byte]): Long = phash(decode(bytes))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** PSNR in dB over RGB channels; Double.PositiveInfinity when identical. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight,
      "image dimensions differ")
    var mse = 0.0
    var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var shift = 0
        while (shift <= 16) {
          val d = (((pa >> shift) & 0xff) - ((pb >> shift) & 0xff)).toDouble
          mse += d * d
          n += 1
          shift += 8
        }
        x += 1
      }
      y += 1
    }
    mse /= n
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  def psnrOf(a: Array[Byte], b: Array[Byte]): Double = psnr(decode(a), decode(b))

  private val captionWords = Vector(
    "sunset", "harbor", "mountain", "forest", "river", "skyline", "meadow",
    "lantern", "bridge", "orchard", "glacier", "dune", "canyon", "reef",
    "plateau", "valley")

  def captionFor(seed: Long, id: String): String = {
    val h = mix(seed, id)
    val w1 = captionWords((h & 0xf).toInt)
    val w2 = captionWords(((h >> 4) & 0xf).toInt)
    val w3 = captionWords(((h >> 8) & 0xf).toInt)
    s"a photo of a $w1 near the $w2 under a $w3 sky"
  }

  /** One deterministic corpus row (FIXTURES.md §1). */
  def imageRow(seed: Long, i: Int): ImageRow = {
    val id = f"img$i%08d"
    val h0 = mix(seed, id)
    val w = 16 + (math.abs(h0) % 241).toInt
    val ht = 16 + (math.abs(mix(h0)) % 241).toInt
    val fmt = if (i % 2 == 0) "png" else "jpeg"
    val img = renderPixels(h0, w, ht)
    val bytes = encode(img, fmt)
    ImageRow(id, bytes, w, ht, fmt, captionFor(seed, id), phash(img))
  }
}
