package graft.synth

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/**
 * In-JDK image codec (java.awt + javax.imageio only — zero external deps):
 * encode/decode PNG and JPEG, average-hash perceptual hashing, PSNR.
 * Used by the synthetic generator, the multimodal decode operator, and the
 * per-row fidelity validators (BASELINE.json input_hint: decoded-pixel
 * PSNR >= 40 dB for lossy, byte equality otherwise).
 */
object ImageCodec {

  // ImageIO defaults to a FileCache*ImageStream per read/write — a temp file
  // on every decode. At 32 concurrent decode tasks that serializes on /tmp
  // inode churn; in-memory streams keep the stage CPU-bound (scaling probe).
  ImageIO.setUseCache(false)

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** JPEG encode with a fixed quality so output bytes are deterministic for a
    * given JVM (FIXTURES.md section 4: fixed encoder params + seeds). */
  def encodeJpg(img: BufferedImage, quality: Float = 0.99f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    // JPEG writer rejects alpha; ensure 3-band RGB
    val rgb = toRgb(img)
    writer.write(null, new IIOImage(rgb, null, null), params)
    ios.flush(); writer.dispose()
    bos.toByteArray
  }

  // ImageIO.read performs synchronized IIORegistry/ServiceRegistry lookups
  // on EVERY call; at ~600k decodes that serializes tens of seconds of lock
  // time across all executor threads (measured: a ~30s ingest component
  // constant across 2 and 8 cores — the signature of a serialized section).
  // Readers are not thread-safe, so cache one per (thread, format) and
  // dispatch on the payload's magic bytes; unknown formats fall back to the
  // registry path.
  private val pngReader: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() => ImageIO.getImageReadersByFormatName("png").next())
  private val jpgReader: ThreadLocal[javax.imageio.ImageReader] =
    ThreadLocal.withInitial(() => ImageIO.getImageReadersByFormatName("jpg").next())

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8

  def decode(bytes: Array[Byte]): BufferedImage = {
    val reader =
      if (isPng(bytes)) pngReader.get()
      else if (isJpg(bytes)) jpgReader.get()
      else return ImageIO.read(new ByteArrayInputStream(bytes))
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.setInput(null)
      iis.close()
    }
  }

  def toRgb(img: BufferedImage): BufferedImage = {
    if (img.getType == BufferedImage.TYPE_3BYTE_BGR) return img
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    out
  }

  /** Nearest-neighbor resize (deterministic, no AA jitter across JVMs). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = math.min(img.getWidth - 1, x * img.getWidth / w)
        val sy = math.min(img.getHeight - 1, y * img.getHeight / h)
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** ITU-R BT.601 luminance per pixel. */
  private def luma(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xFF
    val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /**
   * 64-bit average-hash: area-average luminance on an 8x8 grid, bit i set iff
   * cell i is above the grid mean (FIXTURES.md: DCT-free average-hash variant).
   * Small pixel perturbations (lossy re-encode, mild resize) flip few bits;
   * unrelated images differ on ~32.
   */
  def averageHash(img: BufferedImage): Long = {
    // fast path: read the 3BYTE_BGR raster array directly — getRGB goes
    // through ColorModel conversion per pixel (~10x the decode cost on the
    // validation hot path); both paths compute identical cell sums because
    // luma coefficients are applied to the same 8-bit channel values
    val direct: (Int, Int) => Double = img.getRaster.getDataBuffer match {
      case b: java.awt.image.DataBufferByte
          if img.getType == BufferedImage.TYPE_3BYTE_BGR &&
            b.getData.length == img.getWidth * img.getHeight * 3 =>
        val d = b.getData
        val w = img.getWidth
        (x, y) => {
          val o = (y * w + x) * 3
          0.299 * (d(o + 2) & 0xFF) + 0.587 * (d(o + 1) & 0xFF) + 0.114 * (d(o) & 0xFF)
        }
      case _ => (x, y) => luma(img.getRGB(x, y))
    }
    val cells = new Array[Double](64)
    val w = img.getWidth
    val h = img.getHeight
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
        val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += direct(x, y); x += 1 }
          y += 1
        }
        cells(gy * 8 + gx) = sum / ((x1 - x0) * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    val mean = cells.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** PSNR in dB between two same-size images (Double.PositiveInfinity if equal). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight,
      "psnr requires equal dimensions")
    var mse = 0.0
    val n = a.getWidth * a.getHeight * 3
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var shift = 0
        while (shift <= 16) {
          val d = ((pa >> shift) & 0xFF) - ((pb >> shift) & 0xFF)
          mse += d.toDouble * d
          shift += 8
        }
        x += 1
      }
      y += 1
    }
    mse /= n
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}
