package graft.synth

import java.awt.image.BufferedImage
import scala.util.Random

import graft.model.{ExpectedCluster, ImageRow}
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic distributed synthesis of the image+caption input table
 * (FIXTURES.md sections 1 and 4) with known ground-truth clusters.
 *
 * Reference precedent for fixed seeding: random_seed=42 in dataset configs
 * (reference: ea/sim/dev/scripts/data/dataset/nb/main.py:12) and global
 * set_seed (ea/common/utils/utils.py:15-27).
 *
 * Each base image is an independent unit of work keyed only by
 * (seed, baseIdx), so generation is a narrow `spark.range(bases).flatMap` —
 * embarrassingly parallel, no driver materialization, scales linearly with
 * cores (this is also the bench-harness input generator).
 */
object ImageGen {

  /** ~240-word vocabulary: enough English function words that captions behave
    * like text for the language-ID / stopword heuristics, plus content nouns. */
  private val Vocab: IndexedSeq[String] = {
    val function = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "was", "at", "by")
    val content = Seq("red", "green", "blue", "amber", "violet", "cyan",
      "river", "mountain", "forest", "city", "bridge", "tower", "harbor",
      "sunset", "sunrise", "meadow", "canyon", "glacier", "island", "valley",
      "cat", "dog", "horse", "eagle", "salmon", "tiger", "whale", "falcon",
      "ancient", "modern", "rustic", "gleaming", "shadowed", "vast", "quiet",
      "stormy", "golden", "silver", "crimson", "emerald", "walking", "flying",
      "standing", "resting", "running", "gazing", "drifting", "climbing",
      "photo", "painting", "sketch", "portrait", "landscape", "closeup",
      "aerial", "macro", "street", "night", "winter", "summer", "autumn",
      "spring", "field", "shore", "cliff", "garden", "market", "temple",
      "castle", "village", "desert", "lagoon", "orchard", "plateau", "reef")
    (function ++ content ++ (0 until 150).map(i => s"entity$i")).toIndexedSeq
  }

  /** Procedural base image: bilinear interpolation of random colors on a
    * (g+1)x(g+1) node grid. Smooth fields keep lossy re-encodes above the
    * 40 dB PSNR fidelity gate (hard edges would ring below it) while the
    * node colors still separate bases in average-hash space. */
  def renderBase(seed: Long, baseIdx: Long): BufferedImage = {
    val rng = new Random(graft.functions.HashKernels.mix64(seed * 0x9E3779B97F4A7C15L + baseIdx))
    val g = 4 + rng.nextInt(5)             // 4..8 cells per axis
    val size = 64 + 16 * rng.nextInt(13)   // 64..256 px
    val img = new BufferedImage(size, size, BufferedImage.TYPE_3BYTE_BGR)
    val nodes = Array.fill((g + 1) * (g + 1))(rng.nextInt(0x1000000))
    @inline def node(ix: Int, iy: Int) = nodes(iy * (g + 1) + ix)
    @inline def ch(c: Int, s: Int) = (c >> s) & 0xFF
    var y = 0
    while (y < size) {
      val fy = y.toDouble * g / size
      val iy = math.min(g - 1, fy.toInt); val ty = fy - iy
      var x = 0
      while (x < size) {
        val fx = x.toDouble * g / size
        val ix = math.min(g - 1, fx.toInt); val tx = fx - ix
        val (c00, c10, c01, c11) = (node(ix, iy), node(ix + 1, iy),
          node(ix, iy + 1), node(ix + 1, iy + 1))
        var rgb = 0
        var s = 0
        while (s <= 16) {
          val v = (ch(c00, s) * (1 - tx) * (1 - ty) + ch(c10, s) * tx * (1 - ty) +
            ch(c01, s) * (1 - tx) * ty + ch(c11, s) * tx * ty).toInt
          rgb |= (math.min(255, math.max(0, v)) << s)
          s += 8
        }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  def baseCaption(seed: Long, baseIdx: Long): Array[String] = {
    val rng = new Random(graft.functions.HashKernels.mix64(seed * 0x51AF3C6B9E7D21L + baseIdx))
    val len = 12 + rng.nextInt(9) // 12..20 tokens: a single-token edit keeps
                                  // shingle Jaccard >= ~0.53 > jaccardMin=0.5
    Array.fill(len)(Vocab(rng.nextInt(Vocab.length)))
  }

  /** Skewed cluster size: mostly 1-4 variants, occasional large clusters to
    * exercise LSH-bucket salting (mirrors issue-size skew,
    * reference: helpers/print_dataset_sizes.py:50-76). */
  private def clusterSize(rng: Random, maxSize: Int): Int = {
    val u = rng.nextDouble()
    math.min(maxSize, 1 + (math.pow(u, -0.6) - 1.0).toInt)
  }

  /** All rows of one ground-truth cluster (baseIdx). Row 0 is the pristine
    * PNG original; variants re-encode / resize / perturb the caption per
    * FIXTURES.md section 4 so they stay within dup thresholds.
    *
    * `light = true` skips byte encoding (bytes empty, lossy variant keeps the
    * base pixels): same ids, captions, dimensions, and phash geometry, at a
    * fraction of the synthesis cost. Used by the bench harness, whose dedup
    * job never reads the payload column anyway (columnar pruning) — codec
    * throughput is benchmarked separately by the multimodal decode query. */
  def cluster(seed: Long, baseIdx: Long, maxClusterSize: Int,
      light: Boolean = false): Seq[ImageRow] = {
    val rng = new Random(graft.functions.HashKernels.mix64(seed * 0xC2B2AE3D27D4EB4FL + baseIdx))
    val base = renderBase(seed, baseIdx)
    val caption = baseCaption(seed, baseIdx)
    val n = clusterSize(rng, maxClusterSize)

    (0 until n).map { v =>
      val id = f"img_${baseIdx}%08d_$v%03d"
      val variantKind = if (v == 0) -1 else rng.nextInt(4)
      def enc(i: BufferedImage): Array[Byte] =
        if (light) Array.emptyByteArray else ImageCodec.encodePng(i)
      val (img, fmt, bytes) = variantKind match {
        case -1 => (base, "png", enc(base))
        case 0 => // lossy re-encode (light mode keeps base pixels)
          if (light) (base, "jpg", Array.emptyByteArray)
          else {
            val b = ImageCodec.encodeJpg(base)
            (ImageCodec.decode(b), "jpg", b)
          }
        case 1 => // 2x down-resize (re-encoded lossless)
          val r = ImageCodec.resize(base, base.getWidth / 2, base.getHeight / 2)
          (r, "png", enc(r))
        case 2 => // identity re-encode
          (base, "png", enc(base))
        case _ => // caption twin: unrelated pixels, duplicate by caption only —
          // exercises the MinHash-LSH path in the recall gate
          val alt = renderBase(seed ^ 0x5DEECE66DL, baseIdx * 1_000_003L + v)
          (alt, "png", enc(alt))
      }
      // caption: exact copy, or <=1 token edit (stays above Jaccard threshold);
      // caption twins always keep the caption exact (their only dup evidence)
      val cap =
        if (v == 0 || variantKind == 3 || rng.nextDouble() < 0.5) caption
        else {
          val c = caption.clone()
          c(rng.nextInt(c.length)) = Vocab(rng.nextInt(Vocab.length))
          c
        }
      ImageRow(id, bytes, img.getWidth, img.getHeight, fmt,
        cap.mkString(" "), ImageCodec.averageHash(img))
    }
  }

  /** Distributed generation of the full table. */
  def generate(spark: SparkSession, bases: Long, seed: Long = 42L,
      maxClusterSize: Int = 64, light: Boolean = false): Dataset[ImageRow] = {
    import spark.implicits._
    spark.range(0L, bases, 1L, math.max(1, (bases / 16).toInt).min(256))
      .as[Long]
      .flatMap(b => cluster(seed, b, maxClusterSize, light))
  }

  /**
   * Lattice-aligned crop of an encoded image: decodes `bytes`, copies the
   * sub-rectangle whose corners sit on lattice lines `i * dim / lattice`
   * (the [[graft.operators.Dedup.cropDups]] alignment contract), re-encodes
   * losslessly as PNG. Used to plant crop duplicates in specs and the q88
   * oracle corpus — lossless encode keeps the crop's decoded pixels
   * identical to the source region, so detection is guaranteed by the
   * [[ImageCodec.regionCells]] arithmetic, not probabilistic.
   *
   * @param lx0,ly0,lx1,ly1 lattice indices, 0 <= lx0 < lx1 <= lattice
   */
  def cropOf(bytes: Array[Byte], lattice: Int,
      lx0: Int, ly0: Int, lx1: Int, ly1: Int): Array[Byte] = {
    require(0 <= lx0 && lx0 < lx1 && lx1 <= lattice &&
      0 <= ly0 && ly0 < ly1 && ly1 <= lattice,
      s"lattice window ($lx0,$ly0)-($lx1,$ly1) invalid for lattice=$lattice")
    val img = ImageCodec.decode(bytes)
    val w = img.getWidth; val h = img.getHeight
    val x0 = lx0 * w / lattice; val x1 = lx1 * w / lattice
    val y0 = ly0 * h / lattice; val y1 = ly1 * h / lattice
    val out = new BufferedImage(x1 - x0, y1 - y0, BufferedImage.TYPE_3BYTE_BGR)
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) { out.setRGB(x - x0, y - y0, img.getRGB(x, y)); x += 1 }
      y += 1
    }
    ImageCodec.encodePng(out)
  }

  /** Integer-factor nearest-neighbor upscale (each pixel becomes an f×f
    * block) — the planted input for [[graft.operators.Dedup.scaleDups]]:
    * the lossless "re-uploaded at a different resolution" transform whose
    * scale-canonical key is bit-identical to the original's
    * ([[graft.synth.ImageCodec.scaleKey]]'s exact invariant). */
  def upscaleOf(bytes: Array[Byte], f: Int): Array[Byte] = {
    require(f >= 2, s"upscale factor($f) must be >= 2")
    val img = ImageCodec.decode(bytes)
    val w = img.getWidth; val h = img.getHeight
    val out = new BufferedImage(w * f, h * f, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        var dy = 0
        while (dy < f) {
          var dx = 0
          while (dx < f) { out.setRGB(x * f + dx, y * f + dy, rgb); dx += 1 }
          dy += 1
        }
        x += 1
      }
      y += 1
    }
    ImageCodec.encodePng(out)
  }

  /** Lossless re-post of an encoded image inside a solid border of `px`
    * pixels on every side — the planted input for [[graft.operators.Dedup
    * .borderDups]] specs and the q89 oracle corpus. */
  def withBorder(bytes: Array[Byte], px: Int, rgb: Int): Array[Byte] = {
    require(px >= 1, s"border width must be positive, got $px")
    val img = ImageCodec.decode(bytes)
    val out = new BufferedImage(img.getWidth + 2 * px, img.getHeight + 2 * px,
      BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < out.getHeight) {
      var x = 0
      while (x < out.getWidth) { out.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { out.setRGB(x + px, y + px, img.getRGB(x, y)); x += 1 }
      y += 1
    }
    ImageCodec.encodePng(out)
  }

  /** Lossless re-post of an encoded image with a solid `rgb` rectangle
    * stamped over pixels [x0, x0+rw) x [y0, y0+rh) — the watermark / logo /
    * timestamp transform. Planted input for [[graft.operators.Dedup
    * .overlayDups]] specs and the q92 oracle corpus: every pixel OUTSIDE
    * the rectangle is bit-identical to the source, so tiles the rectangle
    * does not touch keep their exact tile keys. */
  def withOverlay(bytes: Array[Byte], x0: Int, y0: Int, rw: Int, rh: Int,
      rgb: Int): Array[Byte] = {
    val img = ImageCodec.decode(bytes)
    require(rw >= 1 && rh >= 1 && x0 >= 0 && y0 >= 0 &&
      x0 + rw <= img.getWidth && y0 + rh <= img.getHeight,
      s"overlay rect ($x0,$y0 ${rw}x$rh) outside ${img.getWidth}x${img.getHeight}")
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val inside = x >= x0 && x < x0 + rw && y >= y0 && y < y0 + rh
        out.setRGB(x, y, if (inside) rgb else img.getRGB(x, y))
        x += 1
      }
      y += 1
    }
    ImageCodec.encodePng(out)
  }

  /** Ground-truth assignment table (FIXTURES.md section 3). */
  def expectedClusters(spark: SparkSession, bases: Long, seed: Long = 42L,
      maxClusterSize: Int = 64): Dataset[ExpectedCluster] = {
    import spark.implicits._
    spark.range(0L, bases).as[Long].flatMap { b =>
      val rng = new Random(graft.functions.HashKernels.mix64(seed * 0xC2B2AE3D27D4EB4FL + b))
      val n = clusterSize(rng, maxClusterSize)
      (0 until n).map(v => ExpectedCluster(f"img_${b}%08d_$v%03d", b))
    }
  }
}
