package graft.operators

import graft.SparkSpec
import graft.synth.{ImageCodec, ImageGen}
import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._

/** Crop-resilient image dedup: the regionCells arithmetic identity, the
  * contrast gate, and the cropDups pair contract (guaranteed recall for
  * lossless lattice-aligned crops, no pairs across unrelated images). */
class CropDupSpec extends SparkSpec {
  import spark.implicits._

  private def pngOf(i: Long): Array[Byte] =
    ImageCodec.encodePng(ImageGen.renderBase(4242L, i))

  test("regionCells identity: a lossless crop's whole-frame hash equals the " +
    "source's region hash, cell for cell") {
    val src = ImageGen.renderBase(4242L, 0L)
    val w = src.getWidth; val h = src.getHeight
    val bytes = ImageCodec.encodePng(src)
    // right half at lattice 2: the crop-dedup alignment contract
    val cropBytes = ImageGen.cropOf(bytes, 2, 1, 0, 2, 2)
    val crop = ImageCodec.decode(cropBytes)
    val x0 = w / 2
    val srcCells = ImageCodec.regionCells(src, x0, 0, w - x0, h)
    val cropCells = ImageCodec.regionCells(crop, 0, 0,
      crop.getWidth, crop.getHeight)
    assert(srcCells.toSeq == cropCells.toSeq,
      "crop cells must be BIT-identical to the source region's cells")
    assert(ImageCodec.averageHash(crop) == ImageCodec.cellsAHash(srcCells))
    assert(ImageCodec.regionKey(src, x0, 0, w - x0, h) ==
      ImageCodec.regionKey(crop, 0, 0, crop.getWidth, crop.getHeight))
  }

  test("contrast gate: flat regions emit no key, so identical solid images " +
    "generate no crop pairs") {
    val flat = new BufferedImage(64, 64, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 64; x <- 0 until 64) flat.setRGB(x, y, 0x808080)
    assert(ImageCodec.regionKey(flat, 0, 0, 64, 64).isEmpty)
    val bytes = ImageCodec.encodePng(flat)
    val images = Seq(("f1", bytes, "png"), ("f2", bytes, "png"))
      .toDF("image_id", "bytes", "fmt")
    assert(Dedup.cropDups(spark, images, lattice = 2).count() == 0,
      "flat-fill duplicates are out of contract for the crop family " +
        "(they belong to exact/phash dedup) — the gate must drop them")
  }

  test("cropDups: planted lattice crops are found exactly, unrelated images " +
    "never pair, and a pixel-identical re-encode matches on every region") {
    val quad = ImageGen.cropOf(pngOf(0), 2, 0, 0, 1, 1)
    val half = ImageGen.cropOf(pngOf(1), 2, 0, 1, 2, 2)
    val reenc = ImageCodec.encodePng(ImageCodec.decode(pngOf(2)))
    val images = Seq(
      ("a0", pngOf(0), "png"), ("a1", pngOf(1), "png"),
      ("a2", pngOf(2), "png"), ("a3", pngOf(3), "png"), // a3: no variant
      ("c0", quad, "png"), ("c1", half, "png"), ("r2", reenc, "png"))
      .toDF("image_id", "bytes", "fmt")
    val got = Dedup.cropDups(spark, images, lattice = 2, minContrast = 0.0)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got.keySet == Set(("a0", "c0"), ("a1", "c1"), ("a2", "r2")),
      s"expected exactly the planted pairs, got ${got.keySet}")
    assert(got(("a0", "c0")) == 1L,
      "a quadrant crop shares exactly its own full frame")
    // a half crop's own lattice halves re-align with the source's quadrants:
    // full frame + 2 quadrants = 3 shared regions (pure lattice geometry)
    assert(got(("a1", "c1")) == 3L,
      "a half crop shares its full frame plus two re-aligned quadrants")
    // identical pixels: all 9 lattice-2 regions match at minContrast = 0
    assert(got(("a2", "r2")) == 9L,
      "a pixel-identical re-encode must match on every region")
  }

  test("cropDups recall holds for every lattice-2 window shape") {
    val bytes = pngOf(7)
    val windows = for {
      lx0 <- 0 until 2; lx1 <- (lx0 + 1) to 2
      ly0 <- 0 until 2; ly1 <- (ly0 + 1) to 2
      if !(lx0 == 0 && ly0 == 0 && lx1 == 2 && ly1 == 2) // skip full frame
    } yield (lx0, ly0, lx1, ly1)
    val rows = ("src", bytes, "png") +: windows.zipWithIndex.map {
      case ((x0, y0, x1, y1), i) =>
        (f"w$i%02d", ImageGen.cropOf(bytes, 2, x0, y0, x1, y1), "png")
    }
    val images = rows.toDF("image_id", "bytes", "fmt")
    val pairs = Dedup.cropDups(spark, images, lattice = 2, minContrast = 0.0)
      .as[(String, String, Long)].collect()
    val withSrc = pairs.collect { case (a, b, _) if a == "src" || b == "src" =>
      if (a == "src") b else a
    }.toSet
    assert(windows.indices.map(i => f"w$i%02d").toSet.subsetOf(withSrc),
      s"every planted window must pair with src; got $withSrc")
  }

  test("contentBounds: uniform bars strip to the exact content; a borderless " +
    "image is untouched; trim is content-deterministic under nesting") {
    val src = ImageCodec.decode(pngOf(11))
    assert(ImageCodec.contentBounds(src) == ((0, 0, src.getWidth, src.getHeight)),
      "gradient edges are non-uniform: nothing to trim")
    val bordered = ImageCodec.decode(ImageGen.withBorder(pngOf(11), 7, 0x000000))
    assert(ImageCodec.contentBounds(bordered) ==
      ((7, 7, src.getWidth, src.getHeight)))
    // nested frames: white inside black still trims to the same content
    val nested = ImageCodec.decode(
      ImageGen.withBorder(ImageGen.withBorder(pngOf(11), 3, 0xFFFFFF), 4, 0x000000))
    assert(ImageCodec.contentBounds(nested) ==
      ((7, 7, src.getWidth, src.getHeight)))
  }

  test("borderDups: planted bars of any width/color pair with their source; " +
    "unrelated images never pair") {
    val images = Seq(
      ("a0", pngOf(20), "png"),
      ("a1", pngOf(21), "png"),
      ("a2", pngOf(22), "png"), // no variant planted
      ("p0", ImageGen.withBorder(pngOf(20), 2, 0x000000), "png"),
      ("p1", ImageGen.withBorder(pngOf(21), 13, 0xFFFFFF), "png"))
      .toDF("image_id", "bytes", "fmt")
    val got = Dedup.borderDups(spark, images, minContrast = 0.0)
      .as[(String, String)].collect().toSet
    assert(got == Set(("a0", "p0"), ("a1", "p1")),
      s"expected exactly the planted border pairs, got $got")
  }

  /** Overlay strictly inside tile (tx, ty) of a grid-4 lattice (2 px inset
    * from every tile edge — renderBase sizes are multiples of 16, so tile
    * bounds are exact quarters). */
  private def overlayInTile(bytes: Array[Byte], tx: Int, ty: Int,
      rgb: Int): Array[Byte] = {
    val s = ImageCodec.decode(bytes).getWidth // renderBase images are square
    val t = s / 4
    ImageGen.withOverlay(bytes, tx * t + 2, ty * t + 2, t - 4, t - 4, rgb)
  }

  test("overlayDups: one-tile stamps pair at 15/16 tiles, a re-encode at " +
    "16/16, unrelated images and other-dims frames never pair") {
    val reenc = ImageCodec.encodePng(ImageCodec.decode(pngOf(32)))
    val images = Seq(
      ("a0", pngOf(30), "png"), ("a1", pngOf(31), "png"),
      ("a2", pngOf(32), "png"), ("a3", pngOf(33), "png"), // a3: no variant
      ("o0", overlayInTile(pngOf(30), 1, 2, 0xFF0000), "png"),
      ("o1", overlayInTile(pngOf(31), 0, 0, 0x000000), "png"),
      ("r2", reenc, "png"),
      // same pixels, different dims: a lattice crop must NOT pair here
      ("c0", ImageGen.cropOf(pngOf(30), 2, 0, 0, 1, 1), "png"))
      .toDF("image_id", "bytes", "fmt")
    val got = Dedup.overlayDups(spark, images, grid = 4, minTiles = 12,
        minContrast = 0.0)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got.keySet == Set(("a0", "o0"), ("a1", "o1"), ("a2", "r2")),
      s"expected exactly the planted overlay pairs, got ${got.keySet}")
    assert(got(("a0", "o0")) == 15L && got(("a1", "o1")) == 15L,
      "a one-tile stamp must leave the other 15 tiles matching")
    assert(got(("a2", "r2")) == 16L,
      "a pixel-identical re-encode must match on every tile")
  }

  test("overlayDups: a stamp spanning too many tiles falls below minTiles") {
    val src = pngOf(40)
    val s = ImageCodec.decode(src).getWidth
    // full-width band across two tile rows: touches 8 of 16 tiles
    val banded = ImageGen.withOverlay(src, 0, s / 4, s, s / 2, 0x00FF00)
    val images = Seq(("a", src, "png"), ("v", banded, "png"))
      .toDF("image_id", "bytes", "fmt")
    val strict = Dedup.overlayDups(spark, images, grid = 4, minTiles = 12,
      minContrast = 0.0).count()
    assert(strict == 0, "8 shared tiles must not clear minTiles = 12")
    val loose = Dedup.overlayDups(spark, images, grid = 4, minTiles = 8,
        minContrast = 0.0)
      .as[(String, String, Long)].collect()
    assert(loose.toSeq == Seq(("a", "v", 8L)),
      s"at minTiles = 8 the band pair emits with exactly 8 tiles: $loose")
  }

  test("scaleKey invariant: integer-factor NN rescales key bit-identically") {
    val png = pngOf(7L) // renderBase dims are multiples of 16
    val img = ImageCodec.decode(png)
    val k0 = ImageCodec.scaleKey(img, 0.0)
    assert(k0.nonEmpty)
    for (f <- Seq(2, 3)) {
      val up = ImageCodec.decode(ImageGen.upscaleOf(png, f))
      assert(up.getWidth == img.getWidth * f)
      assert(ImageCodec.scaleKey(up, 0.0) == k0,
        s"factor-$f NN upscale must keep the scale key bit-identical")
    }
    // a different base keys differently (no trivial collisions)
    assert(ImageCodec.scaleKey(ImageCodec.decode(pngOf(8L)), 0.0) != k0)
    // flat frames are dropped by the contrast gate
    val flat = new BufferedImage(64, 64, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 64; x <- 0 until 64) flat.setRGB(x, y, 0x404040)
    assert(ImageCodec.scaleKey(flat).isEmpty)
  }

  test("scaleDups: planted rescale family pairs transitively, unrelated " +
    "bases never pair") {
    val rows = (0L until 6L).flatMap { i =>
      val png = pngOf(i)
      Seq((s"b$i", png, "png"), (s"u$i", ImageGen.upscaleOf(png, 2), "png"),
        (s"v$i", ImageGen.upscaleOf(png, 3), "png"))
    }
    val images = rows.toDF("image_id", "bytes", "fmt")
    val got = Dedup.scaleDups(spark, images, minContrast = 0.0)
      .as[(String, String)].collect().toSet
    // all three family members share one key -> the full triangle per base
    val want = (0L until 6L).flatMap { i =>
      Seq((s"b$i", s"u$i"), (s"b$i", s"v$i"), (s"u$i", s"v$i"))
    }.toSet
    assert(got == want, s"expected exactly the planted triangles: $got")
  }

  test("canonical key: bars, rescales, and their compositions all key " +
    "bit-identically") {
    def keyOf(bytes: Array[Byte]): Option[Long] = {
      val img = ImageCodec.decode(bytes)
      val (x0, y0, cw, ch) = ImageCodec.contentBounds(img)
      ImageCodec.scaleKeyRegion(img, x0, y0, cw, ch, 0.0)
    }
    val png = pngOf(11L)
    val k0 = keyOf(png)
    assert(k0.nonEmpty)
    assert(keyOf(ImageGen.withBorder(png, 5, 0xFF0000)) == k0, "bars")
    assert(keyOf(ImageGen.upscaleOf(png, 2)) == k0, "rescale")
    assert(keyOf(ImageGen.upscaleOf(ImageGen.withBorder(png, 5, 0xFF0000),
      2)) == k0, "rescaled letterbox — the compound transform")
    assert(keyOf(ImageGen.withBorder(ImageGen.upscaleOf(png, 3), 7,
      0x00FF00)) == k0, "letterboxed rescale — the other order")
    assert(keyOf(pngOf(12L)) != k0, "different base keys differently")
  }

  test("geometricDups: the unified family pairs the compound transform " +
    "neither component family catches") {
    val rows = (0L until 5L).flatMap { i =>
      val png = pngOf(20L + i)
      Seq((s"b$i", png, "png"),
        (s"l$i", ImageGen.withBorder(png, 4, 0x2040FF), "png"),
        (s"u$i", ImageGen.upscaleOf(png, 2), "png"),
        (s"c$i", ImageGen.upscaleOf(ImageGen.withBorder(png, 4, 0x2040FF),
          2), "png"))
    }
    val images = rows.toDF("image_id", "bytes", "fmt")
    val got = Dedup.geometricDups(spark, images, minContrast = 0.0)
      .as[(String, String)].collect().toSet
    val want = (0L until 5L).flatMap { i =>
      val m = Seq(s"b$i", s"c$i", s"l$i", s"u$i")
      for (x <- m; y <- m if x < y) yield (x, y)
    }.toSet
    assert(got == want, s"expected the full planted 4-cliques: $got")
    // the compound member is invisible to BOTH component families
    val bScale = Dedup.scaleDups(spark, images, minContrast = 0.0)
      .as[(String, String)].collect().toSet
    assert(!bScale.exists(p => p._1 == "b0" && p._2 == "c0"),
      "scaleDups must not see through the bars")
    val bBorder = Dedup.borderDups(spark, images, minContrast = 0.0)
      .as[(String, String)].collect().toSet
    assert(!bBorder.exists(p => p._1 == "b0" && p._2 == "c0"),
      "borderDups must not see through the rescale")
  }
}
