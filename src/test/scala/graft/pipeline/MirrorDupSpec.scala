package graft.pipeline

import graft.SparkSpec
import graft.config.DedupConfig
import graft.model.ImageRow
import graft.synth.{ImageCodec, ImageGen}
import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._

class MirrorDupSpec extends SparkSpec {
  import spark.implicits._

  test("mirrorDups: flipped re-upload clusters with its original; off by default") {
    val images = ImageGen.generate(spark, bases = 10, seed = 42L).toDF()
    // flip a real PNG payload's pixels, re-encode losslessly, re-upload under
    // a new id. The caption is a 2-token string, so the TEXT families cannot
    // pair it — co-membership can only come through the image signature.
    val row = images.where(col("fmt") === "png").orderBy("image_id").head()
    val origId = row.getAs[String]("image_id")
    val img = ImageCodec.decode(row.getAs[Array[Byte]]("bytes"))
    val flipped = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      flipped.setRGB(img.getWidth - 1 - x, y, img.getRGB(x, y))
    val fBytes = ImageCodec.encodePng(flipped)
    val mirror = ImageRow(s"mirror_$origId", fBytes, img.getWidth,
      img.getHeight, "png", "mirror reupload", ImageCodec.averageHash(flipped))
    val frame = images.unionByName(Seq(mirror).toDF())

    def clusterOf(cfg: DedupConfig): (Long, Long) = {
      val m = DedupPipeline.run(spark, frame, cfg).assignments
        .as[(String, Long)].collect().toMap
      (m(origId), m(mirror.image_id))
    }
    val (o1, m1) = clusterOf(DedupConfig.default.copy(mirrorDups = true))
    assert(o1 == m1, "mirrorDups=true must cluster the flipped re-upload " +
      "with its original through the canonical-phash signature")
    val (o0, m0) = clusterOf(DedupConfig.default)
    assert(o0 != m0, "with mirrorDups off a flipped image is NOT a dup")
  }

  test("mirrorDups in the incremental path: flipped re-upload matches the corpus") {
    // the bipartite daily-ingest evidence join must catch a mirrored
    // re-upload of a corpus image the same way the batch DAG does
    val cfg = DedupConfig.default.copy(mirrorDups = true)
    val corpus = ImageGen.generate(spark, bases = 8, seed = 42L).toDF()
    val row = corpus.where(col("fmt") === "png").orderBy("image_id").head()
    val origId = row.getAs[String]("image_id")
    val img = ImageCodec.decode(row.getAs[Array[Byte]]("bytes"))
    val flipped = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      flipped.setRGB(img.getWidth - 1 - x, y, img.getRGB(x, y))
    val batch = Seq(ImageRow(s"m_$origId", ImageCodec.encodePng(flipped),
      img.getWidth, img.getHeight, "png", "mirror reupload",
      ImageCodec.averageHash(flipped))).toDF()

    val corpusFeat = graft.operators.Ingest.run(spark, corpus, cfg)
    val newFeat = graft.operators.Ingest.run(spark, batch, cfg)
    val pairs = DedupPipeline.incrementalPairs(spark, newFeat, corpusFeat, cfg)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(pairs.contains((s"m_$origId", origId)),
      s"mirrored batch row must match its corpus original, got $pairs")
    corpusFeat.unpersist(); newFeat.unpersist()
  }

  test("rotationDups: 90-degree-rotated re-upload clusters with its original;" +
      " mirror-only orbit does not catch it") {
    val images = ImageGen.generate(spark, bases = 10, seed = 42L).toDF()
    val row = images.where(col("fmt") === "png").orderBy("image_id").head()
    val origId = row.getAs[String]("image_id")
    val img = ImageCodec.decode(row.getAs[Array[Byte]]("bytes"))
    // rotate the real pixels 90 degrees clockwise (dims swap), re-encode
    // losslessly, re-upload under a new id with a text-invisible caption
    val rot = new BufferedImage(img.getHeight, img.getWidth,
      BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      rot.setRGB(img.getHeight - 1 - y, x, img.getRGB(x, y))
    val rRow = ImageRow(s"rot_$origId", ImageCodec.encodePng(rot),
      rot.getWidth, rot.getHeight, "png", "rot reupload",
      ImageCodec.averageHash(rot))
    val frame = images.unionByName(Seq(rRow).toDF())

    def clusterOf(cfg: DedupConfig): (Long, Long) = {
      val m = DedupPipeline.run(spark, frame, cfg).assignments
        .as[(String, Long)].collect().toMap
      (m(origId), m(rRow.image_id))
    }
    val (o1, m1) = clusterOf(
      DedupConfig.default.copy(mirrorDups = true, rotationDups = true))
    assert(o1 == m1, "rotationDups=true must cluster the 90-degree-rotated " +
      "re-upload with its original through the D4 canonical signature")
    val (o0, m0) = clusterOf(DedupConfig.default.copy(mirrorDups = true))
    assert(o0 != m0, "the mirror four-group orbit must NOT already contain " +
      "a 90-degree rotation (it would make the rotationDups test vacuous)")
  }

  test("rotationDups on a rotation-free corpus never regresses the mirror orbit") {
    // same argument as the mirror parity test one level up: the raw leg
    // stays primary and the D4 canonical only ADDS collapse opportunities,
    // so without rotated rows the clustering must match mirrorDups exactly
    val images = ImageGen.generate(spark, bases = 40, seed = 99L).toDF()
    val mirror = DedupPipeline.run(spark, images,
      DedupConfig.default.copy(mirrorDups = true)).assignments
    val d4 = DedupPipeline.run(spark, images,
      DedupConfig.default.copy(mirrorDups = true, rotationDups = true))
      .assignments
    assert(d4.exceptAll(mirror).count() == 0 &&
      mirror.exceptAll(d4).count() == 0,
      "rotationDups=true changed clustering on a corpus without rotations")
  }

  test("rotationDups requires mirrorDups") {
    intercept[IllegalArgumentException] {
      DedupConfig.default.copy(rotationDups = true)
    }
  }

  test("mirrorDups on a mirror-free corpus never regresses ordinary dups") {
    // the raw-signature leg stays primary, so on a corpus with NO mirrored
    // rows the flag must reproduce the flag-off clustering exactly — the
    // canonical argmin's noise sensitivity must never LOSE a pair the raw
    // metric finds (verify takes the min of the two Hammings)
    val images = ImageGen.generate(spark, bases = 40, seed = 99L).toDF()
    val off = DedupPipeline.run(spark, images, DedupConfig.default)
      .assignments
    val on = DedupPipeline.run(spark, images,
      DedupConfig.default.copy(mirrorDups = true)).assignments
    assert(on.exceptAll(off).count() == 0 && off.exceptAll(on).count() == 0,
      "mirrorDups=true changed clustering on a corpus without mirrors")
  }
}
