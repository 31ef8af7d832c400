package graft.operators

import graft.synth.ImageCodec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: images/audio/video ride as opaque `binary`
 * columns with typed metadata; decode / feature-extract runs per partition
 * over the binary payloads (the Scala analogue of a batched mapInPandas —
 * one decoder instantiation per partition, not per row).
 *
 * PNG/JPEG decode is REAL (in-JDK javax.imageio, same codec the synthesizer
 * and phash validators use). Other formats (audio/video/webp...) take the
 * clearly-marked deterministic STUB path: the container has no media codecs,
 * so the stub derives a fake-but-stable feature vector from the payload bytes
 * — the Spark-side schema, partitioning, and batch shape are real and tested.
 */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("decoded", BooleanType),     // false => stub path
    StructField("dec_w", IntegerType),
    StructField("dec_h", IntegerType),
    StructField("phash64", LongType),
    StructField("mean_luma", DoubleType)))

  /**
   * @param images (image_id STRING, bytes BINARY, fmt STRING)
   * @return per-row decode features (schema above); rows whose payload fails
   *         to decode fall back to the stub path instead of failing the task.
   */
  def decodeFeatures(spark: SparkSession, images: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    val input = images.select(col("image_id"), col("bytes"), col("fmt"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = r.getString(2)
        val real = fmt == "png" || fmt == "jpg" || fmt == "jpeg"
        val decodedImg = if (real) {
          try Option(ImageCodec.decode(bytes)) catch { case _: Throwable => None }
        } else None
        decodedImg match {
          case Some(img) =>
            var sum = 0.0
            val step = math.max(1, img.getWidth * img.getHeight / 4096) // sampled luma
            var i = 0
            var n = 0
            while (i < img.getWidth * img.getHeight) {
              val p = img.getRGB(i % img.getWidth, i / img.getWidth)
              sum += 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
              n += 1
              i += step
            }
            Row(id, true, img.getWidth, img.getHeight,
              ImageCodec.averageHash(img), if (n == 0) 0.0 else sum / n)
          case None =>
            // STUB: deterministic fake features from payload bytes — replace
            // with a real codec when the target cluster ships one.
            val h = graft.functions.HashKernels.hashBytes(bytes, 7L)
            Row(id, false, -1, -1, h, ((h >>> 8) & 0xFF).toDouble)
        }
      }
    }(enc).toDF()
  }

  /** PSNR-based per-row fidelity check of a lossy payload vs reference pixels
    * (BASELINE.json input_hint: PSNR >= 40 dB for lossy fmt). Driver-side
    * helper for validation sampling, not a bulk operator. */
  def psnrAgainst(reference: java.awt.image.BufferedImage, bytes: Array[Byte]): Double = {
    val img = ImageCodec.decode(bytes)
    val ref =
      if (img.getWidth == reference.getWidth && img.getHeight == reference.getHeight) reference
      else ImageCodec.resize(reference, img.getWidth, img.getHeight)
    ImageCodec.psnr(ImageCodec.toRgb(ref), ImageCodec.toRgb(img))
  }
}
