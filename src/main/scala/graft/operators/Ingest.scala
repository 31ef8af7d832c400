package graft.operators

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.synth.ImageCodec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/**
 * Fused ingest: per-row payload validation (decode + phash recompute + dims,
 * the BASELINE.json input_hint invariant) AND signature feature extraction in
 * ONE pass over the payload table. At 100 TB the payload bytes dominate every
 * scan; reading them once — instead of once for validation and again for the
 * dedup features — halves the job's I/O and decode cost. The output is the
 * compact metadata+features frame (no payload column), repartitioned to a
 * data-sized partition count and persisted, so every downstream dedup stage
 * reads kilobyte-scale cached partitions instead of re-splitting the
 * payload files.
 *
 * Reference analogue: the reference also validates and featurizes in its
 * single ingest path (parse + tolerant field checks + tokenization:
 * parsers/parser_v1.py:38-60 then seq_coder partial_fit) — it never re-reads
 * a report for a second pass.
 */
object Ingest {

  val carrySchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("decode_ok", BooleanType),
    StructField("phash_match", BooleanType),
    StructField("dims_match", BooleanType),
    StructField("valid", BooleanType),
    StructField("caption", StringType),
    StructField("phash", LongType)))

  /** Decode-validate every row, carrying the metadata columns the dedup
    * features need. Rows with an empty payload (light synthetic inputs) are
    * counted as skipped: decode_ok=false, other checks vacuously true. */
  def validatedCarry(spark: SparkSession, images: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(carrySchema)
    images
      .select(col("image_id"), col("bytes"), col("w"), col("h"),
        col("caption"), col("phash"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h) = (r.getInt(2), r.getInt(3))
          val caption = r.getString(4)
          val ph = r.getLong(5)
          if (bytes == null || bytes.isEmpty)
            Row(id, false, true, true, false, caption, ph)
          else {
            val img = try Option(ImageCodec.decode(bytes)) catch { case _: Throwable => None }
            img match {
              case Some(i) =>
                val phOk = ImageCodec.averageHash(i) == ph
                val dimOk = i.getWidth == w && i.getHeight == h
                Row(id, true, phOk, dimOk, phOk && dimOk, caption, ph)
              case None => Row(id, false, false, false, false, caption, ph)
            }
          }
        }
      }(enc).toDF()
  }

  /**
   * One payload pass -> persisted compact features frame: validation columns
   * + the DedupPipeline feature columns. Feed to
   * [[DedupPipeline.runFromFeatures]].
   *
   * @param partitions repartition the (small) carried rows before feature
   *                   computation — sized to the FEATURE data, decoupled from
   *                   the payload scan's file splits; 0 keeps scan partitioning
   * @param persistFeatures cache the returned frame (MEMORY_AND_DISK) — the
   *                   same knob as the [[Dedup]] pair family. The frame is
   *                   consumed by several downstream stages, so the default
   *                   is on; the CALLER owns the lifecycle and must
   *                   `unpersist()` when the run completes (as [[graft.Main]]
   *                   does). Pass false to keep recompute semantics — e.g.
   *                   when the features flow into exactly one checkpointed
   *                   stage, or at a scale where caching would only spill.
   */
  def run(spark: SparkSession, images: DataFrame, cfg: DedupConfig,
      partitions: Int = 0, persistFeatures: Boolean = true): DataFrame = {
    val carried = validatedCarry(spark, images)
    val sized = if (partitions > 0) carried.repartition(partitions) else carried
    val feat = DedupPipeline.features(sized, cfg,
      carry = Seq("decode_ok", "phash_match", "dims_match", "valid"))
    if (persistFeatures) feat.persist(StorageLevel.MEMORY_AND_DISK) else feat
  }
}
