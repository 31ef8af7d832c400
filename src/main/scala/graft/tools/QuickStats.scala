package graft.tools

import graft.config.DedupConfig
import graft.operators.CandidateGen
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off input/graph statistics: `runMain graft.tools.QuickStats <inputDir>`. */
object QuickStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DedupConfig.default
    val images = spark.read.parquet(args(0))
    val feat = DedupPipeline.features(images, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[qs] rows: ${feat.count()}")
    println("[qs] caption group size histogram:")
    feat.groupBy("content_hash").count().groupBy("count").agg(count(lit(1)).as("n"))
      .orderBy(desc("count")).show(10, false)
    println("[qs] phash group size histogram (top):")
    feat.groupBy("phash").count().groupBy("count").agg(count(lit(1)).as("n"))
      .orderBy(desc("count")).show(10, false)
    val capReps = feat.groupBy("content_hash").agg(min("nid").as("nid2")).count()
    val phReps = feat.groupBy("phash").agg(min("nid").as("nid2")).count()
    println(s"[qs] caption reps: $capReps, phash reps: $phReps")
    // band bucket histogram on caption reps
    val reps = feat.join(feat.groupBy("content_hash").agg(min("nid").as("rep")),
      "content_hash").where(col("nid") === col("rep"))
    val buckets = CandidateGen.explodeBands(
      reps.where(size(col("shingles")) > 0), "nid", "band_keys")
    println("[qs] band bucket size histogram (top):")
    buckets.groupBy("key").count().groupBy("count").agg(count(lit(1)).as("n"))
      .orderBy(desc("count")).show(10, false)
    val chunkBuckets = CandidateGen.simhashChunkBuckets(
      feat.join(feat.groupBy("phash").agg(min("nid").as("rep2")), "phash")
        .where(col("nid") === col("rep2")), "nid", "simhash", cfg.hammingMax)
    println("[qs] simhash chunk bucket size histogram (top):")
    chunkBuckets.groupBy("key").count().groupBy("count").agg(count(lit(1)).as("n"))
      .orderBy(desc("count")).show(10, false)
    spark.stop()
  }
}
