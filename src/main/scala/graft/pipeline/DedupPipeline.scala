package graft.pipeline

import graft.config.DedupConfig
import graft.functions._
import graft.io.CheckpointStore
import graft.operators.{CandidateGen, ConnectedComponents, VerifyStage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * End-to-end near-duplicate pipeline (north rule): signatures -> LSH candidate
 * generation -> exact verify -> connected components -> cluster assignments.
 *
 * Reference semantics preserved (SURVEY.md section 7): content identity ->
 * candidate generation -> pairwise similarity -> per-cluster aggregation,
 * with every neural scorer replaced by the classical signature trio
 * (MinHash/Jaccard over caption shingles, SimHash/Hamming over phash-derived
 * image tokens, optional LCS for exact long matches).
 *
 * Shuffle budget (all map-side work is one narrow codegen'd projection):
 *   1. band/chunk explode + bucket-count + self-join   (candidate generation)
 *   2. two feature joins on the pair table              (verify)
 *   3. O(log n) rounds of groupBy+join                  (connected components)
 *   4. final label join                                 (assignment)
 */
object DedupPipeline {

  /** Per-row signature computation — narrow, whole-stage-codegen friendly.
    * Input requires columns (image_id, caption, phash). */
  def features(images: DataFrame, cfg: DedupConfig): DataFrame = {
    val toks = tokens(col("caption"))
    images.select(
      col("image_id").as("id"),
      normalize_text(col("caption")).as("norm_text"),
      shingle_hashes(toks, cfg.shingleK, cfg.seed).as("shingles"),
      col("phash"))
      .withColumn("sig",
        minhash_signature(col("shingles"), cfg.numHashes, cfg.seed))
      .withColumn("band_keys",
        lsh_band_keys(col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
      .withColumn("simhash", simhash64(phash_tokens(col("phash")), cfg.seed))
      .withColumn("content_hash", xxhash64(col("norm_text")))
  }

  /** Candidate pairs from both LSH families (caption MinHash bands + simhash
    * Hamming chunks). Empty-caption rows are excluded from the caption family
    * (they only collide with other empties and carry no caption evidence). */
  def candidates(feat: DataFrame, cfg: DedupConfig): DataFrame = {
    val bandBuckets = CandidateGen.explodeBands(
      feat.where(size(col("shingles")) > 0), "id", "band_keys")
    val chunkBuckets = CandidateGen.simhashChunkBuckets(
      feat, "id", "simhash", cfg.hammingMax + 1)
    CandidateGen.pairsFromBuckets(
      bandBuckets.union(chunkBuckets), cfg.maxBucketSize)
  }

  /** Full run. When `checkpoint` is given, candidate+verify stages are
    * persisted and resumable (reference snapshot/tail-replay semantics). */
  def run(spark: SparkSession, images: DataFrame, cfg: DedupConfig,
      checkpoint: Option[CheckpointStore] = None): DedupResult = {

    val feat = features(images, cfg).persist(StorageLevel.MEMORY_AND_DISK)

    def staged(name: String)(df: => DataFrame): DataFrame =
      checkpoint.map(_.stage(name)(df)).getOrElse(df)

    val verified = staged("verified_pairs") {
      VerifyStage.verify(candidates(feat, cfg), feat, cfg)
        .where(col("is_dup"))
    }

    // Long node ids: collision-free dense-ish ids (NOT a 64-bit content hash,
    // which would collide at 10^12 scale), deterministic only within the run —
    // final labels are re-derived from image_ids below, so run-stable.
    val nodes = feat.select(col("id")).distinct()
      .withColumn("nid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edges = verified
      .join(nodes.withColumnRenamed("id", "a").withColumnRenamed("nid", "src"), "a")
      .join(nodes.withColumnRenamed("id", "b").withColumnRenamed("nid", "dst"), "b")
      .select("src", "dst")

    val cc = ConnectedComponents.run(edges)

    val assigned = nodes.join(cc, nodes("nid") === cc("id"), "left")
      .select(nodes("id").as("image_id"),
        coalesce(cc("component"), nodes("nid")).as("comp"))

    // Deterministic cluster label: hash of the lexicographically smallest
    // member id (content-derived, independent of nid assignment order).
    val labels = assigned.groupBy("comp")
      .agg(min("image_id").as("root_image"))
      .select(col("comp"), xxhash64(col("root_image")).as("cluster_id"))

    val assignments = assigned.join(labels, "comp")
      .select("image_id", "cluster_id")

    DedupResult(feat, verified, assignments)
  }
}

/** @param features    per-row signatures (persisted)
  * @param dupPairs    verified duplicate pairs with scores
  * @param assignments final (image_id, cluster_id) */
final case class DedupResult(
    features: DataFrame,
    dupPairs: DataFrame,
    assignments: DataFrame)
