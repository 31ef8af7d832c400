package graft.config

/**
 * Single configuration object shared by the production pipeline and the exact
 * brute-force oracle, so that the recall>=0.99 gate measures LSH loss only
 * (SURVEY.md section 7, hard part d).
 *
 * Reference analogue: `SeqCoderConfig` (reference: ea/sim/main/configs.py:6-20)
 * and the `ARTIFACTS_DIR/config.json` merge pattern
 * (reference: ea/sim/dev/scripts/training/evaluating/eval_fast.py:31-38).
 *
 * @param shingleK      caption shingle width in tokens (reference n-gram set,
 *                      ea/sim/main/preprocess/seq_coder.py:69-81)
 * @param numHashes     MinHash signature length = bands * rowsPerBand
 * @param bands         LSH band count
 * @param rowsPerBand   minhashes per band
 * @param simhashBits   SimHash width (64 max, we use 64-bit longs)
 * @param hammingMax    max Hamming distance on SimHash for a candidate/dup
 * @param jaccardMin    exact-Jaccard verify threshold on shingle sets
 * @param lcsMin        min longest-common-substring length for the exact
 *                      long-match pass (0 disables)
 * @param anchorK       char-gram width for the winnowed-anchor candidate
 *                      family that feeds the long-match pass (Schleimer et
 *                      al. SIGMOD'03); active when lcsMin > anchorK, with
 *                      window w = lcsMin - anchorK + 1 so any pair sharing
 *                      an exact >= lcsMin-char run is a guaranteed candidate
 * @param forgetDays    candidate retention window in days (reference
 *                      `forget_days`, ea/sim/main/data/buckets/issues_selector.py:17-48);
 *                      None = unlimited
 * @param dupAttach     if false, events whose content hash was already seen are
 *                      not admitted (reference `with_dup_attach`,
 *                      ea/sim/main/data/buckets/event_state_model.py:94-101)
 * @param maxBucketSize LSH band buckets larger than this fall back to
 *                      sorted-neighborhood pairing (skew guard, SURVEY.md section 4)
 * @param seed          global RNG / hash seed (reference random_seed=42,
 *                      ea/sim/dev/scripts/data/dataset/nb/main.py:12)
 */
final case class DedupConfig(
    shingleK: Int = 3,
    numHashes: Int = 128,
    bands: Int = 64,
    rowsPerBand: Int = 2,
    simhashBits: Int = 64,
    hammingMax: Int = 3,
    jaccardMin: Double = 0.5,
    lcsMin: Int = 0,
    anchorK: Int = 16,
    forgetDays: Option[Int] = None,
    dupAttach: Boolean = true,
    maxBucketSize: Int = 4096,
    seed: Long = 42L) {
  require(bands * rowsPerBand == numHashes,
    s"bands($bands) * rowsPerBand($rowsPerBand) must equal numHashes($numHashes)")
  require(simhashBits > 0 && simhashBits <= 64, "simhashBits must be in (0, 64]")
}

object DedupConfig {
  /** Config used by the golden-oracle tests and the bench harness. */
  val default: DedupConfig = DedupConfig()
}
