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
 *                      al. SIGMOD'03); with window w = lcsMin - anchorK + 1
 *                      any pair sharing an exact >= lcsMin-char run is a
 *                      guaranteed candidate. Enforced anchorK < lcsMin
 *                      whenever the LCS detector is on — a config where the
 *                      detector fires but the anchor family is inert would
 *                      silently demote the advertised recall guarantee to
 *                      band/chunk-collision-gated
 * @param lcsCap        LCS verify reads at most this many leading chars of
 *                      each side (the DP is O(lcsCap^2) per pair); runs that
 *                      only occur past the cap are not matched — raise it
 *                      for long-document corpora
 * @param forgetDays    candidate retention window in days (reference
 *                      `forget_days`, ea/sim/main/data/buckets/issues_selector.py:17-48);
 *                      None = unlimited
 * @param dupAttach     if false, events whose content hash was already seen are
 *                      not admitted (reference `with_dup_attach`,
 *                      ea/sim/main/data/buckets/event_state_model.py:94-101)
 * @param maxBucketSize LSH band buckets larger than this leave the all-pairs
 *                      self-join (skew guard, SURVEY.md section 4)
 * @param saltOversized what oversized buckets degrade to: false (default) =
 *                      sorted-neighborhood pairing (bounded work; preserves
 *                      group connectivity for CC but not pair-level recall —
 *                      right when oversize means degenerate boilerplate
 *                      keys); true = triangular band-key salting
 *                      ([[graft.operators.CandidateGen.saltedAllPairs]]) —
 *                      EXACT pair semantics at O(m^2) output, spread so no
 *                      task holds a whole bucket
 * @param mirrorDups    derive the image-side signature from the
 *                      orbit-canonical phash
 *                      ([[graft.functions.HashKernels.phashCanonical]]):
 *                      horizontally/vertically mirrored and 180-rotated
 *                      re-uploads then share buckets AND pass Hamming
 *                      verification — mirror-invariant dedup with zero extra
 *                      decode work (the flip is a bit permutation of the
 *                      8x8 average-hash). Off by default: a mirrored image
 *                      is only a duplicate when the PRODUCT says so.
 * @param rotationDups  widen the canonical-phash orbit from the mirror
 *                      four-group to the full dihedral group D4
 *                      ([[graft.functions.HashKernels.phashCanonicalD4]]):
 *                      90/270-degree rotated re-uploads (portrait/landscape
 *                      re-posts, stripped EXIF orientation) also share the
 *                      canonical. Requires mirrorDups — D4 contains the
 *                      mirror group, so rotation invariance without mirror
 *                      invariance is not a coherent orbit.
 * @param oph           compute MinHash signatures with the one-permutation
 *                      kernel (OPH + optimal densification,
 *                      [[graft.functions.HashKernels.ophArray]]): one hash
 *                      per shingle instead of numHashes multiply-adds —
 *                      same per-bin Jaccard collision law, so banding,
 *                      verification, and recall semantics are unchanged;
 *                      the signatures themselves differ from the classic
 *                      kernel's (a corpus must be featurized under ONE
 *                      scheme — featureConfigId records it). Off by
 *                      default: classic MinHash signatures are ELEMENTWISE
 *                      MIN-mergeable ([[graft.operators.Dedup
 *                      .groupSignatures]]) while densified OPH bins are
 *                      not; flip it on when per-row featurization cost
 *                      dominates (long documents at web scale)
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
    lcsCap: Int = 2000,
    forgetDays: Option[Int] = None,
    dupAttach: Boolean = true,
    maxBucketSize: Int = 4096,
    saltOversized: Boolean = false,
    mirrorDups: Boolean = false,
    rotationDups: Boolean = false,
    oph: Boolean = false,
    seed: Long = 42L) {
  require(bands * rowsPerBand == numHashes,
    s"bands($bands) * rowsPerBand($rowsPerBand) must equal numHashes($numHashes)")
  require(simhashBits > 0 && simhashBits <= 64, "simhashBits must be in (0, 64]")
  require(lcsMin == 0 || lcsMin > anchorK,
    s"lcsMin($lcsMin) must exceed anchorK($anchorK) when the LCS detector is on" +
      " — lower anchorK so the winnowed-anchor candidate family stays active" +
      " (it is what guarantees long-match recall)")
  require(lcsCap >= math.max(lcsMin, 1),
    s"lcsCap($lcsCap) below lcsMin($lcsMin) can never verify a long match")
  require(!rotationDups || mirrorDups,
    "rotationDups widens the mirrorDups orbit to D4 — enable mirrorDups too" +
      " (rotation invariance without mirror invariance is not a subgroup orbit)")

  /**
   * Identity of the FEATURE space this config produces — exactly the fields
   * [[graft.pipeline.DedupPipeline.features]] bakes into persisted feature
   * rows (shingles/band keys/simhash). Two feature tables are join-compatible
   * iff their ids match; verify/bucket-time knobs (hammingMax, jaccardMin,
   * lcs*, maxBucketSize, ...) deliberately excluded — they may change
   * between runs without invalidating persisted features.
   */
  def featureConfigId: String =
    s"shingleK=$shingleK|numHashes=$numHashes|bands=$bands" +
      s"|rowsPerBand=$rowsPerBand|seed=$seed|mirrorDups=$mirrorDups" +
      s"|rotationDups=$rotationDups|oph=$oph"

  /**
   * Identity of the candidate BUCKET space on top of [[featureConfigId]] —
   * the extra knobs [[graft.pipeline.DedupPipeline.corpusStateRows]] bakes
   * into persisted bucket rows (SimHash chunk scheme, winnowed-anchor
   * family). Persisted `corpus_buckets` are join-compatible with a run iff
   * the ids match; the one remaining layout input, the corpus count the
   * chunk scheme was sized by, is frozen separately in the state meta
   * (`n_corpus`) because it is a property of the data, not the config.
   */
  def bucketConfigId: String =
    s"$featureConfigId|hammingMax=$hammingMax|lcsMin=$lcsMin|anchorK=$anchorK"
}

object DedupConfig {
  /** Config used by the golden-oracle tests and the bench harness. */
  val default: DedupConfig = DedupConfig()
}
