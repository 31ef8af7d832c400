package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for the training-data pipeline: deterministic
 * sampling, stratified sampling, per-key caps, and sequence packing — the
 * selection layer that runs between dedup and training-data export.
 *
 * Every operator here is REPRODUCIBLE BY CONSTRUCTION: membership is a pure
 * function of row content (an md5 prefix compare), never of `rand()`,
 * partitioning, or execution order — so a re-run, a recomputed partition
 * after executor loss, or an independent engine (the DuckDB oracles) selects
 * the exact same rows. That property is what makes a 100 TB corpus sample
 * auditable: the sample can be re-derived from the corpus snapshot alone.
 *
 * Reference analogue: the reference samples eval query subsets and
 * train/test splits by seeded index selection
 * (ea/sim/dev/scripts/data/dataset/nb/main.py:12, random_seed=42); here the
 * seed is a salt string and selection is content-hash-ordered so it needs no
 * global index.
 */
object Curation {

  /** Uniform [0, 1) selection value for a key: the first 8 hex digits of
    * md5(salt || key) compared lexicographically — fixed-width lowercase hex
    * compares identically to its numeric value, and md5 is available
    * bit-identically in every engine (the oracle recomputes membership in
    * SQL). Not a cryptographic boundary — a reproducibility device. */
  private def hashHex(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 8)

  /** 8-hex-digit threshold for a sampling rate: keys whose [[hashHex]] sorts
    * strictly below it are kept; floor(rate * 2^32) keys per 2^32. */
  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.floor(rate * 4294967296.0).toLong.min(4294967295L)}%08x"
  }

  /**
   * Deterministic uniform sample: keeps each row iff
   * md5(salt || key) < rate — a NARROW zero-shuffle filter (the scan's
   * predicate at 100 TB), reproducible across runs, engines, and partial
   * recomputes. Sampling is BY KEY: duplicate keys are kept or dropped
   * together (sample-then-dedup stays coherent).
   */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    if (rate >= 1.0) df
    else df.where(hashHex(col(keyCol), salt) < lit(thresholdHex(rate)))

  /**
   * Deterministic STRATIFIED sample: per-stratum rates (the corpus-mixture
   * knob — e.g. keep 80% of high-quality strata, 5% of boilerplate ones),
   * still a narrow zero-shuffle filter: the rates map becomes a literal
   * when-chain on the stratum column, so no join and no rand(). Strata
   * absent from the map use `defaultRate`; NULL strata use `defaultRate`.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), lit(thresholdHex(rate)))
          .otherwise(acc)
    }
    df.where(hashHex(col(keyCol), salt) < thr)
  }

  /**
   * Per-key cap: keep at most `n` rows per key, best-first — the
   * RefinedWeb/CCNet per-domain cap (no host may dominate the corpus).
   * One shuffle on the key; the window partition is per-key so it never
   * degenerates as long as no single key exceeds a partition (cap the
   * pathological key upstream with [[SkewStats.heavyKeys]] if one does —
   * at that point it is a dedup problem, not a sampling one).
   *
   * @param orderBy priority (best first), e.g. quality desc then id asc;
   *                MUST be a total order per key for deterministic output —
   *                append a unique tiebreaker
   */
  def capPerKey(df: DataFrame, keyCol: String, n: Int,
      orderBy: Seq[Column]): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(col(keyCol)).orderBy(orderBy: _*)))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /**
   * Sequence packing for LLM pretraining export: documents are concatenated
   * in `orderCol` order into one token stream and split into fixed
   * `budget`-token context windows; each doc gets its stream start offset
   * and the first/last window (bin) it lands in. The GPT-style
   * concat-then-chunk layout — a doc may straddle a window boundary
   * (bin_first < bin_last).
   *
   * Fully distributed: the global running total is
   * [[OrderedScan.cumSums]] (value-bucketed prefix sums — no
   * single-partition window), everything else is a narrow projection.
   *
   * @param orderCol numeric UNIQUE order key (the cumSums tie contract)
   * @param tokenCol per-doc token count (>= 0; empty docs occupy no tokens
   *                 and land wholly in the window their offset points at)
   * @return input columns + (start_offset, bin_first, bin_last) as longs
   */
  def packAssignments(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val cum = OrderedScan.cumSums(df, orderCol, Seq(tokenCol -> "__cum"))
    cum
      .withColumn("start_offset", (col("__cum") - col(tokenCol)).cast("long"))
      .withColumn("bin_first",
        floor(col("start_offset") / lit(budget)).cast("long"))
      .withColumn("bin_last",
        when(col(tokenCol) > 0,
          floor((col("__cum") - 1) / lit(budget)).cast("long"))
          .otherwise(col("bin_first")))
      .drop("__cum")
  }
}
