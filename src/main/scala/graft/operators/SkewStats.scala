package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew diagnostics for bucket-keyed frames — the measurement half of the
 * band-key skew story (SURVEY.md section 4): before choosing `maxBucketSize`
 * or flipping [[CandidateGen.pairsFromBuckets]] to salted-exact mode on a new
 * corpus, run these over a sample and read the occupancy profile, instead of
 * discovering a straggler task three hours into a 100 TB job.
 *
 * Both are single-aggregation plans (one shuffle on `key`, then a tiny
 * second aggregation / filter), so they run at full corpus scale too. The
 * reference's analogue is implicit — its FAISS index is rebuilt per bucket
 * and never sees cross-bucket skew (ea/sim/main/methods/index/faiss.py) —
 * whereas a shared-nothing shuffle must plan for it.
 */
object SkewStats {

  /**
   * Power-of-two bucket-size histogram of a (`id`, `key`) frame: one row per
   * size class `size_class = floor(log2(bucket_n)) + 1` (the bit length of
   * the bucket size — exact integer arithmetic, no float log edge cases at
   * powers of two) with the number of buckets, total member rows, the class
   * max, and the all-pairs workload the class would emit
   * (sum of n*(n-1)/2 — the number that actually decides whether exact
   * semantics are affordable).
   *
   * n_pairs stays INTEGER-exact at any size: n*(n-1)/2 halves whichever
   * factor is even before the (long) multiply — no double division — and
   * accumulates as decimal(38,0), so neither 2^53 float precision nor ANSI
   * long-sum overflow can shave counts off exactly the giant buckets the
   * profile exists to expose. (The final long cast bounds the column at
   * 2^63 pairs — past any physical corpus.)
   */
  def bucketHistogram(keyed: DataFrame): DataFrame = {
    val n = col("bucket_n")
    val pairs = when(n.bitwiseAND(lit(1L)) === 0L,
      shiftright(n, 1) * (n - 1)).otherwise(n * shiftright(n - 1, 1))
    keyed.groupBy("key").agg(count(lit(1)).as("bucket_n"))
      .groupBy(length(bin(col("bucket_n"))).as("size_class"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum("bucket_n").as("n_rows"),
        max("bucket_n").as("max_bucket"),
        sum(pairs.cast("decimal(38,0)")).cast("long").as("n_pairs"))
      .orderBy("size_class")
  }

  /**
   * Keys whose buckets exceed `cap`, with the salted-grid shape they would
   * get: `groups = ceil(bucket_n / cap)` sub-groups and `cells =
   * groups * (groups + 1) / 2` independent join cells
   * ([[CandidateGen.saltedAllPairs]]'s plan, announced before running it).
   * `groups` uses floor over a double quotient — exact while bucket_n stays
   * below 2^52 (IEEE correctly-rounded division keeps floor truthful until
   * the quotient's ulp exceeds 1/cap), i.e. for any physical bucket.
   */
  def heavyKeys(keyed: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"cap($cap) must be positive")
    keyed.groupBy("key").agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > cap)
      .withColumn("groups",
        (floor((col("bucket_n") - 1) / lit(cap)) + 1).cast("long"))
      .withColumn("cells",
        (col("groups") * (col("groups") + 1) / lit(2)).cast("long"))
      .orderBy(desc("bucket_n"), asc("key"))
  }

  /**
   * EXACT distributed quantiles (PERCENTILE_DISC semantics: for each q, the
   * smallest value whose cumulative row count reaches q * n) — the corpus
   * profiling step that sizes every downstream knob (length filters, token
   * budgets, `maxBucketSize`) without `approxQuantile`'s rank error and
   * without a single-partition sort: values collapse to one row per
   * DISTINCT value (the widest shuffle, bounded by the value domain, not
   * the corpus), cumulative counts ride [[OrderedScan.cumSums]]'
   * value-bucketed prefix sums, and the probe list is a literal explode.
   * The one-row total joins in by broadcast — nothing data-sized crosses a
   * single executor. Counts are integer-exact to 2^53 (the cumSums
   * contract); `q * n` is fixed-order IEEE arithmetic, so an independent
   * engine (the DuckDB `quantile_disc` oracle) reproduces the thresholds
   * bit-identically.
   *
   * @param qs quantile probes in [0, 1]; q = 0 returns the minimum,
   *           q = 1 the maximum
   * @return (q, value) one row per probe, value as double
   */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must name at least one quantile probe")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probes must lie in [0,1], got $qs")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).cast("double").as("c"))
    val cum = OrderedScan.cumSums(counts, "v", Seq("c" -> "cum"))
    val total = counts.agg(sum(col("c")).as("n"))
    cum.crossJoin(broadcast(total)) // 1-row broadcast: never a data-sized product
      .select(col("v"), col("cum"),
        explode(array(qs.distinct.sorted.map(lit(_)): _*)).as("q"), col("n"))
      .where(col("cum") >= col("q") * col("n"))
      .groupBy("q").agg(min(col("v")).as("value"))
      .orderBy("q")
  }

  /**
   * Per-group EXACT quantiles — [[exactQuantiles]]' PERCENTILE_DISC
   * semantics stratified by a group column: the per-lang / per-source
   * p50/p95 profile that sizes stratum-specific filters and token budgets
   * (one global quantile over a mixed corpus hides that one stratum's p95
   * is another's p50).
   *
   * Scale: values collapse to one row per (group, DISTINCT value) first;
   * the cumulative count window partitions BY GROUP (never unpartitioned —
   * each stratum's distinct-value list is the bounded unit of work), and
   * the per-group totals join back on the group key. Probes explode as
   * literals.
   *
   * @return (group, q, value) one row per group x probe, ordered
   */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must name at least one quantile probe")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probes must lie in [0,1], got $qs")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).cast("double").as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__g")
      .orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val totals = counts.groupBy("__g").agg(sum(col("c")).as("n"))
    cum.join(totals, "__g")
      .select(col("__g"), col("v"), col("cum"),
        explode(array(qs.distinct.sorted.map(lit(_)): _*)).as("q"), col("n"))
      .where(col("cum") >= col("q") * col("n"))
      .groupBy(col("__g").as(groupCol), col("q"))
      .agg(min(col("v")).as("value"))
      .orderBy(groupCol, "q")
  }

  /**
   * Dense equi-width histogram over an explicit [lo, hi) range — the
   * distribution companion to `Validate.tableProfile`'s scalar stats:
   * every bin appears (zero-filled), so two snapshots' histograms line up
   * row-for-row for drift eyeballing; under/overflow mass is reported in
   * two extra rows (bin −1 and nBins) instead of silently clipped or
   * silently dropped — the no-silent-caps posture.
   *
   * Scale: one aggregation on the bin index (≤ nBins+2 groups) plus a
   * broadcast join against the generated bin table. Explicit bounds (not
   * data-derived min/max) keep the layout stable across snapshots and the
   * whole computation single-pass.
   *
   * @return nBins + 2 rows: (bin, lo_edge, hi_edge, n) — bin −1/nBins are
   *         the underflow/overflow rows with a NULL edge on the open side
   */
  def numericHistogram(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins($nBins) must be >= 1")
    require(lo < hi, s"lo($lo) must be < hi($hi)")
    val w = (hi - lo) / nBins
    val v = col(valueCol).cast("double")
    // least(.., nBins-1) guards the FP edge where (v-lo)/w for the largest
    // double below hi rounds UP to exactly nBins — an in-range value must
    // never land in the overflow row
    val bin = when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBins.toLong))
      .otherwise(least(floor((v - lo) / w).cast("long"),
        lit(nBins.toLong - 1L)))
    val counts = df.where(v.isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val bins = spark.range(-1L, nBins + 1L).toDF("bin")
      .select(col("bin"),
        when(col("bin") === -1L, lit(null).cast("double"))
          .otherwise(lit(lo) + col("bin") * w).as("lo_edge"),
        when(col("bin") === nBins.toLong, lit(null).cast("double"))
          .otherwise(lit(lo) + (col("bin") + 1L) * w).as("hi_edge"))
    bins.join(counts, Seq("bin"), "left")
      .select(col("bin"), round(col("lo_edge"), 6).as("lo_edge"),
        round(col("hi_edge"), 6).as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("bin")
  }
}
