package graft.operators

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column — the Spark
 * replacement for the reference's FAISS flat-IP index
 * (reference: ea/sim/main/methods/index/faiss.py:10-83): a broadcast
 * brute-force exact baseline and an LSH-bucketed scale path.
 */
object Ann {

  /**
   * Exact cosine top-k: the query side is broadcast (queries are the small
   * dimension by design — reference anchors per event), the corpus streams;
   * per-query top-k via window rank. One shuffle (the rank).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine_sim(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /**
   * LSH-bucketed top-k: multi-table sign-random-projection buckets restrict
   * the scored candidates to colliding (query, item) pairs — candidate count
   * scales with bucket occupancy, not corpus size. Recall is tunable via
   * (srpBits down, tables up).
   */
  /**
   * IVF (inverted-file) top-k — the FAISS `IndexIVFFlat` shape
   * (reference: ea/sim/main/methods/index/faiss.py:10-83) as a declarative
   * plan: the corpus is coarsely quantized into `nlist` cells around sampled
   * centroids; each query scores only its `nProbe` most-similar cells, so
   * scored-candidate volume is ~ corpus * nProbe / nlist per query instead of
   * the full corpus.
   *
   * Centroids are a deterministic hash-order sample of the corpus
   * (`TakeOrderedAndProject` — per-partition top-nlist then driver merge, no
   * full sort shuffle; content-derived order, so re-runs pick identical
   * centroids); [[kmeansCentroids]] refines them. The nlist-row centroid
   * table is collected and inlined as literals, so cell assignment and probe
   * selection are NARROW per-row expressions (whole-stage codegen, zero
   * shuffle); the only shuffles are the cell equi-join and the final rank.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 64, nProbe: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    ivfSearch(c, queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      sampleCentroids(c, nlist), k, nProbe)
  }

  /** [[ivfTopK]] against caller-supplied centroids (e.g. [[kmeansCentroids]]
    * output, or a persisted centroid table maintained across corpus
    * snapshots — the index artifact the reference stores via FAISS,
    * ea/sim/main/methods/index/faiss.py:40-51). */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    ivfSearch(corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv")),
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      centroids.select("cent_id", "centv"), k, nProbe)

  /**
   * Distributed Lloyd refinement of the IVF coarse quantizer: E-step is the
   * same broadcast assignment plan the search uses; M-step recomputes each
   * cell's mean via posexplode + groupBy(cell, dim). Two shuffles per
   * iteration; centroids (k * dim floats — tiny by construction) round-trip
   * through the driver each iteration, which truncates lineage and is exactly
   * how you'd persist the quantizer artifact between corpus snapshots.
   * Init and tie-breaks are deterministic; the M-step's floating-point avg()
   * merges partials in shuffle arrival order, so exact bit-reproducibility
   * across DIFFERENT cluster topologies is not guaranteed (last-ulp drift) —
   * persist the trained centroids (ivfTopKWith) when runs must agree.
   */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    var cents = sampleCentroids(c, nlist)
    for (_ <- 0 until iters) {
      val means = assignCellsAuto(c, cents, nlist.toLong)
        .select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .groupBy("cell")
        .agg(collect_list(struct(col("pos"), col("m"))).as("dims"))
        .select(col("cell").as("cent_id"),
          transform(array_sort(col("dims")), s => s("m").cast("float")).as("centv"))
      // driver round-trip: k rows, truncates the per-iteration lineage
      val rows = means.collect()
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), means.schema)
    }
    cents
  }

  /** Deterministic hash-order sample of nlist corpus vectors as initial
    * centroids: TakeOrderedAndProject (per-partition top-nlist + driver
    * merge), no full sort shuffle; content-derived order, so re-runs pick
    * identical centroids. */
  private def sampleCentroids(c: DataFrame, nlist: Int): DataFrame =
    c.orderBy(xxhash64(col("item_id")), col("item_id")).limit(nlist)
      .select(col("item_id").as("cent_id"), col("cv").as("centv"))

  /** Literal-path ceiling: centroid vectors are inlined as literals only up
    * to this many cells. greatest() over nlist struct columns and an
    * nlist-element array_sort are per-row expression TREES that grow with
    * nlist — past a few hundred cells the generated method blows the JVM
    * size limit and whole-stage codegen silently falls back to interpreted
    * evaluation. Above the ceiling, centroids stay a DataFrame: assignment
    * and probing run as a broadcast join + aggregate/window (see
    * [[assignCellsAuto]]), keeping every expression codegen-sized at
    * real-IVF nlist (~2^16 at 10^9 vectors). */
  private[operators] val literalCentroidMax = 256

  /** Per-centroid (sim, cent_id) struct columns against literal centroid
    * vectors (small-nlist path only, see [[literalCentroidMax]]): both cell
    * assignment and probe selection become NARROW per-row expressions inside
    * whole-stage codegen — zero shuffle. */
  private def centSimStructs(vecCol: org.apache.spark.sql.Column,
      cents: Array[(Any, Array[Float])]): Seq[org.apache.spark.sql.Column] =
    cents.toSeq.map { case (id, v) =>
      struct(cosine_sim(vecCol, typedLit(v.toSeq)).as("sim"), lit(id).as("cent_id"))
    }

  /** E-step: nearest-centroid cell per item — narrow map, deterministic
    * tie-break (max sim, then max cent_id — struct ordering). */
  private def assignCells(c: DataFrame, cents: Array[(Any, Array[Float])]): DataFrame = {
    val sims = centSimStructs(col("cv"), cents)
    val best = if (sims.size == 1) sims.head else greatest(sims: _*)
    c.withColumn("cell", best.getField("cent_id"))
  }

  private def collectCents(centroids: DataFrame): Array[(Any, Array[Float])] =
    centroids.collect().map(r => (r.get(0), r.getSeq[Float](1).toArray))

  /** Nearest-centroid cell per corpus row, path gated on centroid count:
    * literal expressions under [[literalCentroidMax]], broadcast join +
    * max_by aggregate above. Both paths break ties identically (max sim,
    * then max cent_id) and return (item_id, cv, cell). The big path's
    * aggregate collapses the nlist-way fan-out map-side (every replicated
    * row of an item sits in the same partition the broadcast join emitted it
    * in), so the single shuffle carries one row per item. */
  private def assignCellsAuto(c: DataFrame, centroids: DataFrame,
      nlist: Long): DataFrame =
    if (nlist <= literalCentroidMax) assignCells(c, collectCents(centroids))
    else assignCellsBig(c, centroids)

  /** The one gate every search/encode/assign path goes through once the
    * centroid table is localized: literal expressions under
    * [[literalCentroidMax]], broadcast join + max_by above. Single
    * definition so the tie-break and the gating can never diverge between
    * [[ivfPqTopK]], [[coarsePairs]] and [[cellAssignments]]. */
  private def assignLocalized(c: DataFrame, localCents: DataFrame,
      rows: Array[org.apache.spark.sql.Row]): DataFrame =
    if (rows.length <= literalCentroidMax)
      assignCells(c, rows.map(r => (r.get(0), r.getSeq[Float](1).toArray)))
    else assignCellsBig(c, localCents)

  /** Large-nlist assignment: broadcast join + map-side max_by collapse. */
  private def assignCellsBig(c: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .select(col("cent_id"), col("centv")))
    c.crossJoin(cents)
      .withColumn("sim", cosine_sim(col("cv"), col("centv")))
      .groupBy("item_id")
      .agg(first(col("cv")).as("cv"),
        max_by(col("cent_id"), struct(col("sim"), col("cent_id"))).as("cell"))
  }

  private def ivfSearch(c: DataFrame, q: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame =
    coarsePairs(c, q, centroids, nProbe)
      .withColumn("cosine", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")

  /** The IVF coarse stage alone: cell-restricted (query, item) candidate
    * pairs — compose with [[pqScorePairs]] (IVFADC) or any custom verifier. */
  def ivfCandidates(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame =
    coarsePairs(corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv")),
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      centroids.select("cent_id", "centv"), nProbe)
      .select("query_id", "item_id")

  /**
   * Full IVFADC (the FAISS `IndexIVFPQ` shape): the coarse quantizer
   * restricts each query's candidates to its `nProbe` cells, the PQ codes
   * score the survivors in the compressed domain, and only (id, id, score)
   * rows reach the final rank — at 10^9+ vectors neither the candidate
   * shuffle nor the scoring ever carries a full float vector. The corpus is
   * touched exactly ONCE per search: cell assignment and PQ encode are fused
   * into a single pass whose (cell, codes) output feeds the candidate join
   * directly — composing [[ivfCandidates]] with [[pqScorePairs]] would scan
   * the corpus twice for identical results. (Sandbox note: a production run
   * persists the encoded (item_id, cell, codes) table once — [[pqEncode]]
   * output — and joins that instead.)
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val books = collectBooks(codebooks)
    requireDim(corpus, vecCol, books, "corpus")
    requireDim(queries, vecCol, books, "query")
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val (localCents, rows) = localizeCentroids(centroids)
    val cents = rows.map(r => (r.get(0), r.getSeq[Float](1).toArray))
    val assigned = assignLocalized(c, localCents, rows)
    // the single corpus pass: assignment + encode, fused
    val codes = assigned.select(col("item_id"), col("cell"),
      codesCol(books, col("cv")).as("codes"))
    val cand = probeCells(q, localCents, cents, nProbe)
      .select("query_id", "cell").join(codes, "cell")
      .where(col("query_id") =!= col("item_id"))
    val qlut = withLut(q, books).select("query_id", "lut")
    cand.join(qlut, "query_id")
      .withColumn("adc", adcScore(books))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "adc", "rank")
  }

  /**
   * Public surface of the coarse quantizer: ONE corpus pass of
   * nearest-centroid assignment, returning (id, cell). The building block
   * for cluster-restricted operators — e.g. SemDeDup-style semantic dedup
   * ([[Dedup.semanticDedupGroups]]) buckets the corpus by cell and only
   * scores within-cell pairs — and for maintaining a persisted assignment
   * table alongside the centroid artifact between corpus snapshots.
   * Same nlist-gated path and (max sim, max cent_id) tie-break as the IVF
   * search itself, so an assignment table built here is exactly the one
   * [[ivfTopKWith]] would recompute.
   */
  def cellAssignments(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val (localCents, rows) = localizeCentroids(centroids.select("cent_id", "centv"))
    assignLocalized(c, localCents, rows)
      .select(col("item_id").as("id"), col("cell"))
  }

  /** (query_id, qv, item_id, cv) pairs sharing a probed cell — the shared
    * candidate stage of [[ivfSearch]]/[[ivfCandidates]]. */
  private def coarsePairs(c: DataFrame, q: DataFrame, centroids: DataFrame,
      nProbe: Int): DataFrame = {
    // The centroid table is nlist rows by construction (the index artifact —
    // k * dim floats, tiny), but its PLAN can be a full corpus sample
    // (sampleCentroids is a TakeOrdered over every vector). Collect it
    // exactly ONCE and re-root both the assignment and probe sides on the
    // collected rows — a count + two separate collects would execute that
    // corpus-sample job three times per search.
    val (localCents, rows) = localizeCentroids(centroids)
    val cents = rows.map(r => (r.get(0), r.getSeq[Float](1).toArray))
    val assigned = assignLocalized(c, localCents, rows)
    probeCells(q, localCents, cents, nProbe).join(assigned, "cell")
      .where(col("query_id") =!= col("item_id"))
  }

  /** Per-query probe cells (query_id, qv, cell): descending (sim, cent_id)
    * order — the SAME tie-break as cell assignment, so an item's assigned
    * cell is always reachable by a query with the same vector (sim-tied
    * centroids would otherwise send assignment to the max cent_id and the
    * probes to the min). Small nlist: narrow expression over inlined literal
    * centroids — no window, no shuffle. Large nlist: the whole centroid
    * table rides as ONE broadcast array<struct> row and each query computes
    * sims + sort + slice map-side over that array — still zero shuffle.
    * (The previous large-nlist shape — broadcast join + per-query window —
    * pushed queries x nlist rows through the window's sort exchange: a
    * 65536x fan-out per query at real-IVF nlist ~2^16. The transform
    * lambda's sims evaluate interpreted rather than codegen'd, but that
    * prices nlist multiplies per QUERY row — the small dimension — against
    * shuffling the full fan-out.) */
  private def probeCells(q: DataFrame, localCents: DataFrame,
      cents: Array[(Any, Array[Float])], nProbe: Int): DataFrame =
    if (cents.length <= literalCentroidMax) {
      q.withColumn("probe", explode(
          slice(reverse(array_sort(array(centSimStructs(col("qv"), cents): _*))),
            1, math.min(nProbe, cents.length))))
        .select(col("query_id"), col("qv"), col("probe.cent_id").as("cell"))
    } else {
      val centsRow = broadcast(localCents.agg(
        collect_list(struct(col("centv"), col("cent_id"))).as("cents")))
      q.crossJoin(centsRow)
        .withColumn("probe", explode(slice(reverse(array_sort(
            transform(col("cents"), c =>
              struct(cosine_sim(col("qv"), c.getField("centv")).as("sim"),
                c.getField("cent_id").as("cent_id"))))),
          1, nProbe)))
        .select(col("query_id"), col("qv"), col("probe.cent_id").as("cell"))
    }

  // --- product quantization (PQ / ADC) ---------------------------------

  /**
   * Train product-quantization codebooks — the FAISS `IndexPQ`/`IndexIVFPQ`
   * compression half (the reference stops at flat IP, faiss.py:10-83; PQ is
   * the standard next step at 10^9-10^12 vectors, where full float vectors
   * no longer fit executor memory or the candidate shuffle): each vector is
   * split into `m` contiguous subvector slices and every slice is quantized
   * against a per-subspace codebook of <= `k` centroids trained by a fused
   * variant of the IVF quantizer's distributed Lloyd. An item is then stored
   * as m small codes instead of dim floats — e.g. a 64-dim vector at m = 4,
   * k = 256 scores from 4 byte-sized codes, a 64x drop in scoring traffic.
   *
   * Training is a FUSED squared-L2 Lloyd: one exploded (sub, slice) frame
   * feeds all m subspaces per iteration (`iters` corpus scans total, not
   * m * iters), and the assignment measure is the same L2-via-dot identity
   * the encoder and the ADC lookup use — argmin ||x - c||^2 == argmax
   * (x.c - ||c||^2/2) — so the trained partition IS the partition items are
   * encoded into (a cosine-trained book would mis-partition slices, whose
   * norms vary even when the full vector is normalized).
   *
   * @return (sub INT, code INT, centv ARRAY<FLOAT>) — at most m*k rows, the
   *         compressed-index artifact (persist it alongside the IVF
   *         centroids). Codes are DENSE 0..k'-1 per subspace (the ADC lookup
   *         layout is positional — [[collectBooks]] enforces density) and
   *         content-deterministic: books are value-sorted, so a retrained
   *         book with identical centroids yields identical codes. Subspaces
   *         whose cells die during Lloyd yield fewer than k codes. Like
   *         [[kmeansCentroids]], the M-step's avg() merges partials in
   *         shuffle arrival order — persist the trained book when runs must
   *         agree to the last ulp.
   */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int = 16, iters: Int = 2): DataFrame = {
    require(m >= 1 && k >= 2 && k <= literalCentroidMax && m.toLong * k <= 1024,
      s"m($m), k($k) must stay codegen-sized: k <= $literalCentroidMax, m*k <= 1024" +
        " (larger books need a broadcast-join encode, same gating as IVF)")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    // deterministic hash-order init sample (one TakeOrdered job, same trick
    // as sampleCentroids); also pins the vector dim
    val initRows = c.orderBy(xxhash64(col("item_id")), col("item_id")).limit(k)
      .select("cv").collect().map(_.getSeq[Float](0).toArray)
    require(initRows.nonEmpty, "pqCodebooks: empty corpus")
    val dim = initRows.head.length
    require(dim % m == 0, s"vector dim($dim) must be divisible by m($m)")
    val subDim = dim / m
    var books: Array[Array[Array[Float]]] = Array.tabulate(m) { sub =>
      initRows.map(_.slice(sub * subDim, (sub + 1) * subDim).toSeq)
        .distinct.map(_.toArray)
    }
    // one exploded (sub, slice) frame drives every iteration — slices carry
    // dim/m floats each, so the shuffle bytes match a single full-vector pass
    val slices = c.select(explode(array((0 until m).map(sub =>
        struct(lit(sub).as("sub"),
          slice(col("cv"), sub * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("e.sub").as("sub"), col("e.sv").as("sv"))
    for (_ <- 0 until iters) {
      val means = slices.withColumn("code", assignCode(col("sub"), col("sv"), books))
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy("sub", "code", "pos").agg(avg("col").as("mv"))
        .groupBy("sub", "code")
        .agg(collect_list(struct(col("pos"), col("mv"))).as("dims"))
        .select(col("sub"), col("code"),
          transform(array_sort(col("dims")), s => s("mv").cast("float")).as("centv"))
        .collect() // <= m*k rows — the artifact, not data
      books = Array.tabulate(m) { sub =>
        means.filter(_.getInt(0) == sub)
          .map(r => (r.getInt(1), r.getSeq[Float](2).toArray))
          .sortBy(_._1).map(_._2)
      }
    }
    import scala.math.Ordering.Implicits._
    val rows = books.zipWithIndex.flatMap { case (cents, sub) =>
      cents.sortBy(_.toIndexedSeq).zipWithIndex
        .map { case (v, code) => (sub, code, v.toSeq) }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1))
      .toDF("sub", "code", "centv")
  }

  private def normHalf(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    s / 2
  }

  /** Per-centroid (score, code) structs for one subspace: score is the
    * L2-via-dot identity x.c - ||c||^2/2 (argmax == nearest centroid), the
    * single measure shared by training, encoding and the ADC lookup table.
    * Ties break to the max code everywhere. */
  private def l2Structs(sv: org.apache.spark.sql.Column,
      cents: Array[Array[Float]]): Seq[org.apache.spark.sql.Column] =
    cents.toSeq.zipWithIndex.map { case (v, code) =>
      struct((dot_product(sv, typedLit(v.toSeq)) - lit(normHalf(v))).as("score"),
        lit(code).as("code"))
    }

  private def bestCode(sv: org.apache.spark.sql.Column,
      cents: Array[Array[Float]]): org.apache.spark.sql.Column = {
    val ss = l2Structs(sv, cents)
    (if (ss.size == 1) ss.head else greatest(ss: _*)).getField("code")
  }

  /** Training E-step over the fused (sub, slice) frame: a sub-dispatched
    * when-chain of per-subspace argmin expressions (m*k literal nodes,
    * capped codegen-sized by the pqCodebooks require). */
  private def assignCode(sub: org.apache.spark.sql.Column,
      sv: org.apache.spark.sql.Column,
      books: Array[Array[Array[Float]]]): org.apache.spark.sql.Column = {
    val cases = books.zipWithIndex.map { case (cents, s) => (s, bestCode(sv, cents)) }
    cases.tail.foldLeft(when(sub === lit(cases.head._1), cases.head._2)) {
      case (acc, (s, cc)) => acc.when(sub === lit(s), cc)
    }
  }

  /** Collected codebooks: books(sub)(code) = centroid floats. Bounded by
    * construction (<= 1024 rows — the index artifact, not data). Rejects
    * non-dense codes: the ADC lookup layout is positional, so a pruned/
    * relabeled book would silently score against the wrong centroids. */
  private def collectBooks(codebooks: DataFrame): Array[Array[Array[Float]]] =
    codebooks.select("sub", "code", "centv").collect()
      .groupBy(_.getInt(0)).toArray.sortBy(_._1)
      .map { case (sub, rs) =>
        val sorted = rs.sortBy(_.getInt(1))
        require(sorted.map(_.getInt(1)).toSeq == (0 until sorted.length),
          s"codebook sub=$sub: codes must be dense 0..${sorted.length - 1} " +
            "(pqCodebooks output satisfies this)")
        sorted.map(_.getSeq[Float](2).toArray)
      }

  /** First-row dim check: a corpus/query whose vectors don't match the
    * trained dim would otherwise be silently truncated by the dot kernel's
    * min-length loop; per-row malformed data remains the caller's contract. */
  private def requireDim(df: DataFrame, vecCol: String,
      books: Array[Array[Array[Float]]], what: String): Unit = {
    val dim = books.length * books.head.head.length
    df.select(size(col(vecCol)).as("d")).limit(1).collect().headOption.foreach { r =>
      require(r.getInt(0) == dim,
        s"$what vector dim ${r.getInt(0)} != codebook dim $dim")
    }
  }

  /**
   * PQ-encode a corpus: (item_id, codes ARRAY<INT> length m) — nearest
   * centroid per slice by squared L2 via the dot identity (the measure
   * training and ADC lookup share; encode-argmin and lookup-table scoring
   * must agree or ranking guarantees break). A narrow literal expression per
   * subspace — zero shuffle, whole-stage codegen.
   */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val books = collectBooks(codebooks)
    requireDim(corpus, vecCol, books, "corpus")
    pqEncodeWith(corpus, books, idCol, vecCol)
  }

  private def pqEncodeWith(corpus: DataFrame, books: Array[Array[Array[Float]]],
      idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("item_id"),
      codesCol(books, col(vecCol)).as("codes"))

  /** The m-code PQ encoding of one vector column — per-subspace argmin by
    * the shared L2-via-dot measure, as a narrow literal expression. */
  private def codesCol(books: Array[Array[Array[Float]]],
      vecCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val subDim = books.head.head.length
    array(books.toSeq.zipWithIndex.map { case (cents, sub) =>
      bestCode(slice(vecCol, sub * subDim + 1, subDim), cents)
    }: _*)
  }

  /** Per-query ADC lookup table: the m*k per-subspace scores
    * (q_sub.c - ||c||^2/2 — descending total == ascending squared L2, which
    * on L2-normalized corpus vectors ranks identically to cosine), flattened
    * subspace-major — built ONCE per query as a narrow literal expression,
    * then every candidate costs m array lookups + adds instead of a
    * dim-length float dot (compute and memory traffic both drop by ~dim/m). */
  private def withLut(q: DataFrame, books: Array[Array[Array[Float]]]): DataFrame = {
    val subDim = books.head.head.length
    val lutCols = books.toSeq.zipWithIndex.flatMap { case (cents, sub) =>
      val sv = slice(col("qv"), sub * subDim + 1, subDim)
      cents.toSeq.map(v => dot_product(sv, typedLit(v.toSeq)) - lit(normHalf(v)))
    }
    q.withColumn("lut", array(lutCols: _*))
  }

  /** Sum of m LUT lookups per candidate — the codegen'd [[AdcLookup]]
    * kernel with the per-subspace offsets baked in (the zip_with/aggregate
    * HOF formulation evaluates its lambdas interpreted, outside whole-stage
    * codegen — measured ~10x slower on the q50 cross-score). */
  private def adcScore(books: Array[Array[Array[Float]]]): org.apache.spark.sql.Column = {
    val offsets = books.map(_.length).scanLeft(0)(_ + _).init
    adc_lookup(col("codes"), col("lut"), offsets.toSeq)
  }

  /**
   * ADC top-k over a PQ-compressed corpus. Pairs are generated id-only and
   * the codes/lookup tables attach via equi-joins whose BUILD sides
   * materialize the encode/LUT projections once per row ([[pqScorePairs]]).
   * The "obvious" formulation — encoded corpus crossJoin
   * broadcast(queries-with-lut) — looks equivalent but is a performance
   * trap: whole-stage codegen DEFERS the stream side's projection into the
   * nested-loop's inner loop, so the m*k-dot-product encode expression
   * re-evaluates per PAIR (measured 107 s vs 1.8 s on a 2000 x 2000 cross
   * score at m = 4, k = 16). Composing an IVF cell restriction
   * ([[ivfCandidates]] -> [[pqScorePairs]]) is the full IVFADC
   * ([[ivfPqTopK]]) — this flat variant is the `IndexPQ` shape.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val allPairs = corpus.select(col(idCol).as("item_id"))
      .crossJoin(broadcast(queries.select(col(idCol).as("query_id"))))
      .where(col("query_id") =!= col("item_id"))
    pqScorePairs(allPairs, corpus, queries, codebooks, idCol, vecCol)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "adc", "rank")
  }

  /**
   * ADC scores for an explicit (query_id, item_id) candidate-pair set — the
   * scoring primitive a cell-restricted IVFPQ composes with: candidates come
   * from a coarse-cell equi-join, scores from the compressed codes, and only
   * the final top-k ever touches full vectors (if at all). The encoded
   * corpus and the per-query LUTs ride the joined (build/shuffled) sides, so
   * their projections evaluate once per row, never per pair.
   */
  def pqScorePairs(pairs: DataFrame, corpus: DataFrame, queries: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val books = collectBooks(codebooks)
    requireDim(corpus, vecCol, books, "corpus")
    requireDim(queries, vecCol, books, "query")
    val q = withLut(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), books)
      .select("query_id", "lut")
    pairs.select("query_id", "item_id")
      .join(pqEncodeWith(corpus, books, idCol, vecCol), "item_id")
      .join(q, "query_id")
      .withColumn("adc", adcScore(books))
      .select("query_id", "item_id", "adc")
  }

  // --- residual IVFPQ (IVFADC with residual encoding) --------------------

  /** (item_id, cell, rv = cv - centroid(cell)) for every corpus row — the
    * residual domain FAISS's `IndexIVFPQ` quantizes. One broadcast equi-join
    * on the nlist-row centroid table; the subtraction is the codegen'd
    * [[graft.functions.VecSub]] kernel. */
  private def residualFrame(c: DataFrame, localCents: DataFrame,
      nlist: Long): DataFrame =
    assignCellsAuto(c, localCents, nlist)
      .join(broadcast(localCents.select(col("cent_id").as("cell"), col("centv"))),
        "cell")
      .select(col("item_id"), col("cell"),
        vec_sub(col("cv"), col("centv")).as("rv"))

  /** Re-root a centroid table on its collected rows (nlist rows — the index
    * artifact, one job), so the several consumers below do not re-execute a
    * possibly corpus-sized centroid PLAN each ([[sampleCentroids]] is a
    * corpus-wide TakeOrdered). Re-localizing an already-local frame costs
    * one trivial job over the parallelized rows, so composed searches can
    * localize once up front and pass the result down. Returns the collected
    * rows too — [[coarsePairs]] derives its literal-path centroid array from
    * them without a second collect. */
  private def localizeCentroids(centroids: DataFrame)
      : (DataFrame, Array[org.apache.spark.sql.Row]) = {
    val proj = centroids.select("cent_id", "centv")
    val rows = proj.collect()
    val spark = centroids.sparkSession
    (spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), proj.schema),
      rows)
  }

  /**
   * Train PQ codebooks on coarse-cell RESIDUALS r = x - centroid(cell(x)) —
   * FAISS `IndexIVFPQ`'s encoding domain. Residuals concentrate near the
   * origin regardless of which cell a vector lives in, so the m codebooks
   * spend their k codewords on local displacement instead of global
   * position — at equal (m, k) the quantization error drops vs flat-vector
   * PQ on clustered data. Same artifact contract as [[pqCodebooks]]
   * (value-sorted dense codes); persist it together with the centroids —
   * codes are meaningless without the exact centroid table they offset.
   */
  def pqResidualCodebooks(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, m: Int, k: Int = 16,
      iters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val (localCents, rows) = localizeCentroids(centroids)
    pqCodebooks(residualFrame(c, localCents, rows.length.toLong), "item_id", "rv",
      m, k, iters)
  }

  /**
   * ADC scores for explicit (query_id, item_id) pairs in the RESIDUAL
   * domain: each pair scores against the ITEM's cell — the lookup table is
   * built from q - centroid(cell) once per (query, cell) actually present,
   * codes from x - centroid(cell) once per item. The returned score is
   * -(estimated squared L2)/2 = adc_sum - ||q - centroid||^2/2: by the
   * shift identity ||q - x|| = ||(q-c) - (x-c)|| it is comparable ACROSS
   * cells, which the raw adc sum alone is not (its implicit ||q-c||^2 bias
   * differs per cell — subtracting it is what makes cross-cell top-k
   * well-defined).
   */
  def pqResidualScorePairs(pairs: DataFrame, corpus: DataFrame,
      queries: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val books = collectBooks(codebooks)
    requireDim(corpus, vecCol, books, "corpus")
    requireDim(queries, vecCol, books, "query")
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val (localCents, cRows) = localizeCentroids(centroids)
    val codes = residualFrame(c, localCents, cRows.length.toLong)
      .select(col("item_id"), col("cell"), codesCol(books, col("rv")).as("codes"))
    val withCells = pairs.select("query_id", "item_id").join(codes, "item_id")
    // the query residual rides the "qv" column so withLut's contract applies
    val qres = withCells.select("query_id", "cell").distinct()
      .join(q, "query_id")
      .join(broadcast(localCents.select(col("cent_id").as("cell"), col("centv"))),
        "cell")
      .select(col("query_id"), col("cell"),
        vec_sub(col("qv"), col("centv")).as("qv"))
    val luts = withLut(qres, books)
      .withColumn("qn", dot_product(col("qv"), col("qv")) / 2)
      .select("query_id", "cell", "lut", "qn")
    withCells.join(luts, Seq("query_id", "cell"))
      .withColumn("adc", adcScore(books) - col("qn"))
      .select("query_id", "item_id", "adc")
  }

  /**
   * Residual IVFADC top-k — the FAISS `IndexIVFPQ` default, where
   * [[ivfPqTopK]] is the raw-vector-codes variant. The corpus is touched
   * exactly ONCE per search: the same nearest-centroid pass yields the cell
   * (the candidate join key) AND the residual codes, and the candidate join
   * ships the m small codes directly — composing [[ivfCandidates]] with
   * [[pqResidualScorePairs]] would run the nlist-way assignment scan over
   * the full corpus twice. Scores match that composition exactly (same
   * pairs, same per-(query, cell) LUT, same cross-cell bias subtraction).
   * Sandbox note: this still derives (item_id, cell, codes) inside the
   * plan; a production run persists that table once ([[pqEncode]]'s
   * residual analogue) and joins it instead.
   */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val books = collectBooks(codebooks)
    requireDim(corpus, vecCol, books, "corpus")
    requireDim(queries, vecCol, books, "query")
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // localize once: a non-local centroid PLAN (a corpus-wide sample) must
    // not execute once per downstream consumer
    val (localCents, rows) = localizeCentroids(centroids)
    val cents = rows.map(r => (r.get(0), r.getSeq[Float](1).toArray))
    // the single corpus pass: cell assignment + residual encode, fused
    val codes = residualFrame(c, localCents, rows.length.toLong)
      .select(col("item_id"), col("cell"), codesCol(books, col("rv")).as("codes"))
    val probes = probeCells(q, localCents, cents, nProbe)
    val cand = probes.select("query_id", "cell").join(codes, "cell")
      .where(col("query_id") =!= col("item_id"))
    // per-(query, probed cell) residual LUT + the ||q - c||^2/2 bias that
    // makes the emitted score comparable across cells (pqResidualScorePairs
    // documents the shift identity)
    val qres = probes
      .join(broadcast(localCents.select(col("cent_id").as("cell"), col("centv"))),
        "cell")
      .select(col("query_id"), col("cell"),
        vec_sub(col("qv"), col("centv")).as("qv"))
    val luts = withLut(qres, books)
      .withColumn("qn", dot_product(col("qv"), col("qv")) / 2)
      .select("query_id", "cell", "lut", "qn")
    cand.join(luts, Seq("query_id", "cell"))
      .withColumn("adc", adcScore(books) - col("qn"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "adc", "rank")
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      srpBits: Int = 10, tables: Int = 8, seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // bucket rows carry ONLY (id, key): the multi-table explode and the
    // distinct over colliding pairs shuffle ids, never the vectors; key
    // scheme shared with the embedding near-dup path via CandidateGen
    def buckets(df: DataFrame, idc: String, vc: String): DataFrame =
      CandidateGen.srpBuckets(df, idc, vc, srpBits, tables, seed)
        .withColumnRenamed("id", idc)
    val candIds = buckets(c, "item_id", "cv").join(buckets(q, "query_id", "qv"), "key")
      .where(col("query_id") =!= col("item_id"))
      .select("query_id", "item_id")
      .distinct() // a pair may collide in several tables
    // vectors join back exactly once per distinct candidate pair
    val cand = candIds.join(q, "query_id").join(c, "item_id")
    cand
      .withColumn("cosine", cosine_sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id"))))
      .where(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }
}
