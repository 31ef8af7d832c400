package graft.operators

import graft.SparkSpec
import graft.functions.HashKernels

class AnnSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered vectors (20 centers + small noise): the realistic ANN regime —
    * true neighbors are materially closer than the bulk. Uniform-random
    * vectors have no neighborhood structure for any LSH to exploit. */
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(20)(Array.fill(32)(rng.nextFloat() - 0.5f))
    (0L until 200L).map { i =>
      val c = centers((i % 20).toInt)
      (i, c.map(_ + (rng.nextFloat() - 0.5f) * 0.1f))
    }
  }

  test("brute-force top-k matches driver-side oracle") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Ann.bruteForceTopK(df, df.where($"vec_id" < 5), "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val byId = vecs.toMap
    (0L until 5L).foreach { q =>
      val expect = vecs.filter(_._1 != q)
        .map { case (i, v) => (i, HashKernels.cosine(byId(q), v)) }
        .sortBy { case (i, c) => (-c, i) }.take(10).map(_._1)
      assert(got(q) == expect, s"query $q")
    }
  }

  test("ivf top-k with full probe equals exact brute force") {
    // probing every cell removes the approximation: result must match the
    // exact baseline row-for-row (same tie-break)
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = Ann.ivfTopK(df, queries, "vec_id", "embedding", 10,
      nlist = 8, nProbe = 8)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf == exact,
      s"missing=${(exact diff ivf).take(5)} extra=${(ivf diff exact).take(5)}")
  }

  test("ivf top-k achieves decent recall@10 at partial probe") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(df, queries, "vec_id", "embedding", 10,
      nlist = 16, nProbe = 6)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("ivf: sim-tied assignment and probe agree (zero vector reachable at nProbe=1)") {
    // a zero vector ties at cosine 0 with every centroid; assignment and
    // probe selection must break the tie the same way or the copy's cell is
    // unreachable at partial probe
    val data = vecs ++ Seq((900L, Array.fill(32)(0f)), (901L, Array.fill(32)(0f)))
    val df = data.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" === 901L)
    val candidates = Ann.ivfTopK(df, queries, "vec_id", "embedding", k = 300,
        nlist = 8, nProbe = 1)
      .select("item_id").as[Long].collect().toSet
    assert(candidates.contains(900L),
      s"tied-sim item not reachable through its assigned cell: $candidates")
  }

  test("ivf assignment is deterministic across reruns") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 10)
    def run() = Ann.ivfTopK(df, queries, "vec_id", "embedding", 5,
        nlist = 16, nProbe = 3)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(run() == run())
  }

  test("kmeans-refined centroids: deterministic, full probe stays exact") {
    val df = vecs.toDF("vec_id", "embedding")
    def train() = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = 8, iters = 2)
    val cents = train()
    assert(cents.collect().map(_.toString).sorted.toSeq ==
      train().collect().map(_.toString).sorted.toSeq, "kmeans not deterministic")
    val queries = df.where($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = Ann.ivfTopKWith(df, queries, cents, "vec_id", "embedding", 10,
      nProbe = 8) // probes every cell -> approximation removed
    val got = ivf.select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact,
      s"missing=${(exact diff got).take(5)} extra=${(got diff exact).take(5)}")
  }

  test("kmeans-refined partial probe matches sampled-centroid recall or better") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val s = res.select("query_id", "item_id").as[(Long, Long)].collect().toSet
      (exact intersect s).size.toDouble / exact.size
    }
    val sampled = recallOf(Ann.ivfTopK(df, queries, "vec_id", "embedding", 10,
      nlist = 16, nProbe = 4))
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = 16, iters = 3)
    val trained = recallOf(Ann.ivfTopKWith(df, queries, cents, "vec_id", "embedding",
      10, nProbe = 4))
    assert(trained >= sampled - 0.05, s"trained=$trained sampled=$sampled")
    assert(trained >= 0.7, s"trained recall too low: $trained")
  }

  test("large nlist (>= 1024) takes the broadcast-join path, full probe stays exact") {
    // above literalCentroidMax the centroid vectors must NOT ride in as a
    // per-row expression tree (greatest over 1024 structs would blow the
    // generated-method size and fall back to interpreted eval) — they stay a
    // broadcast relation and assignment/probing run as join + aggregate
    val rng = new scala.util.Random(11)
    val big = (0L until 1200L).map(i => (i, Array.fill(16)(rng.nextFloat() - 0.5f)))
    val df = big.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivf = Ann.ivfTopK(df, queries, "vec_id", "embedding", 10,
      nlist = 1024, nProbe = 1024)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("greatest("),
      "literal-centroid expression path used at nlist=1024")
    val got = ivf.select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact,
      s"missing=${(exact diff got).take(5)} extra=${(got diff exact).take(5)}")
  }

  test("pq: ADC scores are exact when items sit on orthogonal unit centroids") {
    // items reconstruct exactly from these unit codebooks, so ADC equals the
    // exact per-slice score q.c - ||c||^2/2 (= exact dot minus 1/2 per slice)
    val books = Seq(
      (0, 0, Seq(1f, 0f)), (0, 1, Seq(0f, 1f)),
      (1, 0, Seq(1f, 0f)), (1, 1, Seq(0f, 1f)))
      .toDF("sub", "code", "centv")
    val corpus = Seq(
      (1L, Array(1f, 0f, 1f, 0f)), // codes (0, 0)
      (2L, Array(0f, 1f, 0f, 1f))) // codes (1, 1)
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val got = Ann.pqTopK(corpus, queries, books, "vec_id", "embedding", k = 2)
      .select("item_id", "adc", "rank").as[(Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(got(1L)._1 - 3.0) < 1e-9) // (1 - .5) + (3 - .5)
    assert(math.abs(got(2L)._1 - 5.0) < 1e-9) // (2 - .5) + (4 - .5)
    assert(got(2L)._2 == 1 && got(1L)._2 == 2)
  }

  test("pq: dim-mismatched inputs and non-dense codebooks are rejected") {
    val books = Seq(
      (0, 0, Seq(1f, 0f)), (0, 1, Seq(0f, 1f)),
      (1, 0, Seq(1f, 0f)), (1, 1, Seq(0f, 1f)))
      .toDF("sub", "code", "centv")
    val short = Seq((1L, Array(1f, 0f, 1f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Ann.pqEncode(short, books, "vec_id", "embedding").collect()
    }
    val sparse = Seq((0, 0, Seq(1f, 0f)), (0, 2, Seq(0f, 1f)))
      .toDF("sub", "code", "centv")
    val ok = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Ann.pqEncode(ok, sparse, "vec_id", "embedding").collect()
    }
  }

  test("pq: identical vectors encode identically, codes dense and bounded") {
    val df = vecs.toDF("vec_id", "embedding")
    val books = Ann.pqCodebooks(df, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val perSub = books.groupBy("sub").count().as[(Int, Long)].collect().toMap
    assert(perSub.keySet == Set(0, 1, 2, 3))
    assert(perSub.values.forall(c => c >= 2 && c <= 16))
    val copies = df.unionByName(
      df.select(($"vec_id" + 1000L).as("vec_id"), $"embedding"))
    val codes = Ann.pqEncode(copies, books, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(_.size == 4))
    codes.foreach { case (_, cs) =>
      cs.zipWithIndex.foreach { case (c, sub) =>
        assert(c >= 0 && c < perSub(sub), s"code $c out of range in sub $sub")
      }
    }
    (0L until 200L).foreach { i =>
      assert(codes(i) == codes(i + 1000L), s"copy of $i encoded differently")
    }
  }

  test("pq: no item ADC-outscores the query's own original (q50 invariant)") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val books = Ann.pqCodebooks(df, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val top1 = Ann.pqTopK(df, queries, books, "vec_id", "embedding", k = 1)
    val own = Ann.pqScorePairs(
      queries.select($"vec_id".as("query_id"), ($"vec_id" - 1000L).as("item_id")),
      df, queries, books, "vec_id", "embedding")
      .select($"query_id", $"adc".as("own_adc"))
    val joined = top1.join(own, "query_id")
    assert(joined.count() == 200L)
    assert(joined.where($"own_adc" < $"adc").count() == 0L,
      "an item out-scored the query's own vector under ADC")
  }

  test("ivfpq: probing every cell equals flat PQ ranking (approximations compose)") {
    // with all coarse cells probed the candidate set is the whole corpus, so
    // IVFADC must reproduce the flat ADC ranking row-for-row (same scores,
    // same tie-break) — pins the candidate join and the shared scoring path
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 10)
    val books = Ann.pqCodebooks(df, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = 8, iters = 1)
    val flat = Ann.pqTopK(df, queries, books, "vec_id", "embedding", 10)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivfpq = Ann.ivfPqTopK(df, queries, cents, books, "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select("query_id", "item_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivfpq == flat,
      s"missing=${(flat diff ivfpq).take(5)} extra=${(ivfpq diff flat).take(5)}")
  }

  test("pq: decent recall@10 vs exact on clustered vectors") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val books = Ann.pqCodebooks(df, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val pq = Ann.pqTopK(df, queries, books, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // compressed-domain scoring is lossy by design (32-dim floats -> 4
    // codes); the cluster structure must still dominate the ranking
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("residual ivfpq: exact L2 ranking when item residuals reconstruct exactly") {
    // Two well-separated cells; every ITEM is centroid + an exactly
    // representable residual codeword pair, so x_res-hat == x_res and the
    // score -(d-hat^2)/2 equals the true -||q - x||^2/2 for ARBITRARY
    // queries (only the item side is quantized; the shift identity
    // ||q - x|| = ||(q-c) - (x-c)|| is exact). Queries are placed so true
    // neighbors straddle both cells: a missing per-(query, cell)
    // ||q - centroid||^2/2 adjustment would mis-rank across cells.
    val cents = Seq((0L, Seq(10f, 0f, 0f, 0f)), (1L, Seq(0f, 10f, 0f, 0f)))
      .toDF("cent_id", "centv")
    val books = Seq(
      (0, 0, Seq(0f, 0f)), (0, 1, Seq(1f, 0f)), (0, 2, Seq(0f, 2f)),
      (1, 0, Seq(0f, 0f)), (1, 1, Seq(0f, 1f)), (1, 2, Seq(3f, 0f)))
      .toDF("sub", "code", "centv")
    val r0s = Seq(Array(0f, 0f), Array(1f, 0f), Array(0f, 2f))
    val r1s = Seq(Array(0f, 0f), Array(0f, 1f), Array(3f, 0f))
    val cvecs = Seq(Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f))
    val items = (for {
      (c, ci) <- cvecs.zipWithIndex; (r0, i) <- r0s.zipWithIndex
      (r1, j) <- r1s.zipWithIndex
    } yield ((ci * 9 + i * 3 + j).toLong,
      Array(c(0) + r0(0), c(1) + r0(1), c(2) + r1(0), c(3) + r1(1))))
    val corpus = items.toDF("vec_id", "embedding")
    val queries = Seq(
      (100L, Array(9f, 1f, 1f, 0f)), (101L, Array(1f, 9f, 0f, 1f)),
      (102L, Array(5f, 5f, 2f, 1f))).toDF("vec_id", "embedding")
    val got = Ann.ivfPqResidualTopK(corpus, queries, cents, books,
        "vec_id", "embedding", k = items.size, nProbe = 2)
      .select("query_id", "item_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect()
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val qs = Map(100L -> Array(9f, 1f, 1f, 0f), 101L -> Array(1f, 9f, 0f, 1f),
      102L -> Array(5f, 5f, 2f, 1f))
    qs.foreach { case (qid, qv) =>
      val expect = items.map { case (id, v) => (id, d2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.map(_._1)
      val mine = got.filter(_._1 == qid).sortBy(_._4)
      assert(mine.map(_._2).toSeq == expect, s"query $qid ranking")
      // integer coordinates: the score must be EXACTLY -d^2/2
      mine.foreach { case (_, id, adc, _) =>
        val d = d2(qv, items.find(_._1 == id).get._2)
        assert(adc == -d / 2, s"query $qid item $id: adc=$adc d2=$d")
      }
    }
  }

  test("residual ivfpq: no item outscores the query's own original at nProbe=1") {
    // the q52 driver invariant: a query that copies a corpus vector lands in
    // the same cell (deterministic tie-break), probes exactly that cell at
    // nProbe=1, and within one cell every candidate shares the lookup table
    // — the copy's codes are the per-subspace argmax of it, so no candidate
    // scores strictly higher
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = 8, iters = 1)
    val books = Ann.pqResidualCodebooks(df, cents, "vec_id", "embedding",
      m = 4, k = 16, iters = 1)
    val top1 = Ann.ivfPqResidualTopK(df, queries, cents, books,
      "vec_id", "embedding", k = 1, nProbe = 1)
    val own = Ann.pqResidualScorePairs(
      queries.select($"vec_id".as("query_id"), ($"vec_id" - 1000L).as("item_id")),
      df, queries, cents, books, "vec_id", "embedding")
      .select($"query_id", $"adc".as("own_adc"))
    val joined = top1.join(own, "query_id")
    assert(joined.count() == 200L)
    assert(joined.where($"own_adc" < $"adc").count() == 0L,
      "an item out-scored the query's own vector under residual ADC")
  }

  test("residual codebooks beat flat codebooks at equal (m, k) on clustered data") {
    // the reason IndexIVFPQ encodes residuals: displacement-local codewords.
    // Same coarse structure, same (m, k) budget — full-probe recall@10 must
    // not be worse than the flat-vector codes variant on clustered vectors.
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = 8, iters = 1)
    val flatBooks = Ann.pqCodebooks(df, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val resBooks = Ann.pqResidualCodebooks(df, cents, "vec_id", "embedding",
      m = 4, k = 16, iters = 2)
    def recallOf(top: org.apache.spark.sql.DataFrame): Double = {
      val s = top.select("query_id", "item_id").as[(Long, Long)].collect().toSet
      (exact intersect s).size.toDouble / exact.size
    }
    val flat = recallOf(Ann.ivfPqTopK(df, queries, cents, flatBooks,
      "vec_id", "embedding", k = 10, nProbe = 8))
    val res = recallOf(Ann.ivfPqResidualTopK(df, queries, cents, resBooks,
      "vec_id", "embedding", k = 10, nProbe = 8))
    assert(res >= flat, s"residual recall $res < flat recall $flat")
    assert(res >= 0.6, s"residual recall too low: $res")
  }

  test("lsh top-k achieves decent recall@10 vs exact") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.where($"vec_id" < 20)
    val exact = Ann.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(df, queries, "vec_id", "embedding", 10,
      srpBits = 8, tables = 16)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("cellAssignments matches driver-side nearest centroid on BOTH nlist paths") {
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // small path (literal centroids) and big path (broadcast + max_by) must
    // produce the SAME (max sim, then max cent_id) assignment the search uses
    for (n <- Seq(8, 300)) {
      val rng = new scala.util.Random(n)
      val data = (0L until 400L).map(i => (i, Array.fill(8)(rng.nextFloat() - 0.5f)))
      val df = data.toDF("vec_id", "embedding")
      val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", nlist = n, iters = 1)
      val centArr = cents.as[(Long, Array[Float])].collect()
      val got = Ann.cellAssignments(df, cents, "vec_id", "embedding")
        .as[(Long, Long)].collect().toMap
      assert(got.size == data.size)
      data.foreach { case (id, v) =>
        val best = centArr.map { case (cid, cv) => (cosine(v, cv), cid) }.max
        assert(got(id) == best._2, s"nlist=$n id=$id got=${got(id)} want=${best._2}")
      }
    }
  }
}
