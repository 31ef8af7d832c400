package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic, dependency-free hash kernels shared by
 *  - the codegen'd Catalyst expressions in [[GraftExpressions]],
 *  - the brute-force oracle in the golden tests (same-bits guarantee — the
 *    recall gate measures LSH loss only, SURVEY.md section 7 hard part d).
 *
 * All methods are static (object) so generated Java code can call them
 * directly without breaking the surrounding whole-stage-codegen span.
 */
object HashKernels {

  final val GOLDEN: Long = 0x9E3779B97F4A7C15L
  /** Sentinel minhash value for an empty shingle set. */
  final val EMPTY_MIN: Long = Long.MaxValue

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-8 bytes, avalanched — our token/string hash. */
  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xCBF29CE484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  // ---------------------------------------------------------------------
  // Shingling (reference n-gram extraction, ea/sim/main/preprocess/seq_coder.py:69-81)
  // ---------------------------------------------------------------------

  /**
   * Order-sensitive hashes of all k-grams of a token sequence.
   * A sequence shorter than k yields one shingle over the whole sequence;
   * an empty sequence yields an empty array.
   */
  def shingleHashesFromTokenHashes(tok: Array[Long], k: Int, seed: Long): Array[Long] = {
    val n = tok.length
    if (n == 0) return Array.emptyLongArray
    val kk = math.min(k, n)
    val out = new Array[Long](n - kk + 1)
    var i = 0
    while (i <= n - kk) {
      var h = seed ^ GOLDEN
      var j = 0
      while (j < kk) {
        h = mix64(h * 0x100000001B3L ^ tok(i + j))
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Entry point used by the ShingleHashes expression: array<string> tokens. */
  def shingleHashes(tokens: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = tokens.getUTF8String(i)
      th(i) = if (u == null) mix64(seed) else hashBytes(u.getBytes, seed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(shingleHashesFromTokenHashes(th, k, seed))
  }

  // ---------------------------------------------------------------------
  // MinHash (replaces FaST/Lerch rankers per the north rule; candidate
  // semantics analogous to reference FAISS top-k, ea/sim/main/methods/index/faiss.py:63-77)
  // ---------------------------------------------------------------------

  /**
   * Carter–Wegman MinHash: per element x, u = mix(x ^ seedA), v = mix(x ^ seedB),
   * h_i(x) = u + (i+1) * (v | 1). signature(i) = min_x h_i(x).
   * Two mixes per element + one multiply-add per hash — O(|S| * n) cheap ops.
   */
  def minhash(shingles: ArrayData, numHashes: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      minhashArray(shingles.toLongArray(), numHashes, seed))

  def minhashArray(sh: Array[Long], numHashes: Int, seed: Long): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, EMPTY_MIN)
    val seedB = mix64(seed ^ 0xDEADBEEF5EEDL)
    var s = 0
    while (s < sh.length) {
      val u = mix64(sh(s) ^ seed)
      val v = mix64(sh(s) ^ seedB) | 1L
      var i = 0
      var h = u
      while (i < numHashes) {
        h += v // h = u + (i+1)*v accumulated
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /**
   * One-permutation MinHash (Li/Owen/Zhang NIPS'12) with OPTIMAL
   * DENSIFICATION (Shrivastava ICML'17): hash every element ONCE, route it
   * to bin `h mod numHashes`, keep the per-bin minimum, then fill each empty
   * bin by probing h(bin, attempt)-selected bins until an occupied one is
   * hit and copying its value. Collision probability per bin is the Jaccard
   * similarity — the same LSH property as [[minhashArray]] — at 1 mix per
   * element instead of numHashes multiply-adds: the signature pass over a
   * 100 TB corpus drops from O(|S| * numHashes) to O(|S| + numHashes) per
   * row, which is the difference between featurization dominating ingest
   * and disappearing into it.
   *
   * Two sets sharing an empty bin probe the SAME deterministic sequence
   * (the probe hash reads only (seed, bin, attempt)), so densified bins
   * compare borrowed values from identically-selected source bins — the
   * property that keeps the densified estimator unbiased (op. cit. §4).
   *
   * NOT min-mergeable: a densified bin copies another bin's value, and the
   * elementwise min of two densified signatures is not the densified
   * signature of the union (occupancy differs per side) — group-level
   * signature merging ([[graft.operators.Dedup.groupSignatures]]) stays on
   * the classic kernel by design.
   *
   * Empty input yields all-[[EMPTY_MIN]] (same contract as [[minhashArray]];
   * callers filter empty shingle sets before banding).
   */
  def ophArray(sh: Array[Long], numHashes: Int, seed: Long): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, EMPTY_MIN)
    var occupied = 0
    var s = 0
    while (s < sh.length) {
      val h = mix64(sh(s) ^ seed)
      val bin = java.lang.Long.remainderUnsigned(h, numHashes).toInt
      if (sig(bin) == EMPTY_MIN) occupied += 1
      if (h < sig(bin)) sig(bin) = h
      s += 1
    }
    if (occupied == 0 || occupied == numHashes) return sig
    // densify: probe targets must be ORIGINALLY-occupied bins, never ones
    // another densification pass just filled — fill order independence is
    // what makes the signature a pure function of the input set
    val src = java.util.Arrays.copyOf(sig, numHashes)
    var i = 0
    while (i < numHashes) {
      if (src(i) == EMPTY_MIN) {
        var t = 1L
        var j = 0
        do {
          j = java.lang.Long.remainderUnsigned(
            mix64(seed ^ (i.toLong * GOLDEN) ^ (t * 0xC2B2AE3D27D4EB4FL)),
            numHashes).toInt
          t += 1
        } while (src(j) == EMPTY_MIN)
        sig(i) = src(j)
      }
      i += 1
    }
    sig
  }

  def oph(shingles: ArrayData, numHashes: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      ophArray(shingles.toLongArray(), numHashes, seed))

  /** Fused OPH+banding (the [[minhashBandKeys]] counterpart): band keys
    * straight from shingles without materializing the signature column.
    * Bit-identical to bandKeys(ophArray(...)). */
  def ophBandKeys(shingles: ArrayData, numHashes: Int, bands: Int,
      rowsPerBand: Int, seed: Long): ArrayData = {
    val sig = ophArray(shingles.toLongArray(), numHashes, seed)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(seed ^ (b.toLong * GOLDEN))
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h * 0x100000001B3L ^ sig(b * rowsPerBand + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // ---------------------------------------------------------------------
  // SimHash (replaces the S3M neural scorer over phash-derived image tokens)
  // ---------------------------------------------------------------------

  /** Unweighted 64-bit SimHash over pre-hashed tokens (repeat a token to weight it). */
  def simhash64(tokens: ArrayData, seed: Long): Long =
    simhash64Array(tokens.toLongArray(), seed)

  def simhash64Array(tok: Array[Long], seed: Long): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < tok.length) {
      val h = mix64(tok(i) ^ seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /**
   * Tokens derived from a 64-bit perceptual hash: overlapping (position, byte)
   * grams, so that small pixel perturbations flip few tokens and SimHash
   * Hamming distance tracks phash Hamming distance.
   */
  def phashTokens(phash: Long): Array[Long] = {
    val out = new Array[Long](8)
    var i = 0
    while (i < 8) {
      val twoBytes = (phash >>> (i * 8)) & 0xFFFFL // overlapping 16-bit windows (wraps via >>> naturally truncating top)
      out(i) = mix64((i.toLong << 32) | twoBytes)
      i += 1
    }
    out
  }

  /**
   * Mirror transforms of the 8x8 average-hash, as pure bit permutations:
   * bit i of the phash is grid cell (gy = i / 8, gx = i % 8), so each BYTE
   * of the long is one grid row. A horizontal image flip maps gx -> 7 - gx
   * (reverse bits within every byte), a vertical flip maps gy -> 7 - gy
   * (reverse the byte order), and a 180-degree rotation is both (reverse
   * all 64 bits) — all three are single JDK intrinsics. The cell MEAN is
   * permutation-invariant, so the identity `averageHash(flip(img)) ==
   * phashFlipH(averageHash(img))` is EXACT whenever width/height are
   * multiples of 8 (integer cell boundaries mirror onto themselves); for
   * other sizes boundary cells differ by at most a pixel row/column and
   * the transformed hash is within a few Hamming bits — inside the dedup
   * verify tolerance either way.
   */
  def phashFlipH(p: Long): Long =
    java.lang.Long.reverseBytes(java.lang.Long.reverse(p))

  /** Vertical-flip transform of the phash (see [[phashFlipH]]). */
  def phashFlipV(p: Long): Long = java.lang.Long.reverseBytes(p)

  /** 180-degree-rotation transform of the phash (see [[phashFlipH]]). */
  def phashRot180(p: Long): Long = java.lang.Long.reverse(p)

  /**
   * Orbit-canonical phash: the (signed-long) minimum over the Klein
   * four-group orbit {p, flipH, flipV, rot180}. Invariant under all four
   * transforms — two mirrored/rotated re-uploads of one image share the
   * canonical, so bucketing and Hamming verification on the canonical make
   * the whole dedup DAG mirror-invariant with zero extra decode work.
   */
  def phashCanonical(p: Long): Long = {
    val h = phashFlipH(p)
    val v = phashFlipV(p)
    val r = phashRot180(p)
    math.min(math.min(p, h), math.min(v, r))
  }

  /**
   * Transpose of the 8x8 bit grid (cell (gy, gx) -> (gx, gy)): the classic
   * three-delta-swap flip about the main diagonal for row-major 64-bit bit
   * boards (Hacker's Delight fig. 7-3; the chess-programming
   * "flipDiagA1H8"). Together with the byte-level mirrors it generates the
   * full dihedral group D4 of the grid: rot90cw = flipH . transpose,
   * rot270cw = flipV . transpose, anti-transpose = rot180 . transpose.
   */
  def phashTranspose(p: Long): Long = {
    var x = p
    var t = 0x0f0f0f0f00000000L & (x ^ (x << 28))
    x ^= t ^ (t >>> 28)
    t = 0x3333000033330000L & (x ^ (x << 14))
    x ^= t ^ (t >>> 14)
    t = 0x5500550055005500L & (x ^ (x << 7))
    x ^= t ^ (t >>> 7)
    x
  }

  /**
   * 90-degree-CLOCKWISE-rotation transform of the phash: the rotated
   * image's grid cell (r, c) is the original's (7-c, r), i.e. flipH after
   * transpose. Exact (`averageHash(rot90(img)) == phashRot90(averageHash
   * (img))`) whenever BOTH dimensions are multiples of 8 — the grid blocks
   * of the rotated HxW image map 1:1 onto blocks of the original WxH one
   * and the block mean is permutation-invariant (see [[phashFlipH]] for
   * the non-multiple boundary argument).
   */
  def phashRot90(p: Long): Long = phashFlipH(phashTranspose(p))

  /** 90-degree-counter-clockwise (= 270 cw) transform: flipV after
    * transpose (see [[phashRot90]]). */
  def phashRot270(p: Long): Long = phashFlipV(phashTranspose(p))

  /**
   * Full-dihedral orbit-canonical phash: the signed-long minimum over all
   * EIGHT grid symmetries {id, flipH, flipV, rot180, transpose, rot90,
   * rot270, anti-transpose}. D4 factors as the Klein four-group union its
   * transpose coset, so the canonical is `min(phashCanonical(p),
   * phashCanonical(phashTranspose(p)))` — invariant under every element
   * (each symmetry permutes the orbit). Extends [[phashCanonical]]'s
   * mirror-invariant dedup to 90/270-degree rotated re-uploads (portrait/
   * landscape re-posts, EXIF-orientation strips) with zero extra decode
   * work.
   */
  def phashCanonicalD4(p: Long): Long =
    math.min(phashCanonical(p), phashCanonical(phashTranspose(p)))

  /** Fused MinHash+banding: band keys straight from shingles without
    * materializing the numHashes-long signature (one output array instead of
    * three intermediates — the signature projection is allocation-bound at
    * high thread counts). Bit-identical to bandKeys(minhashArray(...)). */
  def minhashBandKeys(shingles: ArrayData, numHashes: Int, bands: Int,
      rowsPerBand: Int, seed: Long): ArrayData = {
    val sig = minhashArray(shingles.toLongArray(), numHashes, seed)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(seed ^ (b.toLong * GOLDEN))
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h * 0x100000001B3L ^ sig(b * rowsPerBand + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // ---------------------------------------------------------------------
  // LSH banding
  // ---------------------------------------------------------------------

  /** One 64-bit key per band: mix of band index and the band's r minhashes.
    * Signatures of empty shingle sets produce no usable bands downstream
    * (they collide only with other empties — filtered by the caller). */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int, seed: Long): ArrayData = {
    val s = sig.toLongArray()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(seed ^ (b.toLong * GOLDEN))
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h * 0x100000001B3L ^ s(b * rowsPerBand + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // ---------------------------------------------------------------------
  // Pairwise verification kernels
  // ---------------------------------------------------------------------

  /** Exact Jaccard over two shingle-hash multiset arrays (treated as sets). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = new java.util.HashSet[java.lang.Long](a.length * 2)
    var i = 0
    while (i < a.length) { sa.add(a(i)); i += 1 }
    val sb = new java.util.HashSet[java.lang.Long](b.length * 2)
    var inter = 0
    i = 0
    while (i < b.length) {
      if (sb.add(b(i)) && sa.contains(b(i))) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  def jaccardData(a: ArrayData, b: ArrayData): Double =
    jaccard(a.toLongArray(), b.toLongArray())

  /**
   * Longest common substring length between two strings, O(n*m) DP with two
   * rows; inputs clamped to maxLen chars to bound per-row cost (captions are
   * short; documents clamp). Reference analogue: the exact long-match pass
   * the north rule adds on top of FaST alignment (ea/sim/main/methods/classic/fast.py:49-68).
   */
  def lcsLength(a: String, b: String, maxLen: Int): Int = {
    if (a == null || b == null) return 0
    val x = if (a.length > maxLen) a.substring(0, maxLen) else a
    val y = if (b.length > maxLen) b.substring(0, maxLen) else b
    if (x.isEmpty || y.isEmpty) return 0
    var prev = new Array[Int](y.length + 1)
    var cur = new Array[Int](y.length + 1)
    var best = 0
    var i = 1
    while (i <= x.length) {
      val ci = x.charAt(i - 1)
      var j = 1
      while (j <= y.length) {
        if (ci == y.charAt(j - 1)) {
          cur(j) = prev(j - 1) + 1
          if (cur(j) > best) best = cur(j)
        } else cur(j) = 0
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  // ---------------------------------------------------------------------
  // Vector kernels (ANN / embedding near-dup)
  // ---------------------------------------------------------------------

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def cosineData(a: ArrayData, b: ArrayData): Double =
    cosine(a.toFloatArray(), b.toFloatArray())

  /** Inner product — the PQ/ADC scoring measure (on L2-normalized inputs it
    * ranks identically to cosine; unlike cosine it is additive across
    * subvector slices, which is what asymmetric-distance lookup sums). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  def dotData(a: ArrayData, b: ArrayData): Double =
    dot(a.toFloatArray(), b.toFloatArray())

  /** Elementwise float-vector subtraction (residual computation for IVFADC:
    * r = x - centroid). Truncates to the shorter input, matching the dot
    * kernel's min-length contract. */
  def subData(a: ArrayData, b: ArrayData): ArrayData = {
    val av = a.toFloatArray()
    val bv = b.toFloatArray()
    val n = math.min(av.length, bv.length)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = av(i) - bv(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC sum: per-subspace lookup-table reads for a PQ-coded item —
    * sum over i of lut[offsets(i) + codes(i)]. The tight loop the
    * interpreted zip_with/aggregate higher-order functions cannot give
    * (HOF lambdas stay outside whole-stage codegen). */
  def adcData(codes: ArrayData, lut: ArrayData, offsets: Array[Int]): Double = {
    val m = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(offsets(i) + codes.getInt(i)); i += 1 }
    s
  }

  /** Sign-random-projection LSH bucket for a float vector: `bits` hyperplanes
    * drawn deterministically from seed; bucket = packed sign bits. */
  def srpBucket(v: Array[Float], bits: Int, seed: Long): Long = {
    var out = 0L
    var bIdx = 0
    while (bIdx < bits) {
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        // deterministic pseudo-gaussian-ish weight in [-1,1) from (bit, dim)
        val h = mix64(seed ^ (bIdx.toLong * GOLDEN) ^ (i.toLong * 0x100000001B3L))
        dot += v(i) * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (dot >= 0) out |= (1L << bIdx)
      bIdx += 1
    }
    out
  }

  def srpBucketData(v: ArrayData, bits: Int, seed: Long): Long =
    srpBucket(v.toFloatArray(), bits, seed)

  /**
   * FaST-style positional alignment score over two token arrays
   * (reference: ea/sim/main/methods/classic/fast.py:49-133): positional
   * weights w(pos) = (pos+1)^-alpha; a token common to both docs contributes
   * (w(posA) + w(posB)) * exp(-gamma * |posA - posB|) at its FIRST occurrence
   * in each doc; normalized by the total weight mass of both docs. The
   * reference's df damping term is applied upstream as a join (it needs the
   * corpus df table), keeping this kernel a pure per-pair function.
   *
   * Intentional deviations from the cited reference (shared with
   * [[graft.operators.TextScores.fastAlignScore]]): (a) no gap penalty for
   * unmatched tokens — the reference subtracts unmatched weight, giving a
   * score range of [-1, 1] vs [0, 1] here; (b) tokens align at their
   * FIRST-occurrence 0-based position, where the reference merges every
   * occurrence over reversed 1-based positions. The citation marks
   * provenance of the scoring shape, not semantic equivalence.
   */
  def fastAlignData(a: ArrayData, b: ArrayData, gamma: Double, alpha: Double): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // first-occurrence position per token (walk backwards so index 0 wins)
    val pa = new java.util.HashMap[UTF8String, Integer](na * 2)
    var i = na - 1
    while (i >= 0) { pa.put(a.getUTF8String(i), i); i -= 1 }
    val pb = new java.util.HashMap[UTF8String, Integer](nb * 2)
    i = nb - 1
    while (i >= 0) { pb.put(b.getUTF8String(i), i); i -= 1 }
    @inline def w(pos: Int): Double =
      if (alpha == 0.0) 1.0 else math.pow(pos + 1.0, -alpha)
    var score = 0.0
    val it = pa.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val j = pb.get(e.getKey)
      if (j != null) {
        val ia = e.getValue.intValue()
        score += (w(ia) + w(j.intValue())) *
          math.exp(-gamma * math.abs(ia - j.intValue()))
      }
    }
    var norm = 0.0
    i = 0
    while (i < na) { norm += w(i); i += 1 }
    i = 0
    while (i < nb) { norm += w(i); i += 1 }
    if (norm == 0.0) 0.0 else score / norm
  }

  /** Rolling polynomial fingerprint of a string (document fingerprinting). */
  def rollingFingerprint(s: String, seed: Long): Long = {
    if (s == null) return mix64(seed)
    var h = seed ^ 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h = h * 0x100000001B3L + s.charAt(i)
      i += 1
    }
    mix64(h)
  }

  /**
   * Winnowed k-gram anchor set of a string (Schleimer/Wilkerson/Aiken,
   * SIGMOD'03 "Winnowing: local algorithms for document fingerprinting"):
   * hash every k-char gram, slide a window of `w` consecutive gram hashes,
   * select each window's minimum (rightmost on ties — the tie rule is a
   * pure function of window CONTENT, which the guarantee below needs), and
   * return the distinct selected hashes value-sorted.
   *
   * GUARANTEE: two strings sharing an exact substring of length >=
   * w + k - 1 share at least one anchor — the shared run contains one full
   * window of identical gram hashes, and both sides select the same minimum
   * from it. Expected density ~= 2/(w+1) anchors per char, so the feature
   * set stays small regardless of document length — the distributed
   * replacement for a suffix-array substring pass.
   *
   * Strings shorter than w + k - 1 (but >= k) emit the minimum over all
   * their grams: irrelevant to the guarantee (a shared run of the
   * qualifying length cannot fit in them) but it gives short documents an
   * anchor to collide on. Strings shorter than k emit no anchors.
   */
  def winnowAnchorsFromChars(s: String, k: Int, w: Int, seed: Long): Array[Long] = {
    if (s == null || s.length < k) return Array.emptyLongArray
    val m = s.length - k + 1 // gram count
    val g = new Array[Long](m)
    // O(n*k) direct gram hashing: k is small (<= ~32) and each char's hash
    // mixes through mix64, avoiding the weak-high-bits trap of an
    // un-finalized polynomial rolling hash
    var i = 0
    while (i < m) {
      var h = seed ^ GOLDEN
      var j = 0
      while (j < k) {
        h = mix64(h * 0x100000001B3L ^ s.charAt(i + j).toLong)
        j += 1
      }
      g(i) = h
      i += 1
    }
    val sel = new Array[Long](m)
    var nSel = 0
    if (m <= w) {
      var min = g(0)
      i = 1
      while (i < m) { if (g(i) <= min) min = g(i); i += 1 }
      sel(0) = min; nSel = 1
    } else {
      // standard winnowing scan: keep the rightmost-min index of the
      // current window, re-scan only when it falls out (amortized O(m))
      var minIdx = -1
      var end = w - 1
      while (end < m) {
        val start = end - w + 1
        if (minIdx < start) {
          minIdx = start
          var t = start + 1
          while (t <= end) { if (g(t) <= g(minIdx)) minIdx = t; t += 1 }
          sel(nSel) = g(minIdx); nSel += 1
        } else if (g(end) <= g(minIdx)) {
          minIdx = end
          sel(nSel) = g(minIdx); nSel += 1
        }
        end += 1
      }
    }
    val out = java.util.Arrays.copyOf(sel, nSel)
    java.util.Arrays.sort(out)
    // in-place unique on the sorted prefix
    var u = 0
    i = 1
    while (i < out.length) {
      if (out(i) != out(u)) { u += 1; out(u) = out(i) }
      i += 1
    }
    if (out.isEmpty) out else java.util.Arrays.copyOf(out, u + 1)
  }

  def winnowAnchors(s: UTF8String, k: Int, w: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      winnowAnchorsFromChars(if (s == null) null else s.toString, k, w, seed))

  // ---------------------------------------------------------------------
  // Weighted MinHash (ICWS): collision law over the WEIGHTED Jaccard
  // sum-min/sum-max — token multiplicity matters, the bridge between plain
  // set-Jaccard LSH and TF-IDF cosine. Ioffe, "Improved Consistent Sampling,
  // Weighted Minhash and L1 Sketching", ICDM 2010.

  /** Uniform in (0,1) from a mixed 64-bit state (never exactly 0 or 1,
    * so the ln() calls below stay finite). */
  @inline private def unit(h: Long): Double =
    ((h >>> 11) + 0.5) * (1.0 / 9007199254740992.0)

  /**
   * ICWS signature over a hash multiset — repeats in `hashes` ARE the
   * weights (integer tf). For each of `numHashes` samples the winning
   * element's mixed hash is emitted, so identical multisets produce
   * identical signatures and `P[sig_k(A) == sig_k(B)] = weightedJaccard
   * (A, B)`; band the signature with the same LSH machinery as classic
   * MinHash. Per sample and distinct element: r, c ~ Gamma(2,1) and
   * beta ~ U(0,1), all deterministic from (element, sample, seed);
   * t = floor(ln w / r + beta); ln y = r (t − beta); minimize
   * ln c − ln y − r. O(distinct · numHashes) per row.
   *
   * Empty input → the [[EMPTY_MIN]] sentinel in every slot (matches
   * [[minhash]]'s convention; two empty docs collide everywhere).
   */
  def icwsArray(hashes: Array[Long], numHashes: Int, seed: Long): Array[Long] = {
    val sig = new Array[Long](numHashes)
    if (hashes.isEmpty) {
      java.util.Arrays.fill(sig, EMPTY_MIN)
      return sig
    }
    // run-length the multiset ONCE into (element, ln weight) runs — the
    // per-sample loop then touches each distinct element exactly once
    // (O(distinct · numHashes) as documented; high-multiplicity spam rows
    // are precisely where the difference is ~100x)
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    var nDistinct = 0
    val els = new Array[Long](sorted.length)
    val lnW = new Array[Double](sorted.length)
    var i0 = 0
    while (i0 < sorted.length) {
      val el = sorted(i0)
      var w = 1
      while (i0 + w < sorted.length && sorted(i0 + w) == el) w += 1
      els(nDistinct) = el
      lnW(nDistinct) = math.log(w.toDouble)
      nDistinct += 1
      i0 += w
    }
    var k = 0
    while (k < numHashes) {
      var best = Double.PositiveInfinity
      var bestEl = 0L
      var bestT = 0L
      var i = 0
      while (i < nDistinct) {
        val el = els(i)
        // five deterministic uniforms for (element, sample)
        var h = mix64(el ^ mix64(seed + GOLDEN * (k + 1)))
        val u1 = unit(h); h = mix64(h + GOLDEN)
        val u2 = unit(h); h = mix64(h + GOLDEN)
        val u3 = unit(h); h = mix64(h + GOLDEN)
        val u4 = unit(h); h = mix64(h + GOLDEN)
        val beta = unit(h)
        val r = -math.log(u1 * u2)          // Gamma(2,1)
        val lnC = math.log(-math.log(u3 * u4))
        val t = math.floor(lnW(i) / r + beta)
        val lnY = r * (t - beta)
        val lnA = lnC - lnY - r
        if (lnA < best) { best = lnA; bestEl = el; bestT = t.toLong }
        i += 1
      }
      // the ICWS sample identity is the PAIR (element, level t): two
      // multisets agree on slot k iff both the winner and its weight level
      // match — {a:1} vs {a:3} must collide at rate 1/3, not 1
      sig(k) = mix64(mix64(bestEl ^ GOLDEN) ^ (bestT * GOLDEN))
      k += 1
    }
    sig
  }

  def icws(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      icwsArray(hashes.toLongArray(), numHashes, seed))

  /** Exact weighted Jaccard of two hash multisets: sum-min over sum-max of
    * per-element counts. Equal multisets → 1; both empty → 1 (matches
    * [[jaccard]]'s convention). */
  def weightedJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val ca = new java.util.HashMap[java.lang.Long, Integer](a.length * 2)
    var i = 0
    while (i < a.length) {
      ca.merge(a(i), 1, (x: Integer, y: Integer) => x + y); i += 1
    }
    val cb = new java.util.HashMap[java.lang.Long, Integer](b.length * 2)
    i = 0
    while (i < b.length) {
      cb.merge(b(i), 1, (x: Integer, y: Integer) => x + y); i += 1
    }
    var sumMin = 0L
    val it = ca.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = cb.get(e.getKey)
      if (w != null) sumMin += math.min(e.getValue.intValue(), w.intValue())
    }
    // sum-max = |A| + |B| - sum-min (total multiset masses)
    sumMin.toDouble / (a.length.toLong + b.length - sumMin)
  }

  def weightedJaccardData(a: ArrayData, b: ArrayData): Double =
    weightedJaccard(a.toLongArray(), b.toLongArray())

  /**
   * Shannon entropy (bits per character) of the code-point distribution of
   * a string — the classic cheap junk gate: near 0 for single-character
   * spam runs, ~4.1 for English prose, ~6+ for base64/binary noise pasted
   * into text fields. Summed in ascending code-point order so the value is
   * a pure function of the multiset (no per-row iteration-order noise).
   *
   * Empty string → 0.0 (a zero-length doc carries no information, and the
   * quality gate that consumes this already screens empties by length).
   */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    // ASCII fast path: a 128-slot table covers web text's hot loop; the
    // sorted-key map absorbs the general Unicode tail. One pass: each
    // iteration advances exactly one code point, so n falls out for free.
    val ascii = new Array[Int](128)
    var wide: java.util.TreeMap[Integer, Integer] = null
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.TreeMap[Integer, Integer]()
        wide.merge(cp, 1, (a: Integer, b: Integer) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0) return 0.0
    val invN = 1.0 / n
    val invLog2 = 1.0 / math.log(2.0)
    var h = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) {
        val p = ascii(c) * invN
        h -= p * math.log(p) * invLog2
      }
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val p = it.next().intValue() * invN
        h -= p * math.log(p) * invLog2
      }
    }
    h
  }

  /** The 18 stopwords of the language-ID heuristic, grouped by byte length
    * (longest is 4) — [[stopwordRatio]]'s membership test scans the
    * length-matched candidates only. */
  private val StopwordsByLen: Array[Array[Array[Byte]]] = {
    val words = Seq("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")
    val byLen = Array.fill(5)(Seq.newBuilder[Array[Byte]])
    words.foreach { w => byLen(w.length) += w.getBytes("UTF-8") }
    byLen.map(_.result().toArray)
  }

  /**
   * Single-pass stopword-density kernel — value-identical to the regex
   * chain `regexp_count(norm, "\b(the|...)\b") / regexp_count(norm,
   * "[^ ]+")` over `normalize_text` (lowercase, strip non-[a-z0-9 ],
   * collapse, trim), measured ~12x cheaper (0.69 s -> 0.06 s over the sf0.1
   * corpus; the regex path rewrites the document twice and runs two
   * Pattern scans, this walks the lowered bytes once). Equivalence
   * argument: after the strip, the normalized text's tokens are exactly
   * the maximal ASCII-[a-z0-9] runs of the LOWERED input (any other code
   * point, including multi-byte UTF-8 whose bytes are all >= 0x80, becomes
   * a separator), and `\b...\b` on [a-z0-9 ]-only text matches a stopword
   * exactly when a whole run equals it (no underscores exist, so word
   * boundaries are the run edges). Lowercasing is UTF8String.toLowerCase —
   * the identical call Spark's `lower()` makes, locale quirks included.
   * Zero tokens → 0.0 (the `when` branch of the original expression).
   */
  def stopwordRatio(s: UTF8String): Double = {
    val b = s.toLowerCase.getBytes
    val n = b.length
    var i = 0
    var nToks = 0
    var nStop = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val d = b(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        nToks += 1
        val len = i - start
        if (len <= 4) {
          val cands = StopwordsByLen(len)
          var k = 0
          var hit = false
          while (!hit && k < cands.length) {
            val w = cands(k)
            var j = 0
            while (j < len && w(j) == b(start + j)) j += 1
            hit = j == len
            k += 1
          }
          if (hit) nStop += 1
        }
      } else i += 1
    }
    if (nToks == 0) 0.0 else nStop.toDouble / nToks
  }

  private def round2(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * Single-pass quality-score kernel — value-identical to the expression
   * chain in `graft.functions.quality_score` (mean-word-length band +
   * punctuation sparsity + stopword presence, rounded to 2 with the same
   * BigDecimal HALF_UP Spark's `round` uses). One raw-byte scan yields the
   * punctuation count and the space-separated token count (the regex
   * spellings match ASCII classes, so byte-wise classification is exact;
   * multi-byte UTF-8 bytes are all >= 0x80 and fall through), `numChars`
   * is UTF8String's own code-point... character count exactly as
   * `length()` computes it, and the stopword leg reuses
   * [[stopwordRatio]]. Measured 0.70 s -> ~0.12 s over the sf0.1 corpus
   * vs the five-pass regex chain.
   */
  def qualityScore(s: UTF8String): Double = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var nPunct = 0
    var nToks = 0
    var inTok = false
    while (i < n) {
      val c = b(i)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':')
        nPunct += 1
      if (c == ' ') inTok = false
      else if (!inTok) { nToks += 1; inTok = true }
      i += 1
    }
    val nChars = s.numChars().toDouble
    val meanWord = if (nToks == 0) 0.0 else nChars / nToks
    val punctRatio = if (nChars == 0) 1.0 else nPunct / nChars
    val wordScore = if (meanWord >= 3.0 && meanWord <= 12.0) 0.4 else 0.0
    val punctScore = if (punctRatio <= 0.1) 0.3 else 0.0
    val stopScore = if (stopwordRatio(s) >= 0.05) 0.3 else 0.0
    round2(wordScore + punctScore + stopScore)
  }

  /**
   * Single-pass distinct-token ratio — value-identical to
   * `round(size(array_distinct(rawTokens)) / size(rawTokens), 4)` with the
   * empty/zero-token case mapping to 1.0 (the caller coalesces NULL text
   * to "" before the kernel, exactly like the expression chain's
   * coalesce). Tokens are maximal non-space (0x20) byte runs — the
   * `split(c, " ")` + remove-empties semantics; distinctness is exact
   * string equality over the UTF-8 bytes.
   */
  def distinctTokenRatio(s: UTF8String): Double = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var nToks = 0
    // UTF8String keys: exact BYTE equality, matching array_distinct's
    // semantics even for ill-formed UTF-8 (a java.lang.String decode would
    // collapse distinct invalid sequences onto U+FFFD)
    var distinct: java.util.HashSet[UTF8String] = null
    while (i < n) {
      if (b(i) == ' ') i += 1
      else {
        val start = i
        while (i < n && b(i) != ' ') i += 1
        nToks += 1
        if (distinct == null) distinct = new java.util.HashSet[UTF8String]()
        distinct.add(UTF8String.fromBytes(b, start, i - start))
      }
    }
    if (nToks == 0) 1.0
    else round4(distinct.size.toDouble / nToks)
  }
}
