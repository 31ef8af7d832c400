package graft

import graft.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column, resolvedExpression}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.Decimal

/**
 * SparkSessionExtensions entry point: registers every graft signature kernel
 * as a native SQL function, so the whole engine surface is reachable from
 * plain `spark.sql(...)` (and spark-submit `--conf
 * spark.sql.extensions=graft.GraftExtensions`) — the idiomatic Spark way to
 * ship third-party Catalyst expressions to a cluster.
 *
 * The builders produce the same codegen'd expressions the Column API uses
 * ([[graft.functions.GraftExpressions]]); static parameters (k, bands, seed…)
 * arrive as foldable SQL literals and are evaluated at resolution time.
 *
 * Reference analogue: the coder/method registry the reference wires by hand in
 * ea/sim/dev/scripts/training/training/common.py:47-74 — here it is one
 * extensions hook instead of an object graph.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Register the same functions into an already-running session (notebooks,
    * tests — anywhere the session predates the library on the classpath). */
  def register(spark: SparkSession): Unit = registrations.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  private def intOf(e: Expression, fn: String, what: String): Int = {
    require(e.foldable, s"$fn: $what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$fn: $what is out of Int range: $l") // no silent wrap (cf. longOf)
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  private def longOf(e: Expression, fn: String, what: String): Long = {
    require(e.foldable, s"$fn: $what must be a literal")
    e.eval() match {
      case i: Int  => i.toLong
      case l: Long => l // full 64-bit seeds must NOT truncate through Int
      case other   => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }
  }

  private def dblOf(e: Expression, fn: String, what: String): Double = {
    require(e.foldable, s"$fn: $what must be a literal")
    e.eval() match {
      case d: Double     => d
      case f: Float      => f.toDouble
      case dec: Decimal  => dec.toDouble
      case i: Int        => i.toDouble
      case l: Long       => l.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a numeric literal, got $other")
    }
  }

  private def arity(fn: String, args: Seq[Expression], min: Int, max: Int): Unit =
    require(args.size >= min && args.size <= max,
      s"$fn expects $min..$max arguments, got ${args.size}")

  private def seedArg(fn: String, args: Seq[Expression], at: Int): Long =
    if (args.size > at) longOf(args(at), fn, "seed") else 42L

  private def desc(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    reg("graft_shingles", "graft_shingles(tokens, k[, seed]) - k-shingle hashes") { args =>
      arity("graft_shingles", args, 2, 3)
      ShingleHashes(args.head, intOf(args(1), "graft_shingles", "k"),
        seedArg("graft_shingles", args, 2))
    },
    reg("graft_minhash", "graft_minhash(shingles, numHashes[, seed]) - MinHash signature") { args =>
      arity("graft_minhash", args, 2, 3)
      MinHashSignature(args.head, intOf(args(1), "graft_minhash", "numHashes"),
        seedArg("graft_minhash", args, 2))
    },
    reg("graft_oph", "graft_oph(shingles, numHashes[, seed]) - one-permutation MinHash signature (optimal densification)") { args =>
      arity("graft_oph", args, 2, 3)
      OphSignature(args.head, intOf(args(1), "graft_oph", "numHashes"),
        seedArg("graft_oph", args, 2))
    },
    reg("graft_oph_band_keys",
        "graft_oph_band_keys(shingles, numHashes, bands, rowsPerBand[, seed]) - fused OPH+LSH") { args =>
      arity("graft_oph_band_keys", args, 4, 5)
      OphBandKeys(args.head, intOf(args(1), "graft_oph_band_keys", "numHashes"),
        intOf(args(2), "graft_oph_band_keys", "bands"),
        intOf(args(3), "graft_oph_band_keys", "rowsPerBand"),
        seedArg("graft_oph_band_keys", args, 4))
    },
    reg("graft_simhash64", "graft_simhash64(tokenHashes[, seed]) - 64-bit SimHash") { args =>
      arity("graft_simhash64", args, 1, 2)
      SimHash64(args.head, seedArg("graft_simhash64", args, 1))
    },
    reg("graft_band_keys", "graft_band_keys(sig, bands, rowsPerBand[, seed]) - LSH band keys") { args =>
      arity("graft_band_keys", args, 3, 4)
      LshBandKeys(args.head, intOf(args(1), "graft_band_keys", "bands"),
        intOf(args(2), "graft_band_keys", "rowsPerBand"),
        seedArg("graft_band_keys", args, 3))
    },
    reg("graft_minhash_band_keys",
        "graft_minhash_band_keys(shingles, numHashes, bands, rowsPerBand[, seed]) - fused MinHash+LSH") { args =>
      arity("graft_minhash_band_keys", args, 4, 5)
      MinHashBandKeys(args.head, intOf(args(1), "graft_minhash_band_keys", "numHashes"),
        intOf(args(2), "graft_minhash_band_keys", "bands"),
        intOf(args(3), "graft_minhash_band_keys", "rowsPerBand"),
        seedArg("graft_minhash_band_keys", args, 4))
    },
    reg("graft_jaccard", "graft_jaccard(a, b) - exact Jaccard of two hash arrays") { args =>
      arity("graft_jaccard", args, 2, 2)
      JaccardSim(args.head, args(1))
    },
    reg("graft_lcs_length", "graft_lcs_length(a, b[, maxLen]) - longest-common-substring length") { args =>
      arity("graft_lcs_length", args, 2, 3)
      LcsLength(args.head, args(1),
        if (args.size > 2) intOf(args(2), "graft_lcs_length", "maxLen") else 2000)
    },
    reg("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors") { args =>
      arity("graft_cosine", args, 2, 2)
      CosineSim(args.head, args(1))
    },
    reg("graft_dot", "graft_dot(a, b) - inner product of two float vectors") { args =>
      arity("graft_dot", args, 2, 2)
      DotProduct(args.head, args(1))
    },
    reg("graft_vec_sub", "graft_vec_sub(a, b) - elementwise float-vector difference") { args =>
      arity("graft_vec_sub", args, 2, 2)
      VecSub(args.head, args(1))
    },
    reg("graft_srp_bucket", "graft_srp_bucket(vec, bits[, seed]) - sign-random-projection bucket") { args =>
      arity("graft_srp_bucket", args, 2, 3)
      SrpBucket(args.head, intOf(args(1), "graft_srp_bucket", "bits"),
        seedArg("graft_srp_bucket", args, 2))
    },
    reg("graft_phash_tokens", "graft_phash_tokens(phash) - positional byte-gram tokens") { args =>
      arity("graft_phash_tokens", args, 1, 1)
      PhashTokens(args.head)
    },
    reg("graft_phash_canonical", "graft_phash_canonical(phash) - min over the mirror/rotation orbit") { args =>
      arity("graft_phash_canonical", args, 1, 1)
      PhashCanonical(args.head)
    },
    reg("graft_phash_transpose", "graft_phash_transpose(phash) - 8x8 bit-grid transpose") { args =>
      arity("graft_phash_transpose", args, 1, 1)
      PhashTranspose(args.head)
    },
    reg("graft_phash_rot90", "graft_phash_rot90(phash) - 90-degree-clockwise grid rotation") { args =>
      arity("graft_phash_rot90", args, 1, 1)
      PhashRot90(args.head)
    },
    reg("graft_phash_canonical_d4",
        "graft_phash_canonical_d4(phash) - min over all eight dihedral grid symmetries") { args =>
      arity("graft_phash_canonical_d4", args, 1, 1)
      PhashCanonicalD4(args.head)
    },
    reg("graft_fingerprint", "graft_fingerprint(s[, seed]) - rolling polynomial fingerprint") { args =>
      arity("graft_fingerprint", args, 1, 2)
      RollingFingerprint(args.head, seedArg("graft_fingerprint", args, 1))
    },
    reg("graft_winnow_anchors",
        "graft_winnow_anchors(s, k, w[, seed]) - winnowed k-gram anchor hashes") { args =>
      arity("graft_winnow_anchors", args, 3, 4)
      WinnowAnchors(args.head, intOf(args(1), "graft_winnow_anchors", "k"),
        intOf(args(2), "graft_winnow_anchors", "w"),
        seedArg("graft_winnow_anchors", args, 3))
    },
    reg("graft_fast_align",
        "graft_fast_align(tokensA, tokensB[, gamma[, alpha]]) - FaST positional alignment score") { args =>
      arity("graft_fast_align", args, 2, 4)
      FastAlign(args.head, args(1),
        if (args.size > 2) dblOf(args(2), "graft_fast_align", "gamma") else 1.0,
        if (args.size > 3) dblOf(args(3), "graft_fast_align", "alpha") else 0.0)
    },
    // --- text-analysis surface: the Column compositions from
    // graft.functions, re-rooted on the SQL argument expressions (same
    // built-in codegen'd trees the Column API produces) ------------------
    reg("graft_normalize", "graft_normalize(s) - lowercase, strip non [a-z0-9 ], collapse spaces") { args =>
      arity("graft_normalize", args, 1, 1)
      resolvedExpression(normalize_text(column(args.head)))
    },
    reg("graft_tokens", "graft_tokens(s) - whitespace tokens of normalized text") { args =>
      arity("graft_tokens", args, 1, 1)
      resolvedExpression(tokens(column(args.head)))
    },
    reg("graft_content_hash", "graft_content_hash(s) - xxhash64 of normalized text") { args =>
      arity("graft_content_hash", args, 1, 1)
      resolvedExpression(content_hash(column(args.head)))
    },
    reg("graft_token_count", "graft_token_count(s) - single-space-separated token count of the raw string") { args =>
      arity("graft_token_count", args, 1, 1)
      resolvedExpression(token_count(column(args.head)))
    },
    reg("graft_subword_count", "graft_subword_count(s) - BPE-ish pre-tokenizer piece count") { args =>
      arity("graft_subword_count", args, 1, 1)
      resolvedExpression(subword_count(column(args.head)))
    },
    reg("graft_stopword_ratio", "graft_stopword_ratio(s) - fraction of stopword tokens") { args =>
      arity("graft_stopword_ratio", args, 1, 1)
      resolvedExpression(stopword_ratio(column(args.head)))
    },
    reg("graft_lang_id", "graft_lang_id(s[, threshold]) - stopword-density language ID") { args =>
      arity("graft_lang_id", args, 1, 2)
      resolvedExpression(lang_id(column(args.head),
        if (args.size > 1) dblOf(args(1), "graft_lang_id", "threshold") else 0.08))
    },
    reg("graft_quality", "graft_quality(s) - [0,1] length/punct/stopword quality score") { args =>
      arity("graft_quality", args, 1, 1)
      resolvedExpression(quality_score(column(args.head)))
    },
    reg("graft_distinct_token_ratio",
        "graft_distinct_token_ratio(s) - distinct/total whitespace-token ratio (repetition signal)") { args =>
      arity("graft_distinct_token_ratio", args, 1, 1)
      resolvedExpression(distinct_token_ratio(column(args.head)))
    },
    reg("graft_dup_bigram_frac",
        "graft_dup_bigram_frac(s) - duplicated-bigram fraction (repetition signal)") { args =>
      arity("graft_dup_bigram_frac", args, 1, 1)
      resolvedExpression(dup_bigram_frac(column(args.head)))
    },
    reg("graft_hamming64", "graft_hamming64(a, b) - Hamming distance of two 64-bit hashes") { args =>
      arity("graft_hamming64", args, 2, 2)
      resolvedExpression(hamming64(column(args.head), column(args(1))))
    },
    reg("graft_char_entropy",
        "graft_char_entropy(s) - Shannon entropy (bits/char) of the code-point distribution") { args =>
      arity("graft_char_entropy", args, 1, 1)
      CharEntropy(args.head)
    },
    reg("graft_icws",
        "graft_icws(hashes, numHashes[, seed]) - ICWS weighted-MinHash signature (repeats = weights)") { args =>
      arity("graft_icws", args, 2, 3)
      IcwsSignature(args.head, intOf(args(1), "graft_icws", "numHashes"),
        seedArg("graft_icws", args, 2))
    },
    reg("graft_weighted_jaccard",
        "graft_weighted_jaccard(a, b) - exact weighted Jaccard of two hash multisets") { args =>
      arity("graft_weighted_jaccard", args, 2, 2)
      WeightedJaccard(args.head, args(1))
    })

  private def reg(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name), desc(name, usage), builder)
}
