package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions._

/** SparkSessionExtensions wiring: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * same fused operators as the DataFrame API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * No custom planner strategies or optimizer rules are injected: every
  * operator of the reference (and of the LLM-ops extension surface)
  * composes from Catalyst built-ins plus these scalar expressions, so a
  * custom LogicalPlan/SparkPlan would add ceremony, not capability —
  * the documented (a)>(b)>(c) preference order applied.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
}

object GraftExtensions {

  /** Register into an already-built session (withExtensions only applies
    * at build time; this path serves notebooks/tests on a live session).
    *
    * The typed Aggregators go through the session UDF registry instead
    * of the FunctionRegistry — an Aggregator carries its encoders,
    * which `functions.udaf` packages and an `Expression` builder
    * cannot. SQL can't pass constructor parameters, so each registers
    * at a named default capacity/k; other sizes stay a DataFrame-API
    * call away.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }
    import org.apache.spark.sql.{functions => F, Encoders}
    spark.udf.register("frequent_tokens_1k",
      F.udaf(new graft.functions.FrequentTokens(1024), Encoders.STRING))
    spark.udf.register("topk10_by_score",
      F.udaf(new graft.functions.TopKByScore(10),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)))
    spark.udf.register("cms_merge_agg",
      F.udaf(new graft.functions.CmsMerge, Encoders.BINARY))
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("char_ngram_set", "_FUNC_(str, n) - distinct character n-grams of str",
      args => CharNgramSet(args.head, intArg(args(1), "n"))),
    ("char_ngram_hash_set", "_FUNC_(str, n) - sorted distinct 32-bit md5 hashes of the n-grams",
      args => CharNgramHashSet(args.head, intArg(args(1), "n"))),
    ("minhash_sig", "_FUNC_(shingles, k) - k-hash MinHash signature of a string array",
      args => MinHashSig(args.head, intArg(args(1), "k"))),
    ("simhash16", "_FUNC_(tokens) - 16-bit SimHash of a token array",
      args => SimHash16(args.head)),
    ("simhash60", "_FUNC_(tokens) - 60-bit SimHash of a token array",
      args => SimHash60(args.head)),
    ("minhash_sig_from_hashes", "_FUNC_(hashes, k) - k-hash MinHash signature from precomputed base hashes",
      args => MinHashSigFromHashes(args.head, intArg(args(1), "k"))),
    ("token_max_freq", "_FUNC_(tokens) - highest occurrence count of any element",
      args => TokenMaxFreq(args.head)),
    ("jaccard_long_sets", "_FUNC_(a, b) - Jaccard similarity of two distinct long arrays",
      args => JaccardLongSets(args.head, args(1))),
    ("cosine_similarity", "_FUNC_(a, b) - cosine similarity of two float vectors",
      args => CosineSimilarity(args.head, args(1))),
    ("lsh_plane_signatures", "_FUNC_(vec, tables, planes) - multi-table hyperplane LSH bucket keys",
      args => LshPlaneSignatures(args.head,
        intArg(args(1), "tables"), intArg(args(2), "planes"))),
    ("unicode_normalize", "_FUNC_(str, form) - Unicode-normalize str to NFC/NFD/NFKC/NFKD",
      args => UnicodeNormalize(args.head, strArg(args(1), "form"))),
    ("word_ngram_hash_set", "_FUNC_(tokens, n) - sorted distinct 60-bit md5 hashes of the word n-grams",
      args => WordNgramHashSet(args.head, intArg(args(1), "n"))),
    ("word_chunk_hashes", "_FUNC_(tokens, n) - 60-bit md5 hashes of the stride-n token chunks, in order",
      args => WordChunkHashes(args.head, intArg(args(1), "n"))),
    ("winnowed_fingerprints", "_FUNC_(tokens, n, w) - sorted distinct winnowed (MOSS) minima of the 60-bit n-gram hashes over sliding w-windows",
      args => WinnowedFingerprints(args.head, intArg(args(1), "n"),
        intArg(args(2), "w"))),
    ("cms_estimate_long", "_FUNC_(sketch, key) - Count-Min point-frequency estimate for a BIGINT key",
      args => CmsEstimateLong(args.head, args(1))),
    ("whitespace_tokens", "_FUNC_(str) - whitespace tokens; equals split(trim(str), '\\\\s+')",
      args => WhitespaceTokens(args.head)),
    ("whitespace_collapse", "_FUNC_(str) - whitespace runs collapsed; equals regexp_replace(trim(str), '\\\\s+', ' ')",
      args => WhitespaceCollapse(args.head)))

  private def strArg(e: Expression, name: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }
}
