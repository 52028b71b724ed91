package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the native kernels
  * as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")`
  * plans the same fused codegen expressions the DataFrame API uses —
  * the whole scalar surface of the engine is reachable from pure SQL
  * — and injects the reference QueryOptimizer's LimitMaxResults as a
  * Catalyst rewrite ([[graft.plans.CapResultLimit]]).
  *
  * Wire up via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int =
    if (e.foldable) e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn expects a constant integer argument, got $other")
    } else throw new IllegalArgumentException(
      s"$fn expects a constant integer argument")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_])(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    register("cosine_sim", classOf[CosineSim])(a => CosineSim(a(0), a(1)))
    register("dot_prod", classOf[DotProd])(a => DotProd(a(0), a(1)))
    // text sketches: one-pass tokenize + sketch kernels
    register("simhash64", classOf[SimHashWords])(a => SimHashWords(a(0)))
    register("gram_fingerprint", classOf[GramFingerprint])(a => GramFingerprint(a(0)))
    register("repetition_stats", classOf[RepetitionStats])(a => RepetitionStats(a(0)))
    register("term_freqs", classOf[TermFreqs])(a => TermFreqs(a(0)))
    register("shingles", classOf[ShingleStrings])(a =>
      ShingleStrings(a(0), intArg(a(1), "shingles")))
    // embedding provider + byte features
    register("mock_embed", classOf[MockEmbedding])(a =>
      MockEmbedding(a(0), intArg(a(1), "mock_embed")))
    register("byte_features", classOf[ByteFeatures])(a => ByteFeatures(a(0)))
    // media content kernels: container parse + per-modality signals
    register("parse_media", classOf[ParseMediaHeader])(a => ParseMediaHeader(a(0)))
    register("media_ahash", classOf[MediaAHash])(a => MediaAHash(a(0)))
    register("pcm_energy", classOf[PcmEnergy])(a => PcmEnergy(a(0)))
    register("frame_hashes", classOf[FrameHashes])(a => FrameHashes(a(0)))
    ext.injectOptimizerRule(_ => graft.plans.CapResultLimit)
    ext.injectOptimizerRule(_ => graft.plans.MinSimilarityThreshold)
  }
}
