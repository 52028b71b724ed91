package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass document fingerprint sketch (winnowing-style, reference
  * grape-vector-db src/lib.rs document identity + dedup surface):
  * rolling 8-char gram hashes reduced to (min gram hash, distinct
  * gram count) in a single scan of the text.
  *
  * The gram hash is a plain polynomial over character codes,
  * h(g) = sum c_j * 131^(L-1-j), with no modulus: for L <= 8 and
  * ASCII codes the sum stays below 2^58, so the identical integer
  * arithmetic is exact in Java and in the DuckDB oracle (ascii() *
  * BIGINT power literals). This replaces an exploded one-row-per-gram
  * md5 pipeline (explode + 1.5M md5/hex/conv per 5k docs + groupBy
  * shuffle) with a zero-shuffle map: O(len) work per document, no
  * Generate, no aggregation — the operator scales as a pure map at
  * any corpus size.
  *
  * Returns array<long> of [min_gram_hash, n_distinct_grams].
  */
case class GramFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.GramFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared JVM twin of the relational tokenizer
  * (TextFunctions.tokens): lowercase, strip non-[a-z0-9 ], split on
  * single spaces, drop len<=1 and stopwords. Byte-identical output to
  * the Column formulation (verified in TextAnalysisSpec /
  * DedupSpec) so native and relational pipelines interoperate.
  */
private[graft] object Tok {
  val StopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.functions.TextFunctions.StopWords.foreach(s.add)
    s
  }

  /** md5 per thread — getInstance per call is measurable at millions
    * of rows.
    */
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 — identical to TextFunctions.hash60
    * (first 15 lowercase-hex chars parsed base 16 = first 8 big-endian
    * bytes >>> 4).
    */
  def hash60(s: String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Tokenize into the normalized term sequence (order kept,
    * duplicates kept).
    */
  def tokens(text: String): java.util.ArrayList[String] = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') sb.append(c)
      i += 1
    }
    val out = new java.util.ArrayList[String]()
    var start = 0
    val s = sb
    val n = s.length
    var j = 0
    while (j <= n) {
      if (j == n || s.charAt(j) == ' ') {
        if (j - start > 1) {
          val t = s.substring(start, j)
          if (!StopSet.contains(t)) out.add(t)
        }
        start = j + 1
      }
      j += 1
    }
    out
  }
}

/** Per-document 60-bit weighted SimHash computed in one pass
  * (tokenize + term frequencies + md5 + 60 weighted bit sums), packed
  * as [lo 32 bits, hi 28 bits]. NULL when the document has no tokens
  * (parity with the relational `WHERE len(toks) > 0`).
  *
  * Replaces an explode + two-shuffle + 60-aggregate relational
  * pipeline with a zero-shuffle map; values are bit-identical (same
  * tokenizer, same md5-derived term hash, same `sum > 0` bit rule;
  * reference semantics grape-vector-db src/sparse.rs tokenizer +
  * simhash-style dedup surface).
  */
case class SimHashWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashWords.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.freshName("shw")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $v =
         |  graft.functions.expressions.SimHashWords.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashWords {
  final val Bits = 60

  def compute(text: UTF8String): GenericArrayData = {
    val toks = Tok.tokens(text.toString)
    if (toks.isEmpty) return null
    val tf = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.size) {
      tf.merge(toks.get(i), 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    val sums = new Array[Long](Bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = Tok.hash60(e.getKey)
      val w = e.getValue.toLong
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) sums(b) += w else sums(b) -= w
        b += 1
      }
    }
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < 32) { if (sums(b) > 0) lo |= (1L << b); b += 1 }
    while (b < Bits) { if (sums(b) > 0) hi |= (1L << (b - 32)); b += 1 }
    new GenericArrayData(Array(lo, hi))
  }
}

/** Distinct hashed 3-token shingles of a document in one pass:
  * tokenize, string-distinct the space-joined n-grams, then
  * hash60 % p per distinct shingle (duplicate HASH values are kept if
  * distinct strings collide — exact parity with the relational
  * `array_distinct(shingles)` → md5 pipeline and its DuckDB oracle).
  *
  * The relational formulation costs a posexplode Generate, a window
  * (lead) shuffle and a distinct shuffle over one row per token;
  * this is a map — the only remaining shuffle in minhash/ngram dedup
  * is the one keyed by the posting itself.
  */
case class ShingleHashes(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ShingleHashes.compute($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(text: UTF8String, n: Int, mod: Long): GenericArrayData = {
    val toks = Tok.tokens(text.toString)
    val nSh = toks.size - (n - 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < nSh) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = Tok.hash60(it.next()) % mod; k += 1 }
    new GenericArrayData(out)
  }
}

object GramFingerprint {
  final val Base = 131L
  final val Width = 8

  /** 131^0 .. 131^7 */
  private final val Pow: Array[Long] = {
    val p = new Array[Long](Width)
    p(0) = 1L
    var i = 1
    while (i < Width) { p(i) = p(i - 1) * Base; i += 1 }
    p
  }

  /** Static so generated code calls it directly (one invokestatic per
    * row inside whole-stage codegen).
    *
    * Each UTF-16 code unit is folded into 0..127 (`& 0x7F`) before the
    * polynomial, so every intermediate is provably < 2^57 for ANY
    * input — a raw code unit (<= 0xFFFF) times 131^7 would silently
    * wrap Long here while the DuckDB twin's BIGINT raises, and the
    * cross-engine hashes would diverge. The oracle applies the same
    * `% 128`. The exactness contract remains ASCII-only: for
    * supplementary characters Java charAt iterates UTF-16 units while
    * DuckDB substr iterates codepoints, so gram boundaries differ —
    * the fold just makes non-ASCII input safe and deterministic
    * per-engine rather than crash-or-wrap.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val len = s.length
    val nGrams = math.max(len - (Width - 1), 1)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val gLen = math.min(Width, len - i)
      var h = 0L
      var j = 0
      while (j < gLen) {
        h += (s.charAt(i + j) & 0x7F).toLong * Pow(gLen - 1 - j)
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var distinct = if (nGrams > 0) 1L else 0L
    var k = 1
    while (k < nGrams) {
      if (hashes(k) != hashes(k - 1)) distinct += 1L
      k += 1
    }
    new GenericArrayData(Array(if (nGrams > 0) hashes(0) else 0L, distinct))
  }
}
