package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic STUB feature extractor over a binary media payload
  * (the Spark-side shape of a real embedding/feature kernel): an
  * 8-bin positional byte histogram, bin d = sum of unsigned byte
  * values at positions ≡ d (mod 8), computed in one codegen'd pass.
  *
  * A real extractor (image embedding, mel spectrogram) replaces the
  * loop body only — the column type, plan shape and partitioning are
  * identical. Exact integer output keeps the DuckDB oracle
  * (hex-substring byte extraction) bit-identical.
  */
case class ByteFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ByteFeatures.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ByteFeatures.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteFeatures {
  final val Bins = 8

  def compute(payload: Array[Byte]): GenericArrayData = {
    val sums = new Array[Long](Bins)
    var i = 0
    while (i < payload.length) {
      sums(i % Bins) += payload(i) & 0xffL
      i += 1
    }
    new GenericArrayData(sums)
  }
}

/** Deterministic mock embedding provider (reference src/embeddings.rs:222
  * MockEmbeddingProvider): dimension d vector with
  * v_i = fmod(byte(i mod len)/255 + i*0.01, 1) - 0.5, L2-normalized.
  * Double arithmetic on both engines (the DuckDB oracle replays the
  * identical fmod/normalize), computed in one codegen'd pass — the
  * batch "embedding provider" of this engine is a map over the corpus;
  * a real provider swaps the loop for a model call with the same
  * column contract.
  */
case class MockEmbedding(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MockEmbedding.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MockEmbedding.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Synthesize a REAL media container around a payload: a valid BMP
  * (image), PCM WAV (audio) or AVI RIFF (video) header followed by
  * the payload bytes as the data section. Header fields (dimensions,
  * frame count, sample rate, channels) are deterministic functions of
  * the payload length, so the oracle can predict them — but the Spark
  * query path recovers them by PARSING THE ACTUAL HEADER BYTES via
  * [[ParseMediaHeader]]: a wrong writer or reader breaks the hash
  * compare. This replaces the round-1 `n_bytes % 1280` pseudo-decode
  * with a genuine encode→decode round trip (the only remaining
  * synthetic step is the payload itself — the container has no
  * codecs, so pixel/sample data is stand-in text bytes; field offsets
  * and magics are the real formats').
  *
  * Note the formats' own limits apply: BMP/RIFF carry u32 sizes, so a
  * single asset is capped at 4 GiB — the same ceiling a real BMP/WAV/
  * AVI writer has.
  */
case class SynthMedia(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(payload: Any, mediaType: Any): Any =
    SynthMedia.compute(payload.asInstanceOf[Array[Byte]],
      mediaType.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, t) =>
      s"graft.functions.expressions.SynthMedia.compute($p, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SynthMedia {
  /** WAV sample-rate table indexed by payload length % 4. */
  final val Rates = Array(8000, 16000, 22050, 44100)
  final val BmpHeaderLen = 54
  final val WavHeaderLen = 44
  final val AviHeaderLen = 100

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }

  def compute(payload: Array[Byte],
              mediaType: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val n = payload.length
    val kind = if (mediaType.numBytes() > 0) mediaType.getByte(0) else 0
    kind match {
      case 'i' => bmp(payload, n % 1280 + 16, n % 720 + 9)
      case 'a' => wav(payload, Rates(n % 4), n % 2 + 1)
      case _   => avi(payload, n % 1280 + 16, n % 720 + 9, n % 30 + 1)
    }
  }

  /** BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40) + payload. */
  def bmp(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val n = payload.length
    val b = new Array[Byte](BmpHeaderLen + n)
    b(0) = 'B'; b(1) = 'M'
    putU32(b, 2, BmpHeaderLen + n.toLong) // bfSize
    putU32(b, 10, BmpHeaderLen)           // bfOffBits: pixel data offset
    putU32(b, 14, 40)                     // biSize
    putU32(b, 18, width)                  // biWidth (i32 LE)
    putU32(b, 22, height)                 // biHeight
    putU16(b, 26, 1)                      // biPlanes
    putU16(b, 28, 24)                     // biBitCount
    putU32(b, 34, n.toLong)               // biSizeImage
    putU32(b, 38, 2835); putU32(b, 42, 2835) // 72 dpi in px/m
    System.arraycopy(payload, 0, b, BmpHeaderLen, n)
    b
  }

  /** RIFF/WAVE with a 16-byte PCM fmt chunk + data chunk = payload. */
  def wav(payload: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
    val n = payload.length
    val b = new Array[Byte](WavHeaderLen + n)
    putTag(b, 0, "RIFF"); putU32(b, 4, 36L + n); putTag(b, 8, "WAVE")
    putTag(b, 12, "fmt "); putU32(b, 16, 16)
    putU16(b, 20, 1)                         // PCM
    putU16(b, 22, channels)
    putU32(b, 24, sampleRate)
    putU32(b, 28, sampleRate.toLong * channels * 2) // byte rate (16-bit)
    putU16(b, 32, channels * 2)              // block align
    putU16(b, 34, 16)                        // bits per sample
    putTag(b, 36, "data"); putU32(b, 40, n.toLong)
    System.arraycopy(payload, 0, b, WavHeaderLen, n)
    b
  }

  /** RIFF/'AVI ' + LIST hdrl{avih MainAVIHeader} + LIST movi = payload. */
  def avi(payload: Array[Byte], width: Int, height: Int, frames: Int): Array[Byte] = {
    val n = payload.length
    val b = new Array[Byte](AviHeaderLen + n)
    putTag(b, 0, "RIFF"); putU32(b, 4, 92L + n); putTag(b, 8, "AVI ")
    putTag(b, 12, "LIST"); putU32(b, 16, 68); putTag(b, 20, "hdrl")
    putTag(b, 24, "avih"); putU32(b, 28, 56)
    putU32(b, 32, 33333)        // dwMicroSecPerFrame (~30 fps)
    putU32(b, 48, frames.toLong)// dwTotalFrames
    putU32(b, 56, 1)            // dwStreams
    putU32(b, 64, width)        // dwWidth
    putU32(b, 68, height)       // dwHeight
    putTag(b, 88, "LIST"); putU32(b, 92, 4L + n); putTag(b, 96, "movi")
    System.arraycopy(payload, 0, b, AviHeaderLen, n)
    b
  }
}

/** Parse a media container header — the REAL decode step of the
  * multimodal pipeline. Dispatches on the file magic and reads the
  * format's actual field offsets:
  *
  *  - BMP  ("BM"): biWidth/biHeight at 18/22 (LE i32), bfOffBits-
  *    validated; frames = 1, data bytes = file − bfOffBits.
  *  - WAV  ("RIFF"+"WAVE"+"fmt "): channels@22, sample rate@24 and
  *    the data-chunk size@40 of the canonical 44-byte PCM layout.
  *  - AVI  ("RIFF"+"AVI "+"avih"): dwTotalFrames@48, dwWidth@64,
  *    dwHeight@68 of the MainAVIHeader; data bytes = movi size − 4.
  *
  * Output is a fixed 7-slot long array
  * [kind(0=image,1=audio,2=video,−1=unknown), width, height, frames,
  * sample_rate, channels, data_bytes] — flat longs keep the kernel
  * inside whole-stage codegen (a struct return would fall back to
  * interpreted InternalRow construction). Unknown/truncated input
  * yields kind = −1 with zeros, never a crash: at 100 TB some assets
  * WILL be corrupt and a decode that poisons the whole task is wrong.
  */
case class ParseMediaHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ParseMediaHeader.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.ParseMediaHeader.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseMediaHeader {
  final val Kind = 0; final val Width = 1; final val Height = 2
  final val Frames = 3; final val SampleRate = 4; final val Channels = 5
  final val DataBytes = 6

  private def u16(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], off: Int): Long = u32(b, off).toInt.toLong
  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b(off) == t.charAt(0) && b(off + 1) == t.charAt(1) &&
      b(off + 2) == t.charAt(2) && b(off + 3) == t.charAt(3)

  def compute(b: Array[Byte]): GenericArrayData = {
    val out = new Array[Long](7)
    out(Kind) = -1L
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M' && u32(b, 14) == 40) {
      val offBits = u32(b, 10)
      if (offBits >= 54 && offBits <= b.length) {
        out(Kind) = 0; out(Width) = i32(b, 18); out(Height) = i32(b, 22)
        out(Frames) = 1; out(DataBytes) = b.length - offBits
      }
    } else if (b.length >= 44 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE") &&
               tag(b, 12, "fmt ") && tag(b, 36, "data")) {
      out(Kind) = 1; out(Channels) = u16(b, 22); out(SampleRate) = u32(b, 24)
      out(DataBytes) = u32(b, 40)
    } else if (b.length >= 100 && tag(b, 0, "RIFF") && tag(b, 8, "AVI ") &&
               tag(b, 12, "LIST") && tag(b, 24, "avih") && tag(b, 96, "movi")) {
      out(Kind) = 2; out(Frames) = u32(b, 48)
      out(Width) = u32(b, 64); out(Height) = u32(b, 68)
      out(DataBytes) = u32(b, 92) - 4
    }
    new GenericArrayData(out)
  }
}

object MockEmbedding {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, dim: Int): GenericArrayData = {
    val bytes = text.getBytes
    val v = new Array[Double](dim)
    if (bytes.length > 0) {
      var i = 0
      while (i < dim) {
        v(i) = ((bytes(i % bytes.length) & 0xff) / 255.0 + i * 0.01) % 1.0 - 0.5
        i += 1
      }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += v(j) * v(j); j += 1 }
      norm = math.sqrt(norm)
      if (norm > 0.0) {
        var k = 0
        while (k < dim) { v(k) /= norm; k += 1 }
      }
    }
    new GenericArrayData(v)
  }
}

/** 60-bit perceptual average-hash (aHash) over a media container's
  * DATA region — the content-sensitive near-dup signal of image/media
  * curation (classic aHash: downsample, threshold each cell against
  * the global mean). The container header is parsed for real (same
  * magic dispatch as [[ParseMediaHeader]]) to locate the data region;
  * the region's bytes are bucketed into 60 contiguous cells
  * (cell(j) = 60·j div n), and bit i is set iff cell i's integer mean
  * exceeds the global integer mean. 60 bits keep the value inside a
  * positive BIGINT on both engines (the hash60 convention), and every
  * step is integer arithmetic — bit-identical cross-engine, so the
  * hash is fully DuckDB-oracle-checkable from the synthesis formula.
  * Identical data ⇒ identical hash; a small perturbation moves only
  * its cell's mean (plus, rarely, the global mean) ⇒ small Hamming
  * distance — the property MultimodalSpec pins. Undecodable or empty
  * input hashes to −1 (never a poison-the-task crash).
  */
case class MediaAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    MediaAHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.MediaAHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaAHash {
  final val Cells = 60

  def compute(b: Array[Byte]): Long = {
    // ONE source of truth for what is decodable: the same header
    // parse the metadata path uses — a container ParseMediaHeader
    // rejects (bad bfOffBits, missing fmt/data/avih tags) must hash
    // to the -1 degrade too, never to a hash over header noise
    val h = ParseMediaHeader.compute(b)
    val kind = h.getLong(ParseMediaHeader.Kind)
    if (kind == -1L) return -1L
    val off =
      if (kind == 0L) (b.length - h.getLong(ParseMediaHeader.DataBytes)).toInt
      else if (kind == 1L) SynthMedia.WavHeaderLen
      else SynthMedia.AviHeaderLen
    val n = math.min(h.getLong(ParseMediaHeader.DataBytes),
      (b.length - off).toLong).toInt
    hashRange(b, off, n)
  }

  /** The 60-cell threshold hash over bytes [start, start+n) — shared
    * by the whole-asset hash and [[FrameHashes]]' per-frame slices.
    */
  def hashRange(b: Array[Byte], start: Int, n: Int): Long = {
    if (n <= 0) return -1L
    val sums = new Array[Long](Cells)
    val counts = new Array[Long](Cells)
    var total = 0L
    var j = 0
    while (j < n) {
      val v = b(start + j) & 0xffL
      val cell = ((Cells.toLong * j) / n).toInt
      sums(cell) += v; counts(cell) += 1; total += v
      j += 1
    }
    val gmean = total / n
    var hash = 0L
    var i = 0
    while (i < Cells) {
      if (counts(i) > 0 && sums(i) / counts(i) > gmean) hash |= 1L << i
      i += 1
    }
    hash
  }
}

/** Per-frame 60-bit average-hashes of an AVI asset: the movi data is
  * split into the equal-length frame slices the header's
  * dwTotalFrames declares (the [[graft.operators.Multimodal
  * .frameSample]] byte-range convention — trailing remainder bytes
  * belong to no frame) and each slice is hashed with
  * [[MediaAHash.hashRange]]. Consecutive-frame Hamming distances are
  * the scene-cut signal video curation thresholds (shot detection for
  * frame dedup / clip segmentation). Non-AVI input, zero frames or
  * slices shorter than one byte yield an EMPTY array — degrade, never
  * crash.
  */
case class FrameHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    FrameHashes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.FrameHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameHashes {
  def compute(b: Array[Byte]): GenericArrayData = {
    val empty = new GenericArrayData(Array.empty[Any])
    // same decodability contract as the metadata path (see MediaAHash)
    val h = ParseMediaHeader.compute(b)
    if (h.getLong(ParseMediaHeader.Kind) != 2L) return empty
    val frames = h.getLong(ParseMediaHeader.Frames)
    val off = SynthMedia.AviHeaderLen
    val dataBytes = math.min(h.getLong(ParseMediaHeader.DataBytes),
      (b.length - off).toLong)
    if (frames <= 0 || dataBytes <= 0) return empty
    val fb = (dataBytes / frames).toInt
    if (fb <= 0) return empty
    val out = new Array[Long](frames.toInt)
    var k = 0
    while (k < frames) {
      out(k) = MediaAHash.hashRange(b, off + k * fb, fb)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** PCM audio energy analysis over a WAV container — the real
  * arithmetic of speech-data curation's silence/energy gates (VAD
  * front-ends, silence trimming, loudness filtering): the data chunk
  * is decoded as signed 16-bit little-endian samples (the actual PCM
  * wire format the header declares), bucketed into [[PcmEnergy.Win]]-
  * sample windows, and each window's integer mean-square energy is
  * compared to [[PcmEnergy.SilenceMeanSq]]. All sums are exact longs
  * (i16² ≤ 2³⁰, billions of samples away from overflow), so every
  * output slot is DuckDB-oracle-checkable. Output
  * [n_samples, n_windows, silent_windows, total_sum_sq]; non-WAV or
  * sample-less input yields [0,0,0,0] — corrupt assets degrade, never
  * crash the task.
  */
case class PcmEnergy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PcmEnergy.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PcmEnergy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmEnergy {
  /** Samples per analysis window (~16 ms at 16 kHz). */
  final val Win = 256
  /** A window is silent below this integer mean-square energy. */
  final val SilenceMeanSq = 1000000L

  def compute(b: Array[Byte]): GenericArrayData = {
    val out = new Array[Long](4)
    val isWav = b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
    if (!isWav || b.length < 46) return new GenericArrayData(out)
    val off = SynthMedia.WavHeaderLen
    val nSamples = (b.length - off) / 2
    if (nSamples == 0) return new GenericArrayData(out)
    var total = 0L
    var winSum = 0L
    var silent = 0L
    var windows = 0L
    var j = 0
    while (j < nSamples) {
      val lo = b(off + 2 * j) & 0xff
      val hi = b(off + 2 * j + 1).toInt // sign-carrying high byte
      val v = ((hi << 8) | lo).toShort.toLong
      winSum += v * v
      total += v * v
      if ((j + 1) % Win == 0 || j == nSamples - 1) {
        val len = if ((j + 1) % Win == 0) Win else (j + 1) % Win
        windows += 1
        if (winSum / len < SilenceMeanSq) silent += 1
        winSum = 0L
      }
      j += 1
    }
    out(0) = nSamples; out(1) = windows; out(2) = silent; out(3) = total
    new GenericArrayData(out)
  }
}
