package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata structs.
  *
  * Header metadata ([[sniffMediaMeta]]) and PCM audio
  * ([[wavSampleStats]]) are parsed for REAL in pure column algebra;
  * image pixel decode/resize is REAL via the JDK's built-in codecs
  * ([[MediaCodec]]). Only the original hash-fake kernels
  * ([[withMediaMeta]]/[[decodeToFeatures]]/[[resizeMedia]]) remain as
  * the oracle-checkable plumbing contract, and video keyframe
  * extraction stays a byte-range stub (the JDK ships no video codec).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** 48-bit positive hash of a binary payload: the leading 12 hex
    * nibbles of md5, as a long. Engine-portable (any engine with md5 +
    * substring reproduces it), which is what lets the stubbed fakes
    * below be oracle-checked. */
  private def md5Bits48(c: Column, salt: String = ""): Column = {
    val salted = if (salt.isEmpty) c else concat(c, lit(salt).cast("binary"))
    conv(substring(md5(salted), 1, 12), 16, 10).cast("long")
  }

  /** Extended metadata schema emitted by [[sniffMediaMeta]] — the REAL
    * header parser. Audio fields are null for images and vice versa. */
  val sniffedMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  // ---- byte-level readers over a binary column: hex()+conv() of a
  // byte-range substring. All codegen'd builtins — no UDF, so the
  // sniff stays inside whole-stage codegen at 100 TB scan width. ----

  /** Big-endian unsigned int of `len` bytes at 1-based `pos`, as LONG —
    * a 4-byte field can carry up to 2^32-1, which overflows an ANSI
    * INT cast on corrupt/adversarial headers (fuzz-found). */
  private def beUint(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned int of `len` bytes at 1-based `pos`, as LONG. */
  private def leUint(bin: Column, pos: Int, len: Int): Column = {
    val bytes = (pos + len - 1 to pos by -1).map(p => hex(substring(bin, p, 1)))
    conv(concat(bytes: _*), 16, 10).cast("long")
  }

  /** Bounded int view of an unsigned header field: null (not a thrown
    * ANSI overflow) when the bytes claim a value beyond Int.MaxValue. */
  private def intSafe(c: Column): Column =
    when(c <= lit(Int.MaxValue.toLong), c.cast("int"))

  private def magic(bin: Column, pos: Int, hexBytes: String): Column =
    hex(substring(bin, pos, hexBytes.length / 2)) === lit(hexBytes.toUpperCase)

  // ---- int → byte-string encoders (builders for binary fixtures and
  // re-encoded headers; inverse of the readers above) ----
  def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  def le16(c: Column): Column = {
    val s = lpad(hex(c), 4, "0")
    unhex(concat(substring(s, 3, 2), substring(s, 1, 2)))
  }
  def le32(c: Column): Column = {
    val s = lpad(hex(c), 8, "0")
    unhex(concat(substring(s, 7, 2), substring(s, 5, 2),
      substring(s, 3, 2), substring(s, 1, 2)))
  }

  /** JPEG dimension scan: walk the segment chain from byte 3 (after
    * SOI ff d8) for at most `maxSegments` hops, each hop reading the
    * marker and its 2-byte big-endian length, until a SOF marker
    * (ffc0-ffcf minus DHT/DAC/RST) yields height at +5 and width at
    * +7. A fold over `sequence(1, maxSegments)` — bounded, branch-free
    * per row, whole-stage-codegen'd. Returns struct(w, h), null if no
    * SOF inside the bound (real JPEG headers fit well under 32
    * segments before scan data). */
  private def jpegDims(bin: Column, maxSegments: Int): Column = {
    val nullI = lit(null).cast("int")
    val init = struct(lit(3).as("pos"), nullI.as("w"), nullI.as("h"))
    val folded = aggregate(sequence(lit(1), lit(maxSegments)), init, (st, _) => {
      val pos = st.getField("pos")
      val mk = hex(bin.substr(pos, lit(2)))
      val isSof = mk.isin("FFC0", "FFC1", "FFC2", "FFC3", "FFC5", "FFC6",
        "FFC7", "FFC9", "FFCA", "FFCB", "FFCD", "FFCE", "FFCF")
      // markers with no length payload, or start-of-scan → stop
      val stop = mk.isin("FFD8", "FFD9", "FFDA", "FF01") ||
        mk.between("FFD0", "FFD7")
      val segLen = conv(hex(bin.substr(pos + lit(2), lit(2))), 16, 10).cast("int")
      val dead = pos.isNull || pos < 0 || st.getField("w").isNotNull ||
        pos + 1 > length(bin)
      when(dead, st)
        // the h/w fields span pos+5..pos+8 — a JPEG truncated inside
        // them must yield null, not dims fabricated from partial bytes
        .when(isSof && pos + lit(8) <= length(bin), struct(pos.as("pos"),
          conv(hex(bin.substr(pos + lit(7), lit(2))), 16, 10).cast("int").as("w"),
          conv(hex(bin.substr(pos + lit(5), lit(2))), 16, 10).cast("int").as("h")))
        .when(isSof, struct(lit(-1).as("pos"), nullI.as("w"), nullI.as("h")))
        .when(mk.startsWith("FF") && !stop && segLen >= lit(2),
          struct((pos + segLen + lit(2)).as("pos"), nullI.as("w"), nullI.as("h")))
        .otherwise(struct(lit(-1).as("pos"), nullI.as("w"), nullI.as("h")))
    })
    struct(folded.getField("w").as("w"), folded.getField("h").as("h"))
  }

  /** REAL header sniffer: parse media type and dimensions straight from
    * the payload bytes — no media libs needed, the container formats'
    * headers are fixed-offset integers:
    *   PNG  `89 50 4e 47 0d 0a 1a 0a` → IHDR width/height BE u32 at 17/21
    *   GIF  `GIF87a|GIF89a`           → width/height LE u16 at 7/9
    *   BMP  `BM` + DIB header size    → width/height LE u32 at 19/23
    *   JPEG `ff d8` → bounded segment scan to SOF (see [[jpegDims]])
    *   WAV  `RIFF....WAVE` → channels LE u16 at 23, rate LE u32 at 25
    * Anything else → `application/octet-stream`, null dims. This backs
    * `mm_sniff_meta`; the pixel DECODE stays stubbed (no media libs in
    * the container) — header metadata is real. */
  def sniffMediaMeta(df: DataFrame, binCol: String,
                     maxJpegSegments: Int = 32): DataFrame = {
    val bin = col(binCol)
    val n = length(bin).cast("long")
    val nullI = lit(null).cast("int")
    val isPng = n >= 29 && magic(bin, 1, "89504E470D0A1A0A")
    val isGif = n >= 10 &&
      (magic(bin, 1, "474946383761") || magic(bin, 1, "474946383961"))
    val isBmp = n >= 26 && magic(bin, 1, "424D") &&
      leUint(bin, 15, 4).isin(40, 52, 56, 64, 108, 124)
    val isJpeg = n >= 4 && magic(bin, 1, "FFD8")
    val isWav = n >= 44 && magic(bin, 1, "52494646") && magic(bin, 9, "57415645")
    val isAvi = n >= 12 && magic(bin, 1, "52494646") && magic(bin, 9, "41564920")
    val isMp4 = n >= 12 && magic(bin, 5, "66747970") // <size>ftyp
    val jd = jpegDims(bin, maxJpegSegments)
    def meta(tpe: String, w: Column, h: Column, rate: Column, ch: Column) =
      struct(lit(tpe).as("media_type"), w.as("width"), h.as("height"),
        rate.as("sample_rate"), ch.as("channels"), n.as("n_bytes"))
    df.withColumn("media_meta",
      when(isPng, meta("image/png", intSafe(beUint(bin, 17, 4)), intSafe(beUint(bin, 21, 4)), nullI, nullI))
        .when(isGif, meta("image/gif", leUint(bin, 7, 2).cast("int"), leUint(bin, 9, 2).cast("int"), nullI, nullI))
        .when(isBmp, meta("image/bmp", intSafe(leUint(bin, 19, 4)),
          // biHeight is SIGNED: negative = top-down row order (a
          // standard GDI encoding), magnitude is the pixel height
          intSafe(abs(when(leUint(bin, 23, 4) >= lit(2147483648L),
            leUint(bin, 23, 4) - lit(4294967296L)).otherwise(leUint(bin, 23, 4)))),
          nullI, nullI))
        .when(isJpeg, meta("image/jpeg", jd.getField("w"), jd.getField("h"), nullI, nullI))
        .when(isWav, meta("audio/wav", nullI, nullI, intSafe(leUint(bin, 25, 4)), leUint(bin, 23, 2).cast("int")))
        // container TYPE only — dims/duration via videoMetaKernel's walk
        .when(isAvi, meta("video/avi", nullI, nullI, nullI, nullI))
        .when(isMp4, meta("video/mp4", nullI, nullI, nullI, nullI))
        .otherwise(meta("application/octet-stream", nullI, nullI, nullI, nullI)))
  }

  /** REAL PCM audio decode in pure column algebra: canonical 44-byte
    * WAV header, 16-bit little-endian samples. Each sample is two
    * hex()'d bytes reassembled with conv(); the whole pass is ONE
    * `aggregate(sequence(...))` fold per row carrying
    * (sum, sum-of-squares, zero-crossings, previous sample) — stats
    * without exploding to a row per sample, fully inside whole-stage
    * codegen, no UDF. Emits `wav_stats` struct(n_samples, mean_amp,
    * rms, zero_crossings); nulls when the payload is not a canonical
    * WAV. `maxSamples` bounds per-row work (first-k samples — a
    * fingerprint, not a full scan; raise it for full-file stats). */
  def wavSampleStats(df: DataFrame, binCol: String,
                     maxSamples: Int = 4096): DataFrame = {
    val bin = col(binCol)
    val isWav = length(bin) >= 44 && magic(bin, 1, "52494646") && magic(bin, 9, "57415645")
    // dataSize is a long read (a corrupt 4-byte field can claim up to
    // 2^32-1); bound by maxSamples BEFORE narrowing to int
    val dataSize = leUint(bin, 41, 4)
    val n = least(shiftright(dataSize, 1), lit(maxSamples.toLong),
      shiftright((length(bin) - lit(44)).cast("long"), 1)).cast("int")
    // sample i (1-based) is LE int16 at byte 45 + 2(i-1) = 43 + 2i
    def sampleAt(i: Column): Column = {
      val raw = conv(concat(hex(bin.substr(lit(44) + i * 2, lit(1))),
        hex(bin.substr(lit(43) + i * 2, lit(1)))), 16, 10).cast("int")
      when(raw >= 32768, raw - 65536).otherwise(raw)
    }
    val nullI = lit(null).cast("int")
    val init = struct(lit(0L).as("s"), lit(0.0).as("ss"),
      lit(0).as("zc"), nullI.as("prev"))
    val folded = aggregate(sequence(lit(1), greatest(n, lit(0))), init, (acc, i) => {
      val v = sampleAt(i)
      struct((acc.getField("s") + v).as("s"),
        (acc.getField("ss") + v.cast("double") * v).as("ss"),
        (acc.getField("zc") + when(acc.getField("prev").isNotNull &&
          ((acc.getField("prev") >= 0) =!= (v >= 0)), 1).otherwise(0)).as("zc"),
        v.as("prev"))
    })
    df.withColumn("wav_stats",
      when(isWav && n > 0, struct(
        n.cast("long").as("n_samples"),
        (folded.getField("s").cast("double") / n).as("mean_amp"),
        sqrt(folded.getField("ss") / n).as("rms"),
        folded.getField("zc").cast("long").as("zero_crossings"))))
  }

  /** Parsed video-container metadata (header-only — no frame decode). */
  case class VideoMeta(media_type: String, width: Int, height: Int,
                       duration_ms: Long, n_frames: Option[Long])

  /** REAL video container metadata: walk MP4 boxes (ftyp…moov →
    * mvhd/trak→tkhd) or AVI RIFF chunks (LIST hdrl → avih) straight
    * off the bytes — dimensions and duration without any video codec
    * (the frame DECODE stays stubbed; the JDK ships no video codec,
    * and routing/filtering a 100 TB multimodal corpus needs exactly
    * this header metadata). Imperative kernel like [[wavStatsKernel]];
    * bounded walks (≤64 boxes), null on anything malformed. */
  def videoMetaKernel(bytes: Array[Byte]): VideoMeta =
    try videoMetaWalk(bytes)
    catch { case scala.util.control.NonFatal(_) => null }
    // belt-and-braces: the walk guards its offsets, but one adversarial
    // container pattern the guards miss must degrade to null, not fail
    // the task (same contract as MediaCodec.decodeStats)

  private def videoMetaWalk(bytes: Array[Byte]): VideoMeta = {
    if (bytes == null || bytes.length < 16) return null
    def be32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def le32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "ISO-8859-1")

    if (tag(0) == "RIFF" && tag(8) == "AVI ") {
      // walk RIFF chunks; descend into LIST hdrl; read the 56-byte avih
      var pos = 12
      var hops = 0
      while (pos + 8 <= bytes.length && hops < 64) {
        hops += 1
        val id = tag(pos)
        val sz = le32(pos + 4)
        if (sz < 0) return null
        if (id == "LIST" && tag(pos + 8) == "hdrl") {
          pos += 12 // descend
        } else if (id == "avih" && sz >= 40) {
          val usPerFrame = le32(pos + 8)
          val nFrames = le32(pos + 8 + 16)
          val w = le32(pos + 8 + 32)
          val h = le32(pos + 8 + 36)
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
          // both fields are untrusted u32 reads: bound before the
          // multiply (0xFFFFFFFF * 0xFFFFFFFF overflows Long)
          if (usPerFrame > Int.MaxValue || nFrames > Int.MaxValue) return null
          return VideoMeta("video/avi", w.toInt, h.toInt,
            nFrames * usPerFrame / 1000, Some(nFrames))
        } else {
          if (sz > Int.MaxValue - 16) return null
          pos += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks pad to even
          if (pos < 0) return null // a crafted size must not walk backwards
        }
      }
      return null
    }

    if (tag(4) != "ftyp") return null
    // MP4: top-level box walk to moov, then moov children for
    // mvhd (timescale/duration) and trak→tkhd (dimensions)
    var tsScale = -1L; var dur = -1L; var w = -1L; var h = -1L
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var pos = from
      var hops = 0
      while (pos + 8 <= to && hops < 64 && depth < 4) {
        hops += 1
        val sz = be32(pos)
        val tp = tag(pos + 4)
        if (sz < 8 || pos + sz > to) return
        tp match {
          case "moov" | "trak" => walk(pos + 8, pos + sz.toInt, depth + 1)
          case "mvhd" if pos + 8 < to => // version byte must exist
            val v = bytes(pos + 8) & 0xff
            if (v == 1) { tsScale = be32(pos + 28); dur = (be32(pos + 32) << 32) | be32(pos + 36) }
            else { tsScale = be32(pos + 20); dur = be32(pos + 24) }
          case "tkhd" if w < 0 && pos + 8 < to =>
            val v = bytes(pos + 8) & 0xff
            val base = if (v == 1) pos + 96 else pos + 84
            val tw = be32(base) >> 16; val th = be32(base + 4) >> 16
            if (tw > 0 && th > 0) { w = tw; h = th }
          case _ => ()
        }
        pos += sz.toInt
      }
    }
    walk(0, bytes.length, 0)
    if (w <= 0 || h <= 0 || tsScale <= 0 || dur < 0) return null
    VideoMeta("video/mp4", w.toInt, h.toInt, dur * 1000 / tsScale, None)
  }

  /** [[videoMetaKernel]] as a column: adds `video_meta`. */
  def withVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val f = udf(videoMetaKernel _)
    df.withColumn("video_meta", f(col(binCol)))
  }

  /** One decoded, sampled video frame: original frame index in the
    * stream plus the [[MediaCodec.ImageStats]] decode summary. */
  case class FrameStats(frame_idx: Int, media_type: String,
                        width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL video frame extraction for MJPEG-style AVI: walk the RIFF
    * `LIST movi` payload for `##db`/`##dc` frame chunks (each chunk
    * body is a complete still-image bitstream — the MJPEG contract),
    * sample `n` frames evenly across the stream (indices ⌊i·total/n⌋),
    * and decode each through the JDK codec ([[MediaCodec.decodeStats]]
    * — the same real ImageIO path as `mm_decode_real`). Inter-coded
    * formats (H.264 in MP4) still have no JDK decoder and keep the
    * byte-range stub; MJPEG is the one container the JVM can decode
    * end-to-end, so that path is real. Null for non-AVI payloads;
    * frames an installed codec can't decode are dropped AFTER
    * sampling (a corrupt frame in a 100 TB corpus must not kill the
    * task — same contract as decodeStats). The chunk walk is bounded
    * to 4096 chunks (the adversarial-container guard, same rationale
    * as the meta walk's 64-box cap) — sampling indexes into the
    * frames seen within that bound; raise it for hour-long payloads. */
  def videoFramesKernel(bytes: Array[Byte], n: Int): Array[FrameStats] =
    try videoFramesWalk(bytes, n)
    catch { case scala.util.control.NonFatal(_) => null }

  private def videoFramesWalk(bytes: Array[Byte], n: Int): Array[FrameStats] = {
    if (bytes == null || bytes.length < 16 || n <= 0) return null
    def le32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "ISO-8859-1")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return null
    // collect (offset, size) of every frame chunk, bounded walk
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var hops = 0
    def chunks(from: Int, to: Int, depth: Int): Unit = {
      var pos = from
      while (pos + 8 <= to && hops < 4096 && depth < 4) {
        hops += 1
        val id = tag(pos)
        val sz = le32(pos + 4)
        if (sz < 0 || sz > Int.MaxValue - 16 || pos + 8 + sz > to) return
        if (id == "LIST" && (tag(pos + 8) == "movi" || tag(pos + 8) == "rec "))
          chunks(pos + 12, pos + 8 + sz.toInt, depth + 1)
        else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc")))
          ranges += ((pos + 8, sz.toInt))
        pos += 8 + sz.toInt + (sz.toInt & 1) // RIFF pads chunks to even
        if (pos < 0) return
      }
    }
    chunks(12, bytes.length, 0)
    val total = ranges.length
    if (total == 0) return Array.empty
    val picks = if (n >= total) 0 until total
                else (0 until n).map(i => (i.toLong * total / n).toInt)
    picks.flatMap { idx =>
      val (off, sz) = ranges(idx)
      val frame = java.util.Arrays.copyOfRange(bytes, off, off + sz)
      Option(MediaCodec.decodeStats(frame)).map(s =>
        FrameStats(idx, s.media_type, s.width, s.height,
          s.mean_r, s.mean_g, s.mean_b))
    }.toArray
  }

  /** [[videoFramesKernel]] exploded: one row per sampled decoded
    * frame, columns `frame_idx` + `frame_stats`. Partition-parallel —
    * each payload decodes independently where its bytes already live. */
  def withVideoFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    // asNondeterministic: the guide-§4.4 duplication fix, not a
    // semantic claim — the kernel is pure, but the filter below
    // references its output column, and the optimizer pushes the
    // filter down by COPYING the whole container-walk + n-frame
    // ImageIO decode into the filter condition (observed in the
    // mm_video_frames plan: the full chain evaluated 2-3x per row).
    // Marking it nondeterministic pins one evaluation in the project;
    // the values and surviving rows are identical.
    val f = udf((b: Array[Byte]) => videoFramesKernel(b, n)).asNondeterministic()
    df.withColumn("__frames", f(col(binCol)))
      .filter(col("__frames").isNotNull)
      .withColumn("frame", explode(col("__frames")))
      .drop("__frames")
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_stats", col("frame").dropFields("frame_idx"))
      .drop("frame")
  }

  /** Row-level WAV stats record for the imperative kernel. */
  case class WavStats(n_samples: Long, mean_amp: Double, rms: Double,
                      zero_crossings: Long)

  /** Imperative twin of [[wavSampleStats]]: same output bit-for-bit,
    * ~400× faster. Spark evaluates higher-order-function lambdas
    * (`aggregate`) INTERPRETED per element — measured ~1.4 µs/sample
    * for the hex/conv chain vs ~3 ns/sample for this direct byte loop.
    * The column-algebra version remains the cross-checkable reference
    * (MediaCodecSpec asserts equality, including on fuzz payloads);
    * this is what production and the registry run. */
  def wavStatsKernel(bytes: Array[Byte], maxSamples: Int): WavStats = {
    if (bytes == null || bytes.length < 44) return null
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return null
    val dataSize = (bytes(40) & 0xffL) | ((bytes(41) & 0xffL) << 8) |
      ((bytes(42) & 0xffL) << 16) | ((bytes(43) & 0xffL) << 24)
    val n = math.min(math.min(dataSize >> 1, maxSamples.toLong),
      (bytes.length - 44L) >> 1).toInt
    if (n <= 0) return null
    var s = 0L; var ss = 0.0; var zc = 0L
    var prevNonNeg = false; var first = true
    var i = 0
    while (i < n) {
      val off = 44 + 2 * i
      val v = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort.toInt
      s += v; ss += v.toDouble * v
      val nonNeg = v >= 0
      if (!first && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg; first = false
      i += 1
    }
    WavStats(n.toLong, s.toDouble / n, math.sqrt(ss / n), zc)
  }

  /** [[wavStatsKernel]] as a column: adds `wav_stats` with the same
    * schema as [[wavSampleStats]]. */
  def wavSampleStatsFast(df: DataFrame, binCol: String,
                         maxSamples: Int = 4096): DataFrame = {
    val f = udf((b: Array[Byte]) => wavStatsKernel(b, maxSamples))
    df.withColumn("wav_stats", f(col(binCol)))
  }

  /** Wrap a binary payload column with extracted metadata. The fake
    * "header parse" derives deterministic dimensions from a portable
    * payload hash — [[sniffMediaMeta]] is the real parser for payloads
    * with actual container-format headers. */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val h = md5Bits48(col(binCol))
    df.withColumn("media_meta", struct(
      lit("image/fake").as("media_type"),
      (pmod(h, lit(1920)) + 1).cast("int").as("width"),
      (pmod(shiftright(h, 16), lit(1080)) + 1).cast("int").as("height"),
      length(col(binCol)).cast("long").as("n_bytes")))
  }

  /** STUB decode → fixed-size feature vector. Deterministic fake:
    * seeded pseudo-features from the portable payload hash. A real
    * implementation would decode + pool pixels per partition batch;
    * the signature (binary → Array[Float]) and the per-partition
    * batching pattern are the production contract. */
  def decodeToFeatures(df: DataFrame, binCol: String, dim: Int = 8): DataFrame = {
    val feats = array((0 until dim).map { i =>
      (pmod(md5Bits48(col(binCol), s" $i"), lit(1000)).cast("double") / 1000.0).cast("float")
    }: _*)
    df.withColumn("features", feats)
  }

  /** STUB resize: a real implementation decodes, resamples pixels to
    * (w,h) and re-encodes per partition batch; the stub keeps the
    * contract — binary in, binary out, target dims recorded in the
    * metadata struct — by byte-range scaling the payload to the
    * target "pixel count" deterministically. */
  def resizeMedia(df: DataFrame, binCol: String, width: Int, height: Int): DataFrame =
    df.withColumn("resized",
        expr(s"substring($binCol, 1, int(greatest(least(length($binCol), ${width * height}), 1)))"))
      .withColumn("resized_meta", struct(
        lit("image/fake").as("media_type"),
        lit(width).as("width"), lit(height).as("height"),
        length(col("resized")).cast("long").as("n_bytes")))

  /** Frame sampling plumbing for "video" payloads: split the payload
    * into n equal byte-range "frames" (stub for keyframe extraction),
    * exploded one row per frame — the partition-parallel shape a real
    * extractor uses. */
  def sampleFrames(df: DataFrame, binCol: String, n: Int): DataFrame = {
    val total = length(col(binCol))
    val frames = transform(sequence(lit(0), lit(n - 1)), i =>
      struct(i.as("frame_idx"),
        substring(col(binCol), (i * (total / n) + 1).cast("int"), (total / n).cast("int"))
          .as("frame_bytes")))
    df.withColumn("frame", explode(frames))
      .withColumn("frame_idx", col("frame.frame_idx"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }
}
