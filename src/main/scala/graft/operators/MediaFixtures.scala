package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Multimodal.{be16, be32, le16, le32}

/** Column-algebra builders for payloads with REAL container-format
  * headers — the single source of truth for the deterministic media
  * fixtures used by both the oracle queries (PipelineQueries `mm_*`)
  * and the scale soak (MediaScale): a byte-offset change here reaches
  * both, so the soak corpus can never drift from the oracle corpus. */
private[graft] object MediaFixtures {

  /** PNG signature + IHDR(w, h, 8-bit RGBA) + tail. Header = 29 B. */
  def png(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32(w), be32(h), unhex(lit("0806000000")), tail)

  /** GIF89a + LE u16 dims + tail. Header = 10 B. */
  def gif(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("474946383961")), le16(w), le16(h), tail)

  /** BMP "BM" + zeroed size/reserved/offset + BITMAPINFOHEADER(40)
    * size + LE u32 dims + tail. Header = 26 B. */
  def bmp(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("424D")), le32(lit(0)), le32(lit(0)),
      le32(lit(26)), le32(lit(40)), le32(w), le32(h), tail)

  /** JPEG SOI + APP0/JFIF (skipped by the scan) + SOF0 with BE u16
    * dims + tail. Header = 39 B. */
  def jpeg(w: Column, h: Column, tail: Column): Column =
    concat(unhex(lit("FFD8")),
      unhex(lit("FFE000104A46494600010100000100010000")),
      unhex(lit("FFC0001108")), be16(h), be16(w),
      unhex(lit("03011100021101031101")), tail)

  /** Canonical 44-byte WAV header for 16-bit PCM with `nDataBytes` of
    * sample data, `ch` channels at `rate` Hz (byte rate and block
    * align derived). Concatenate the sample bytes after it. */
  def wavHeader(nDataBytes: Column, ch: Column, rate: Column): Column =
    concat(lit("RIFF").cast("binary"), le32(nDataBytes + 36),
      lit("WAVE").cast("binary"), lit("fmt ").cast("binary"), le32(lit(16)),
      le16(lit(1)), le16(ch), le32(rate), le32(rate * ch * 2),
      le16(ch * 2), le16(lit(16)), lit("data").cast("binary"), le32(nDataBytes))

  /** `n` 16-bit LE samples, sample i = pmod(hv·i, 2^16) — the shared
    * deterministic PCM body (< 2^53 arithmetic, exact both engines). */
  def pcm(hv: Column, n: Column): Column =
    aggregate(sequence(lit(1), n), lit(Array.emptyByteArray),
      (acc, i) => concat(acc, le16(pmod(hv * i, lit(65536)).cast("int"))))

  /** Assemble a minimal MJPEG-style AVI: RIFF/AVI + one `LIST movi`
    * whose `00dc` chunks carry the given complete still-image
    * bitstreams (real codecs' output — the MJPEG contract). RIFF
    * sizes are exact; chunks pad to even length. Imperative builder
    * (frame payloads come from [[MediaCodec.encodeSolid]], itself
    * imperative), used by the `mm_video_frames` fixture UDF and the
    * MultimodalSpec containers. */
  def aviMjpegKernel(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    val moviBody = frames.map { f =>
      val pad = f.length & 1
      ascii("00dc") ++ le32(f.length) ++ f ++ Array.fill[Byte](pad)(0)
    }.reduceOption(_ ++ _).getOrElse(Array.emptyByteArray)
    val listSz = 4 + moviBody.length // "movi" + chunks
    val riffSz = 4 + 8 + listSz      // "AVI " + LIST header + LIST body
    bos.write(ascii("RIFF")); bos.write(le32(riffSz)); bos.write(ascii("AVI "))
    bos.write(ascii("LIST")); bos.write(le32(listSz)); bos.write(ascii("movi"))
    bos.write(moviBody)
    bos.toByteArray
  }
}
