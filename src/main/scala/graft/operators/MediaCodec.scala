package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL image decode/encode/resize on the JDK's built-in codecs
  * (`javax.imageio`: PNG/BMP/GIF/JPEG/TIFF/WBMP readers+writers ship
  * with Java 17 and run headless) — no external media libraries
  * needed, so the former "decode stub" is now an actual decoder for
  * image payloads. Video stays byte-range stubbed in [[Multimodal]]
  * (the JDK ships no video codec).
  *
  * Decode is genuinely per-row imperative work — the legitimate UDF
  * case: there is no column-algebra route through an entropy-coded
  * bitstream. Each UDF call touches only its own payload (no state,
  * no driver traffic), so the operator scales embarrassingly with
  * partitions; at 100 TB the scan+decode is the work, not the plan.
  */
object MediaCodec {
  ImageIO.setUseCache(false) // in-memory streams only — no executor temp files

  /** Decoded-image summary: format (as `image/<fmt>`), dimensions and
    * per-channel pixel means. Null (dropped struct) for payloads no
    * installed codec recognizes. */
  case class ImageStats(media_type: String, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  /** Hard ceiling on decoded pixel count (64 Mpx ≈ 256 MB ARGB): a
    * corrupt or adversarial header claiming absurd dimensions must not
    * OOM an executor — dims come from the header (no pixel allocation)
    * before `read` is allowed to materialize the raster. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** Decode and compute per-channel means in one reader pass. Returns
    * null for undecodable payloads rather than failing the task — a
    * corrupt blob in a 100 TB corpus must not kill the job. */
  def decodeStats(bytes: Array[Byte]): ImageStats = {
    if (bytes == null) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxPixels) return null
          val img = reader.read(0)
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageStats(s"image/$fmt", w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** Encode a solid-color image through a real codec — the
    * deterministic fixture generator for oracle queries and specs
    * (PNG/BMP/GIF are lossless for a solid color, so the decode side
    * recovers the exact channel values). */
  def encodeSolid(fmt: String, w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Real resize: decode → raster scale → re-encode as PNG. Nearest
    * neighbor is the oracle-checkable mode (constant regions stay
    * bit-exact); bilinear is the production-smoothness mode. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int, bilinear: Boolean): Array[Byte] = {
    if (bytes == null) return null
    try {
      // same decompression-bomb guard as decodeStats: reject absurd
      // header-claimed dimensions BEFORE ImageIO materializes a raster
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val headerOk = try {
        val readers = ImageIO.getImageReaders(iis)
        readers.hasNext && {
          val r = readers.next()
          try { r.setInput(iis); r.getWidth(0).toLong * r.getHeight(0) <= MaxPixels }
          finally r.dispose()
        }
      } finally iis.close()
      if (!headerOk) return null
      val src = ImageIO.read(new ByteArrayInputStream(bytes))
      if (src == null) return null
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try {
        g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          if (bilinear) RenderingHints.VALUE_INTERPOLATION_BILINEAR
          else RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g2.drawImage(src, 0, 0, w, h, null)
      } finally g2.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    } catch { case _: Exception => null }
  }

  // ---- Column API ----

  private val decodeStatsUdf = udf(decodeStats _)
  private val encodeSolidUdf = udf(encodeSolid _)

  /** `image_stats` struct (see [[ImageStats]]) from a binary column —
    * null struct for undecodable payloads. */
  def withImageStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("image_stats", decodeStatsUdf(col(binCol)))

  /** Solid-color fixture payloads: `fmt/w/h/r/g/b` columns → real
    * encoded bytes in `outCol`. */
  def withSolidImage(df: DataFrame, outCol: String, fmt: String,
                     w: String, h: String, r: String, g: String, b: String): DataFrame =
    df.withColumn(outCol,
      encodeSolidUdf(lit(fmt), col(w), col(h), col(r), col(g), col(b)))

  /** Like [[withSolidImage]] but with a per-row format column. */
  def withSolidImageFmt(df: DataFrame, outCol: String, fmtCol: String,
                        w: String, h: String, r: String, g: String, b: String): DataFrame =
    df.withColumn(outCol,
      encodeSolidUdf(col(fmtCol), col(w), col(h), col(r), col(g), col(b)))

  /** Real decode→scale→re-encode resize of a binary image column into
    * `resized` (PNG bytes; null for undecodable payloads). */
  def resizeReal(df: DataFrame, binCol: String, w: Int, h: Int,
                 bilinear: Boolean = false): DataFrame = {
    val f = udf((b: Array[Byte]) => resizeImage(b, w, h, bilinear))
    df.withColumn("resized", f(col(binCol)))
  }
}
