package graft

import graft.operators.{MediaCodec, Multimodal}
import org.apache.spark.sql.functions._

/** Real codec round-trips on the JDK's imageio readers/writers and the
  * column-algebra PCM parser — actual compressed bytes in, exact
  * numbers out. */
class MediaCodecSpec extends SparkSpec {

  import MediaTestFixtures.{hexBytes, pcmWav}

  test("ImageIO solid-color encode→decode round-trips exactly for png/bmp/gif") {
    for (fmt <- Seq("png", "bmp", "gif")) {
      val bytes = MediaCodec.encodeSolid(fmt, 5, 4, 120, 7, 250)
      assert(bytes.length > 0, fmt)
      val st = MediaCodec.decodeStats(bytes)
      assert(st != null, fmt)
      assert(st.media_type == s"image/$fmt")
      assert(st.width == 5 && st.height == 4, fmt)
      assert(st.mean_r == 120.0 && st.mean_g == 7.0 && st.mean_b == 250.0, fmt)
    }
  }

  test("jpeg decode is real but lossy: solid gray decodes within tolerance") {
    val bytes = MediaCodec.encodeSolid("jpg", 8, 8, 128, 128, 128)
    val st = MediaCodec.decodeStats(bytes)
    assert(st != null && st.media_type == "image/jpeg")
    assert(st.width == 8 && st.height == 8)
    assert(math.abs(st.mean_r - 128.0) < 3 && math.abs(st.mean_g - 128.0) < 3 &&
      math.abs(st.mean_b - 128.0) < 3)
  }

  test("decodeStats returns null for junk, not an exception") {
    assert(MediaCodec.decodeStats("not an image".getBytes("UTF-8")) == null)
    assert(MediaCodec.decodeStats(null) == null)
    assert(MediaCodec.decodeStats(Array.emptyByteArray) == null)
  }

  test("decode AND resize reject decompression-bomb headers before allocation") {
    // a real PNG signature+IHDR claiming 50000x50000 (2.5 Gpx) with no
    // pixel data: both paths must null out from the HEADER, fast
    val bomb = hexBytes("89504E470D0A1A0A 0000000D 49484452" +
      " 0000C350 0000C350 0806000000 00000000") ++ Array.fill(64)(0.toByte)
    assert(MediaCodec.decodeStats(bomb) == null)
    assert(MediaCodec.resizeImage(bomb, 16, 16, bilinear = false) == null)
  }

  test("resizeImage nearest keeps a solid color bit-exact; bilinear stays close") {
    val src = MediaCodec.encodeSolid("png", 7, 3, 10, 200, 30)
    val nn = MediaCodec.decodeStats(MediaCodec.resizeImage(src, 16, 16, bilinear = false))
    assert(nn.width == 16 && nn.height == 16)
    assert(nn.mean_r == 10.0 && nn.mean_g == 200.0 && nn.mean_b == 30.0)
    val bl = MediaCodec.decodeStats(MediaCodec.resizeImage(src, 16, 16, bilinear = true))
    assert(bl.width == 16 && bl.height == 16)
    assert(math.abs(bl.mean_r - 10.0) < 2 && math.abs(bl.mean_g - 200.0) < 2)
  }

  test("withImageStats decodes distributed payloads and nulls junk rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, MediaCodec.encodeSolid("png", 4, 4, 9, 18, 27)),
      (2L, "garbage".getBytes("UTF-8")))
    val out = MediaCodec.withImageStats(rows.toDF("id", "payload"), "payload")
      .select(col("id"), col("image_stats.media_type"), col("image_stats.mean_r"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_ -> r.get(2))).toMap
    assert(out(1L).contains("image/png" -> 9.0))
    assert(out(2L).isEmpty)
  }

  test("wavSampleStats parses 16-bit LE PCM bytes exactly") {
    import spark.implicits._
    // samples: 1000, -1000, 0, -1, 32767, -32768  (n=6, dataSize=12)
    val samples = Seq(1000, -1000, 0, -1, 32767, -32768)
    val out = Multimodal.wavSampleStats(Seq((1L, pcmWav(samples))).toDF("id", "payload"), "payload")
      .select("wav_stats.n_samples", "wav_stats.mean_amp", "wav_stats.rms",
        "wav_stats.zero_crossings").collect()(0)
    assert(out.getLong(0) == 6L)
    val mean = samples.map(_.toLong).sum.toDouble / 6
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / 6)
    assert(out.getDouble(1) == mean)
    assert(out.getDouble(2) == rms)
    // sign flips (>=0 vs <0): 1000|-1000 X, -1000|0 X, 0|-1 X, -1|32767 X, 32767|-32768 X
    assert(out.getLong(3) == 5L)
  }

  test("fuzz: parsers never throw on arbitrary or adversarial bytes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val magics = Seq(
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
      "GIF89a".getBytes("US-ASCII"), "GIF87a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"), Array(0xFF, 0xD8).map(_.toByte),
      "RIFF".getBytes("US-ASCII"), "RIFFxxxxWAVE".getBytes("US-ASCII"))
    val payloads = (0 until 120).map { i =>
      val len = rnd.nextInt(80)
      val tail = Array.fill(len)(rnd.nextInt(256).toByte)
      val p = if (i % 3 == 0) magics(rnd.nextInt(magics.length)) ++ tail else tail
      (i.toLong, p)
    } :+ (999L -> Array.emptyByteArray)
    val df = payloads.toDF("id", "payload")
    // sniff + wav stats must complete and keep their invariants on ALL
    // inputs — truncated headers, garbage lengths, empty payloads
    val out = Multimodal.wavSampleStats(
        Multimodal.sniffMediaMeta(df, "payload"), "payload")
      .select(col("id"), col("media_meta.media_type").as("mt"),
        col("media_meta.n_bytes").as("nb"), length(col("payload")).as("len"),
        col("wav_stats.n_samples").as("ns"))
      .collect()
    assert(out.length == payloads.length)
    out.foreach { r =>
      assert(r.getString(1) != null && r.getString(1).nonEmpty)
      assert(r.getLong(2) == r.getInt(3).toLong, s"n_bytes for id=${r.getLong(0)}")
      if (!r.isNullAt(4)) assert(r.getLong(4) > 0 && r.getLong(4) <= 4096)
    }
    // decodeStats: same corpus through the real codec sniffing path
    payloads.foreach { case (_, p) => MediaCodec.decodeStats(p) } // must not throw
  }

  test("wavSampleStatsFast == column-algebra wavSampleStats bit-for-bit (incl. fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    // valid WAVs of varying sample counts + adversarial RIFF payloads
    val payloads = (0 until 40).map { i =>
      val p =
        if (i % 4 == 0) "RIFFxxxxWAVE".getBytes("US-ASCII") ++
          Array.fill(rnd.nextInt(60))(rnd.nextInt(256).toByte)
        else if (i % 4 == 1) Array.fill(rnd.nextInt(60))(rnd.nextInt(256).toByte)
        else pcmWav(Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(65536) - 32768))
      (i.toLong, p)
    }
    val df = payloads.toDF("id", "payload")
    def dump(out: org.apache.spark.sql.DataFrame) = out
      .select(col("id"), col("wav_stats.n_samples"), col("wav_stats.mean_amp"),
        col("wav_stats.rms"), col("wav_stats.zero_crossings"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toSeq.sortBy(_._1)
    val slow = dump(Multimodal.wavSampleStats(df, "payload", maxSamples = 16))
    val fast = dump(Multimodal.wavSampleStatsFast(df, "payload", maxSamples = 16))
    assert(slow == fast)
    assert(slow.exists(_._2.isDefined) && slow.exists(_._2.isEmpty))
  }

  test("wavSampleStats caps at maxSamples and nulls non-wav payloads") {
    import spark.implicits._
    val samples = (1 to 20).map(i => i * 100)
    val df = Seq((1L, pcmWav(samples)), (2L, "plain text".getBytes("UTF-8"))).toDF("id", "payload")
    val capped = Multimodal.wavSampleStats(df, "payload", maxSamples = 4)
      .select(col("id"), col("wav_stats.n_samples"), col("wav_stats.mean_amp")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ -> r.get(2))).toMap
    assert(capped(1L).contains(4L -> 250.0)) // first 4 samples: 100..400
    assert(capped(2L).isEmpty)
  }
}
