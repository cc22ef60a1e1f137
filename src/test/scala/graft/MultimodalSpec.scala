package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, determinism, and batch shapes of the
  * stubbed decode pipeline (the production contract around a real
  * decoder). */
class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "a tiny payload"), (2L, "another somewhat longer payload body"))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
  }

  test("withMediaMeta is deterministic and bounds dimensions") {
    val m = Multimodal.withMediaMeta(docs, "payload")
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val again = Multimodal.withMediaMeta(docs, "payload")
      .select("doc_id", "media_meta.width", "media_meta.height", "media_meta.n_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(m.toSeq == again.toSeq)
    m.foreach { case (_, w, h, n) =>
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && n > 0)
    }
  }

  test("decodeToFeatures emits fixed-dim [0,1) float vectors") {
    val f = Multimodal.decodeToFeatures(docs, "payload", dim = 8)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(f.forall(_.length == 8))
    assert(f.forall(_.forall(x => x >= 0f && x < 1f)))
  }

  test("sampleFrames explodes n byte-range frames per payload") {
    val fr = Multimodal.sampleFrames(docs, "payload", n = 4)
    assert(fr.count() == 8) // 2 docs × 4 frames
    val idx = fr.groupBy("doc_id").agg(collect_set(col("frame_idx")).as("s"))
      .collect().map(_.getSeq[Int](1).toSet)
    assert(idx.forall(_ == Set(0, 1, 2, 3)))
  }

  // ---- real header sniffing: hand-assembled minimal-but-genuine file
  // headers; the parser must recover the dimensions from the bytes ----

  import MediaTestFixtures.hexBytes

  private def sniff(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    val df = payloads.toDF("id", "payload")
    Multimodal.sniffMediaMeta(df, "payload")
      .select(col("id"), col("media_meta.media_type"), col("media_meta.width"),
        col("media_meta.height"), col("media_meta.sample_rate"),
        col("media_meta.channels"), col("media_meta.n_bytes"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)), r.getLong(6)))).toMap
  }

  test("sniffMediaMeta parses real PNG/GIF/BMP/JPEG/WAV headers bytewise") {
    val png = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000002 00000003 0806000000")
    val gif = hexBytes("474946383961 0400 0500") // GIF89a 4x5 (LE u16)
    val bmp = hexBytes("424D 00000000 00000000 1A000000 28000000 06000000 07000000")
    // JPEG: SOI, APP0(16), DQT(skipped too), SOF0 h=11 w=9, 3 components
    val jpeg = hexBytes("FFD8 FFE000104A46494600010100000100010000" +
      " FFDB00040102" + // minimal DQT segment (len 4 = 2 len bytes + 2 payload)
      " FFC0001108 000B 0009 03011100021101031101")
    val wav = hexBytes("52494646 24000000 57415645 666D7420 10000000 0100 0200" +
      " 44AC0000 10B10200 0400 1000 64617461 00000000")
    val junk = "not a media file".getBytes("UTF-8")
    val m = sniff(Seq(1L -> png, 2L -> gif, 3L -> bmp, 4L -> jpeg, 5L -> wav, 6L -> junk))
    assert(m(1L) == (("image/png", Some(2), Some(3), None, None, png.length.toLong)))
    assert(m(2L) == (("image/gif", Some(4), Some(5), None, None, gif.length.toLong)))
    assert(m(3L) == (("image/bmp", Some(6), Some(7), None, None, bmp.length.toLong)))
    assert(m(4L) == (("image/jpeg", Some(9), Some(11), None, None, jpeg.length.toLong)))
    assert(m(5L) == (("audio/wav", None, None, Some(44100), Some(2), wav.length.toLong)))
    assert(m(6L) == (("application/octet-stream", None, None, None, None, junk.length.toLong)))
    // video containers classify by type; dims come from videoMetaKernel
    val mp4 = hexBytes("00000010 66747970 69736F6D 00000200")
    val avi = hexBytes("52494646 50000000 41564920")
    val v = sniff(Seq(7L -> mp4, 8L -> avi))
    assert(v(7L)._1 == "video/mp4" && v(8L)._1 == "video/avi")
  }

  test("sniffMediaMeta does not misfire on text that starts like a magic string") {
    // "BM..." and "GIF89a..." as plain text: BMP requires a valid DIB
    // header size and GIF a full 10-byte header — the text lookalikes
    // must fall through to octet-stream (BMP case) or, for GIF, parse
    // only when the full fixed-layout header is actually present.
    val bmText = "BM I am not a bitmap, just a sentence".getBytes("UTF-8")
    val m = sniff(Seq(1L -> bmText))
    assert(m(1L)._1 == "application/octet-stream")
  }

  test("jpeg scan bails on truncated/garbage segment chains") {
    val truncated = hexBytes("FFD8 FFE000") // APP0 length cut off
    val noSof = hexBytes("FFD8 FFDA0002") // straight to start-of-scan
    val m = sniff(Seq(1L -> truncated, 2L -> noSof))
    assert(m(1L)._1 == "image/jpeg" && m(1L)._2.isEmpty)
    assert(m(2L)._1 == "image/jpeg" && m(2L)._2.isEmpty)
  }

  // ---- real video container metadata: hand-assembled MP4 box trees
  // and AVI RIFF chunks; the walker must recover dims/duration ----

  private def be32b(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32b(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def tagB(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("videoMetaKernel walks MP4 boxes: skips free/mdat, reads mvhd+tkhd") {
    val matrix = be32b(65536) ++ Array.fill(12)(0.toByte) ++ be32b(65536) ++
      Array.fill(12)(0.toByte) ++ be32b(0x40000000L)
    val mvhd = be32b(108) ++ tagB("mvhd") ++ Array.fill(12)(0.toByte) ++
      be32b(600) ++ be32b(1500) ++ be32b(65536) ++ Array[Byte](1, 0) ++
      Array.fill(10)(0.toByte) ++ matrix ++ Array.fill(24)(0.toByte) ++ be32b(2)
    val tkhd = be32b(92) ++ tagB("tkhd") ++ be32b(7) ++ Array.fill(8)(0.toByte) ++
      be32b(1) ++ Array.fill(4)(0.toByte) ++ be32b(1500) ++
      Array.fill(16)(0.toByte) ++ matrix ++ be32b(640L << 16) ++ be32b(360L << 16)
    val trak = be32b(8 + tkhd.length) ++ tagB("trak") ++ tkhd
    val moov = be32b(8 + mvhd.length + trak.length) ++ tagB("moov") ++ mvhd ++ trak
    val mp4 = be32b(16) ++ tagB("ftyp") ++ tagB("isom") ++ be32b(0x200) ++
      be32b(8 + 5) ++ tagB("mdat") ++ Array.fill(5)(9.toByte) ++ moov
    val m = Multimodal.videoMetaKernel(mp4)
    assert(m != null && m.media_type == "video/mp4")
    assert(m.width == 640 && m.height == 360)
    assert(m.duration_ms == 1500L * 1000 / 600 && m.n_frames.isEmpty)
  }

  test("videoMetaKernel reads AVI avih: dims, frames, duration") {
    val avihData = le32b(40000) ++ Array.fill(12)(0.toByte) ++ le32b(250) ++
      le32b(0) ++ le32b(1) ++ le32b(0) ++ le32b(320) ++ le32b(240) ++
      Array.fill(16)(0.toByte)
    val avi = tagB("RIFF") ++ le32b(80) ++ tagB("AVI ") ++ tagB("LIST") ++
      le32b(68) ++ tagB("hdrl") ++ tagB("avih") ++ le32b(56) ++ avihData
    val m = Multimodal.videoMetaKernel(avi)
    assert(m != null && m.media_type == "video/avi")
    assert(m.width == 320 && m.height == 240)
    assert(m.n_frames.contains(250L) && m.duration_ms == 250L * 40000 / 1000)
  }

  test("videoFramesKernel: movi walk + real decode, even sampling, corrupt frames dropped") {
    import graft.operators.{MediaCodec, MediaFixtures}
    val frames = Seq(
      MediaCodec.encodeSolid("png", 4, 5, 10, 20, 30),
      MediaCodec.encodeSolid("bmp", 6, 7, 40, 50, 60),
      MediaCodec.encodeSolid("png", 8, 9, 70, 80, 90))
    val avi = MediaFixtures.aviMjpegKernel(frames)
    // n >= total → every frame, in stream order, really decoded
    val all = Multimodal.videoFramesKernel(avi, 10)
    assert(all.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(all(1).media_type == "image/bmp" && all(1).width == 6 && all(1).height == 7)
    assert(all(1).mean_r == 40.0 && all(1).mean_g == 50.0 && all(1).mean_b == 60.0)
    // n=2 of 3 → indices ⌊i·3/2⌋ = 0, 1
    val two = Multimodal.videoFramesKernel(avi, 2)
    assert(two.map(_.frame_idx).toSeq == Seq(0, 1))
    // a frame no codec decodes is dropped AFTER sampling (others keep)
    val junky = MediaFixtures.aviMjpegKernel(
      Seq(frames(0), Array.fill[Byte](32)(0x7f), frames(2)))
    assert(Multimodal.videoFramesKernel(junky, 10).map(_.frame_idx).toSeq == Seq(0, 2))
    // non-AVI payload → null; empty movi → empty
    assert(Multimodal.videoFramesKernel(frames(0), 2) == null)
    assert(Multimodal.videoFramesKernel(MediaFixtures.aviMjpegKernel(Seq.empty), 2).isEmpty)
  }

  test("videoMetaKernel survives review-found crash shapes") {
    // AVI chunk with huge u32 size whose .toInt is negative — the walk
    // must not step backwards into tag(new String(bytes, -12, 4))
    val backstep = tagB("RIFF") ++ le32b(100) ++ tagB("AVI ") ++
      tagB("JUNK") ++ le32b(0xFFFFFFE0L) ++ Array.fill(20)(0.toByte)
    assert(Multimodal.videoMetaKernel(backstep) == null)
    // mvhd/tkhd box of size exactly 8 ending at the buffer end — the
    // version-byte read must not index one past the array
    val tightMvhd = be32b(16) ++ tagB("ftyp") ++ tagB("isom") ++ be32b(0x200) ++
      be32b(16) ++ tagB("moov") ++ be32b(8) ++ tagB("mvhd")
    assert(Multimodal.videoMetaKernel(tightMvhd) == null)
    // avih claiming 0xFFFFFFFF frames AND us/frame — duration multiply
    // must not overflow Long into a garbage negative
    val bigAvih = tagB("RIFF") ++ le32b(80) ++ tagB("AVI ") ++ tagB("LIST") ++
      le32b(68) ++ tagB("hdrl") ++ tagB("avih") ++ le32b(56) ++
      le32b(0xFFFFFFFFL) ++ Array.fill(12)(0.toByte) ++ le32b(0xFFFFFFFFL) ++
      le32b(0) ++ le32b(1) ++ le32b(0) ++ le32b(320) ++ le32b(240) ++
      Array.fill(16)(0.toByte)
    assert(Multimodal.videoMetaKernel(bigAvih) == null)
  }

  test("sniff nulls dims for truncated SOF and reads top-down BMP height") {
    // JPEG truncated INSIDE the SOF width field — no fabricated dims
    val cut = hexBytes("FFD8 FFC0 0011 08 000B 09")
    val m1 = sniff(Seq(1L -> cut))
    assert(m1(1L)._1 == "image/jpeg" && m1(1L)._2.isEmpty && m1(1L)._3.isEmpty)
    // top-down BMP: biHeight = -720 (0xFFFFFD30) must read as 720
    val neg = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(-720).array()
    val bmp = hexBytes("424D 00000000 00000000 1A000000 28000000 80020000") ++ neg
    val m2 = sniff(Seq(1L -> bmp))
    assert(m2(1L)._1 == "image/bmp" && m2(1L)._2.contains(640) && m2(1L)._3.contains(720))
  }

  test("videoMetaKernel nulls malformed containers instead of throwing") {
    val junk = Seq(
      "RIFFxxxxAVI junk without hdrl".getBytes("ISO-8859-1"),
      be32b(16) ++ tagB("ftyp") ++ tagB("isom") ++ be32b(0), // ftyp only
      be32b(0) ++ tagB("ftyp") ++ Array.fill(20)(0.toByte), // zero-size box
      "short".getBytes("US-ASCII"), Array.emptyByteArray)
    junk.foreach(b => assert(Multimodal.videoMetaKernel(b) == null))
    val rnd = new scala.util.Random(7L)
    (0 until 200).foreach { _ =>
      val b = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      Multimodal.videoMetaKernel(b)
      Multimodal.videoFramesKernel(b, 3)
    } // must not throw
    // RIFF/AVI prefix + random movi-ish tail: the frames walk must
    // survive crafted sizes (null/empty, never throw)
    (0 until 100).foreach { _ =>
      val tail = Array.fill(rnd.nextInt(100))(rnd.nextInt(256).toByte)
      val avi = "RIFF".getBytes("ISO-8859-1") ++ le32b(rnd.nextInt(1 << 24).toLong) ++
        "AVI ".getBytes("ISO-8859-1") ++ tail
      Multimodal.videoFramesKernel(avi, 2)
    }
  }

  test("resizeMedia caps payload at width*height bytes and records target dims") {
    val r = Multimodal.resizeMedia(docs, "payload", width = 2, height = 3)
      .select(col("doc_id"), length(col("resized")).as("len"),
        col("resized_meta.width"), col("resized_meta.height"))
      .collect()
    r.foreach { row =>
      assert(row.getAs[Int]("len") <= 6)
      assert(row.getAs[Int]("width") == 2 && row.getAs[Int]("height") == 3)
    }
  }
}
