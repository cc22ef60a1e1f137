package graft

/** Probe: does JDK ImageIO decode scale across threads? Encodes one
  * solid PNG + BMP, then decodes 10k copies on 1 vs 32 threads.
  * (Diagnosis aid for mm_video_frames' serial-looking profile.) */
object ProbeImageIo {
  def main(args: Array[String]): Unit = {
    val png = graft.operators.MediaCodec.encodeSolid("png", 10, 10, 1, 2, 3)
    val bmp = graft.operators.MediaCodec.encodeSolid("bmp", 10, 10, 4, 5, 6)
    def decodeN(n: Int): Unit = (0 until n).foreach { i =>
      graft.operators.MediaCodec.decodeStats(if (i % 2 == 0) png else bmp)
    }
    decodeN(2000) // warm
    Seq(1, 8, 32).foreach { t =>
      val total = 20000
      val per = total / t
      val threads = (0 until t).map { _ => new Thread(() => decodeN(per)) }
      val t0 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probeimageio] $t threads: $total decodes in $dt%.2f s (${total / dt}%.0f/s)")
    }
  }
}
