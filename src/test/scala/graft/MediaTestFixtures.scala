package graft

/** Shared byte-level media fixtures for the codec / multimodal /
  * streaming specs — ONE definition of the hand-assembled PCM WAV
  * layout and the hex-string helper, so a header-layout tweak can't
  * leave a stale hand-rolled copy asserting the old bytes in another
  * suite. */
object MediaTestFixtures {

  def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Minimal canonical RIFF/WAVE: 44-byte header (PCM fmt-chunk 16,
    * mono, 8 kHz, 16-bit) followed by the little-endian samples. */
  def pcmWav(samples: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16).put("data".getBytes("US-ASCII"))
      .putInt(samples.length * 2)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }
}
