package graft.ops

/** RIFF/WAVE header parsing — the audio counterpart of [[ImageHeaders]]:
  * pull the PCM format facts (channels, sample rate, bit depth) and the
  * data-chunk size out of the container WITHOUT decoding samples, per the
  * public RIFF spec (little-endian chunk stream: "RIFF"<size>"WAVE", then
  * tagged chunks; "fmt " carries the format block, "data" the payload;
  * unknown chunks — LIST/INFO/fact — are SKIPPED by their declared size,
  * padded to even offsets). Sample count = data bytes / block align,
  * which is the metadata a 100 TB audio crawl needs for duration
  * filtering and batch shaping before any decode. */
object AudioHeaders {

  final case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataBytes: Long) {
    def blockAlign: Int = channels * (bitsPerSample / 8)
    def nSamples: Long = if (blockAlign == 0) 0L else dataBytes / blockAlign
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Parse a RIFF/WAVE header. Returns None for non-WAV or truncated
    * input — never throws. */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12
    var channels, sampleRate, bits = -1
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val chunk = tag(b, i)
      val size = u32le(b, i + 4)
      if (chunk == "fmt " && i + 8 + 16 <= b.length) {
        channels = u16le(b, i + 10)
        sampleRate = u32le(b, i + 12).toInt
        bits = u16le(b, i + 22)
      } else if (chunk == "data") {
        dataBytes = size
      }
      // Long arithmetic: a corrupt size >= 2^31 would truncate negative in
      // Int and walk i BACKWARDS forever. An advance past the buffer (huge
      // or truncated chunk) ends the walk instead — same guard class as
      // VideoHeaders.parseMp4.
      val adv = 8L + size + (size & 1L) // chunks pad to even offsets
      if (i + adv > b.length) i = b.length
      else i += adv.toInt
    }
    if (channels < 0 || dataBytes < 0) None
    else Some(WavMeta(channels, sampleRate, bits, dataBytes))
  }

  /** Canonical 44-byte PCM WAV header + payload (fixture encoder); the
    * optional `extraChunk` inserts a LIST chunk before "data" so specs
    * exercise the chunk walk. */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
      data: Array[Byte], extraChunk: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(60 + data.length)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = (0 until 4).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    def ascii(s: String): Unit = s.getBytes("US-ASCII").foreach(c => out.write(c.toInt))
    val extra = if (extraChunk) 8 + 4 else 0
    ascii("RIFF"); le32(36L + extra + data.length); ascii("WAVE")
    ascii("fmt "); le32(16L)
    le16(1) // PCM
    le16(channels); le32(sampleRate.toLong)
    val blockAlign = channels * (bitsPerSample / 8)
    le32(sampleRate.toLong * blockAlign); le16(blockAlign); le16(bitsPerSample)
    if (extraChunk) { ascii("LIST"); le32(4L); ascii("INFO") }
    ascii("data"); le32(data.length.toLong)
    out.write(data)
    out.toByteArray
  }

  /** Header byte counts for the oracle's payload-size arithmetic. */
  val WAV_HEADER_BYTES = 44
}
