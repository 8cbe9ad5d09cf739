package graft.ops

/** ISO-BMFF (MP4) box walking — the video member of the container-header
  * family ([[ImageHeaders]], [[AudioHeaders]]): a file is a sequence of
  * big-endian boxes `[size u32][type 4cc][payload]`; `moov` nests further
  * boxes, its `mvhd` (version 0) carries the movie timescale (u32 at
  * payload offset 12) and duration in timescale units (u32 at 16);
  * `mdat` holds the sample payload. Duration filtering and batch shaping
  * over a 100 TB video crawl needs exactly these fields — read by
  * skipping sibling boxes by their declared size, no codec. */
object VideoHeaders {

  final case class Mp4Meta(timescale: Long, duration: Long, mdatBytes: Long)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Parse top-level boxes; recurse one level into moov for mvhd.
    * Returns None for non-BMFF or truncated input — never throws. */
  def parseMp4(b: Array[Byte]): Option[Mp4Meta] = {
    // sanity: the first box must be well-formed and conventionally ftyp
    if (b == null || b.length < 8 || u32(b, 0) < 8 || tag(b, 4) != "ftyp")
      return None
    var timescale, duration, mdat = -1L
    var i = 0
    while (i + 8 <= b.length) {
      val size = u32(b, i)
      if (size < 8 || i + size > b.length) return None // malformed box
      tag(b, i + 4) match {
        case "moov" =>
          var j = i + 8
          val end = i + size.toInt
          while (j + 8 <= end) {
            val s2 = u32(b, j)
            if (s2 < 8 || j + s2 > end) return None
            if (tag(b, j + 4) == "mvhd" && b(j + 8) == 0 && j + 28 <= end) {
              // v0 payload: [version+flags 4][ctime 4][mtime 4][timescale 4][duration 4]
              timescale = u32(b, j + 8 + 12)
              duration = u32(b, j + 8 + 16)
            }
            j += s2.toInt
          }
        case "mdat" => mdat = size - 8
        case _ => () // ftyp/free/skip: stride over by size
      }
      i += size.toInt
    }
    if (timescale < 0 || mdat < 0) None
    else Some(Mp4Meta(timescale, duration, mdat))
  }

  /** Minimal spec-valid fixture: ftyp + free (exercises sibling skip) +
    * moov[mvhd v0] + mdat[payload]. */
  def mp4Bytes(timescale: Long, duration: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(120 + payload.length)
    def be32(v: Long): Unit =
      (3 to 0 by -1).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    def ascii(s: String): Unit = s.getBytes("US-ASCII").foreach(c => out.write(c.toInt))
    be32(16); ascii("ftyp"); ascii("isom"); be32(512)            // 16 B
    be32(12); ascii("free"); be32(0)                             // 12 B
    val mvhdSize = 8 + 4 + 96                                    // v0 mvhd = 108
    be32(8L + mvhdSize); ascii("moov")
    be32(mvhdSize.toLong); ascii("mvhd")
    be32(0) // version 0 + flags
    be32(0); be32(0) // ctime, mtime
    be32(timescale); be32(duration)
    (0 until 20).foreach(_ => be32(0)) // rate..matrix/reserved tail
    be32(8L + payload.length); ascii("mdat"); out.write(payload)
    out.toByteArray
  }

  val MP4_HEADER_BYTES = 16 + 12 + 8 + 108 + 8
}
