package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level pins for the image header parser, against hand-assembled
  * spec-valid headers (PNG spec / ITU-T T.81) — independent of the
  * fixture encoders where possible. */
class ImageHeadersSpec extends AnyFunSuite {

  test("PNG: signature + IHDR dimensions (big-endian u32)") {
    // hand-assembled, not via pngBytes: signature, IHDR len 13, 800x601
    val b = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x03, 0x20, // width 800
      0x00, 0x00, 0x02, 0x59, // height 601
      0x08, 0x02, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(ImageHeaders.parse(b) ==
      ImageHeaders.Parsed("png", Some(800), Some(601)))
  }

  test("JPEG: dimensions from SOF0 after skipping APP0 + EXIF APP1 + COM") {
    // the realistic shape: SOI, JFIF APP0, EXIF APP1, a comment, SOF2
    // (progressive) — the parser must skip every segment by declared
    // length and read height/width big-endian from the SOF payload
    val out = new java.io.ByteArrayOutputStream()
    def w(vs: Int*): Unit = vs.foreach(out.write)
    w(0xff, 0xd8)                         // SOI
    w(0xff, 0xe0, 0x00, 0x10)             // APP0 len 16
    w('J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 0, 1, 0, 1, 0)
    w(0xff, 0xe1, 0x00, 0x0a)             // APP1 (EXIF) len 10
    w('E', 'x', 'i', 'f', 0, 0, 'I', 'I')
    w(0xff, 0xfe, 0x00, 0x05, 'h', 'i', '!') // COM len 5
    w(0xff, 0xc2, 0x00, 0x11)             // SOF2 len 17
    w(0x08)                               // precision
    w(0x04, 0x38)                         // height 1080
    w(0x07, 0x80)                         // width 1920
    w(0x03, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(ImageHeaders.parse(out.toByteArray) ==
      ImageHeaders.Parsed("jpeg", Some(1920), Some(1080)))
  }

  test("fixture encoders round-trip through the parser") {
    val body = "entropy".getBytes("UTF-8")
    val png = ImageHeaders.pngBytes(1088, 80, body)
    assert(png.length == ImageHeaders.PNG_HEADER_BYTES + body.length)
    assert(ImageHeaders.parse(png) ==
      ImageHeaders.Parsed("png", Some(1088), Some(80)))
    val jpg = ImageHeaders.jpegBytes(64, 1072, body)
    assert(jpg.length == ImageHeaders.JPEG_HEADER_BYTES + body.length)
    assert(ImageHeaders.parse(jpg) ==
      ImageHeaders.Parsed("jpeg", Some(64), Some(1072)))
  }

  test("WAV: PCM format fields via the chunk walk, LIST chunk skipped") {
    val data = Array.fill[Byte](1000)(7)
    val plain = AudioHeaders.wavBytes(2, 44100, 16, data)
    assert(plain.length == AudioHeaders.WAV_HEADER_BYTES + data.length)
    val m = AudioHeaders.parseWav(plain).get
    assert(m.channels == 2 && m.sampleRate == 44100 && m.bitsPerSample == 16)
    assert(m.dataBytes == 1000 && m.nSamples == 250) // 1000 / (2ch * 2B)
    // a LIST/INFO chunk between fmt and data must be skipped by size
    val withList = AudioHeaders.wavBytes(1, 8000, 16, data, extraChunk = true)
    assert(AudioHeaders.parseWav(withList).get ==
      AudioHeaders.WavMeta(1, 8000, 16, 1000))
    // non-WAV and truncated input degrade to None, never throw
    assert(AudioHeaders.parseWav("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
    assert(AudioHeaders.parseWav(plain.take(20)).isEmpty)
    assert(AudioHeaders.parseWav(null).isEmpty)
    // a corrupt chunk size >= 2^31 must not truncate negative in Int and
    // walk the cursor backwards forever — the walk terminates with None
    val corrupt = plain.clone()
    for (k <- 0 until 4) corrupt(12 + 4 + k) = 0xff.toByte // fmt size = 0xFFFFFFFF
    assert(AudioHeaders.parseWav(corrupt).isEmpty)
    // size overshooting the buffer by 1 also ends the walk cleanly
    val overshoot = plain.clone()
    val ds = 1001L // data chunk claims one byte more than present
    for (k <- 0 until 4)
      overshoot(AudioHeaders.WAV_HEADER_BYTES - 4 + k) = ((ds >> (8 * k)) & 0xff).toByte
    assert(AudioHeaders.parseWav(overshoot).get.dataBytes == 1001L)
  }

  test("MP4: mvhd timescale/duration via the box walk, free box skipped") {
    val payload = Array.fill[Byte](500)(3)
    val mp4 = VideoHeaders.mp4Bytes(30000L, 90000L, payload)
    assert(mp4.length == VideoHeaders.MP4_HEADER_BYTES + payload.length)
    val m = VideoHeaders.parseMp4(mp4).get
    assert(m.timescale == 30000L && m.duration == 90000L)
    assert(m.mdatBytes == 500L)
    // non-BMFF, truncated, and malformed-box inputs degrade to None
    assert(VideoHeaders.parseMp4("not a video".getBytes("US-ASCII")).isEmpty)
    assert(VideoHeaders.parseMp4(mp4.take(40)).isEmpty)
    assert(VideoHeaders.parseMp4(null).isEmpty)
  }

  test("non-image, truncated, and dimension-less payloads degrade to raw/None") {
    assert(ImageHeaders.parse("plain text".getBytes("UTF-8")).format == "raw")
    assert(ImageHeaders.parse(Array.empty[Byte]).format == "raw")
    assert(ImageHeaders.parse(null).format == "raw")
    // PNG magic but truncated before IHDR dims
    val trunc = ImageHeaders.pngBytes(10, 10, Array.empty).take(14)
    assert(ImageHeaders.parse(trunc) == ImageHeaders.Parsed("png", None, None))
    // JPEG that reaches SOS without any SOF
    val sos = Array[Int](0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(ImageHeaders.parse(sos) == ImageHeaders.Parsed("jpeg", None, None))
  }
}
