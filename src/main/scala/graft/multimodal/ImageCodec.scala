package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Dependency-free image header synthesis + parsing for the multimodal
  * column operator (p10). The builder brief asks for multimodal columns
  * as opaque `binary` payloads with a real decode step; the container
  * has no image libraries, so we synthesize structurally-valid PNG and
  * JPEG byte streams ourselves and the decoder recovers the dimensions
  * by parsing the ACTUAL bytes (PNG IHDR fields / JPEG marker walk to
  * SOF0) — the same header parse a thumbnailing or size-filter pass
  * over a crawled corpus performs.
  *
  * Synthesis notes (sizes are part of the oracle contract in
  * Pipeline.p10): PNG = 8-byte signature + IHDR(25) + IDAT(12+n) +
  * IEND(12) = 57+n bytes, with real CRC32s; the IDAT body carries the
  * raw payload rather than a zlib stream (header-level fidelity only).
  * JPEG = SOI(2) + APP0/JFIF(18) + COM(4+n) + SOF0(19) + SOS(14) +
  * EOI(2) = 59+n bytes; COM precedes SOF0 so decoding requires a
  * genuine variable-length marker walk, not a fixed offset. Both
  * streams parse under the JDK's own ImageIO header readers (pinned
  * by ImageCodecSpec).
  */
object ImageCodec {

  final case class Dims(format: String, width: Int, height: Int)

  // ---- synthesis --------------------------------------------------------

  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be16(v: Int): Array[Byte] =
    Array((v >>> 8).toByte, v.toByte)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length))
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(tagBytes)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Minimal truecolor PNG: signature, IHDR with the given dims, one
    * IDAT carrying `payload` verbatim, IEND. */
  def synthesizePng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(width))
    ihdr.write(be32(height))
    // bit depth 8, color type 2 (truecolor), compression/filter/interlace 0
    ihdr.write(Array[Byte](8, 2, 0, 0, 0))
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    out.write(pngChunk("IHDR", ihdr.toByteArray))
    out.write(pngChunk("IDAT", payload))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Minimal baseline JPEG: SOI, JFIF APP0, a COM segment carrying
    * `payload`, SOF0 with the given dims (3 components), EOI. */
  def synthesizeJpeg(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 0xfffd, "COM segment payload too large")
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte)) // SOI
    out.write(Array[Byte](0xff.toByte, 0xe0.toByte)) // APP0
    out.write(be16(16))
    out.write("JFIF".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 1, 1, 0)) // NUL, version 1.1, units 0
    out.write(Array[Byte](0, 1, 0, 1, 0, 0)) // density 1x1, no thumbnail
    out.write(Array[Byte](0xff.toByte, 0xfe.toByte)) // COM
    out.write(be16(payload.length + 2))
    out.write(payload)
    out.write(Array[Byte](0xff.toByte, 0xc0.toByte)) // SOF0
    out.write(be16(17)) // 8 + 3 * components
    out.write(Array[Byte](8)) // precision
    out.write(be16(height))
    out.write(be16(width))
    out.write(Array[Byte](3)) // components
    out.write(Array[Byte](1, 0x22, 0)) // Y: 2x2 sampling, qtable 0
    out.write(Array[Byte](2, 0x11, 1)) // Cb
    out.write(Array[Byte](3, 0x11, 1)) // Cr
    out.write(Array[Byte](0xff.toByte, 0xda.toByte)) // SOS
    out.write(be16(12)) // 6 + 2 * components
    out.write(Array[Byte](3)) // components in scan
    out.write(Array[Byte](1, 0x00, 2, 0x11, 3, 0x11)) // (comp, dc/ac table)
    out.write(Array[Byte](0, 63, 0)) // spectral selection, approximation
    out.write(Array[Byte](0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  // ---- decoding ---------------------------------------------------------

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && PngSignature.indices.forall(i => b(i) == PngSignature(i))

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  /** Parse format and pixel dimensions from the payload bytes.
    * PNG: width/height are the first two IHDR fields (the IHDR chunk
    * must come first per the spec, so they sit at fixed offsets 16/20
    * after validating the chunk type). JPEG: walk the marker segments
    * skipping each by its declared length until a start-of-frame
    * (SOF0-SOF15 minus DHT/JPG/DAC) yields the dims. */
  def decodeDims(b: Array[Byte]): Dims =
    if (isPng(b)) {
      require(new String(b, 12, 4, "US-ASCII") == "IHDR", "PNG missing IHDR")
      Dims("png", readBe32(b, 16), readBe32(b, 20))
    } else if (isJpeg(b)) {
      var pos = 2
      while (pos + 3 < b.length) {
        require((b(pos) & 0xff) == 0xff, s"bad JPEG marker at $pos")
        val marker = b(pos + 1) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          require(pos + 9 <= b.length, "JPEG truncated inside SOF")
          return Dims("jpeg", readBe16(b, pos + 7), readBe16(b, pos + 5))
        }
        if (marker == 0xd9 || marker == 0xda) {
          throw new IllegalArgumentException("JPEG has no SOF before scan/EOI")
        }
        pos += 2 + readBe16(b, pos + 2)
      }
      throw new IllegalArgumentException("JPEG truncated before SOF")
    } else {
      throw new IllegalArgumentException("unknown image format")
    }

  /** Extract the embedded body bytes from a payload this codec
    * synthesized: the first IDAT chunk's data (PNG — chunk walk over
    * length/tag/crc framing) or the first COM segment's payload
    * (JPEG — marker walk, same as [[decodeDims]]). This is the
    * feature-extraction entry point: downstream byte-level features
    * are computed from the DECODED container, not from a side channel. */
  def extractBody(b: Array[Byte]): Array[Byte] =
    if (isPng(b)) {
      var pos = 8
      while (pos + 8 <= b.length) {
        val len = readBe32(b, pos)
        val tag = new String(b, pos + 4, 4, "US-ASCII")
        if (tag == "IDAT") return java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + len)
        if (tag == "IEND") throw new IllegalArgumentException("PNG has no IDAT")
        pos += 12 + len
      }
      throw new IllegalArgumentException("PNG truncated before IDAT")
    } else if (isJpeg(b)) {
      var pos = 2
      while (pos + 3 < b.length) {
        require((b(pos) & 0xff) == 0xff, s"bad JPEG marker at $pos")
        val marker = b(pos + 1) & 0xff
        if (marker == 0xfe) {
          val len = readBe16(b, pos + 2)
          return java.util.Arrays.copyOfRange(b, pos + 4, pos + 2 + len)
        }
        if (marker == 0xd9 || marker == 0xda) {
          throw new IllegalArgumentException("JPEG has no COM before scan/EOI")
        }
        pos += 2 + readBe16(b, pos + 2)
      }
      throw new IllegalArgumentException("JPEG truncated before COM")
    } else {
      throw new IllegalArgumentException("unknown image format")
    }
}
