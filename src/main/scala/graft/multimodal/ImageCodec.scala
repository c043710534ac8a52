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

  // ---- pixel-level PNG (p63) -------------------------------------------

  /** PNG Paeth predictor (spec §9.4): closest of left/up/up-left to
    * the linear estimate, ties resolved left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Apply one PNG scanline filter (0 None, 1 Sub, 2 Up, 3 Average,
    * 4 Paeth) to raw value `cur` given the RAW left/up/up-left
    * neighbors, per spec §9: predictors read unfiltered bytes. */
  private def filterByte(ft: Int, cur: Int, left: Int, up: Int, ul: Int): Int =
    ft match {
      case 0 => cur
      case 1 => cur - left
      case 2 => cur - up
      case 3 => cur - (left + up) / 2
      case 4 => cur - paeth(left, up, ul)
      case _ => throw new IllegalArgumentException(s"bad PNG filter $ft")
    }

  /** Inverse of [[filterByte]] given the RECONSTRUCTED neighbors. */
  private def unfilterByte(ft: Int, f: Int, left: Int, up: Int, ul: Int): Int =
    ft match {
      case 0 => f
      case 1 => f + left
      case 2 => f + up
      case 3 => f + (left + up) / 2
      case 4 => f + paeth(left, up, ul)
      case _ => throw new IllegalArgumentException(s"bad PNG filter $ft")
    }

  /** Fully valid truecolor 8-bit PNG: `pixels` = row-major RGB
    * (width*height*3 bytes), each scanline filtered with
    * `filterOf(y)` ∈ 0..4, the filtered stream zlib-deflated and split
    * into ≤ 512-byte IDAT chunks (so decoders must concatenate the
    * IDAT sequence, not read one chunk). Decodable by JDK ImageIO
    * (pinned in ImageCodecSpec). */
  def synthesizePixelPng(width: Int, height: Int, pixels: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    val stride = width * 3
    require(pixels.length == stride * height, "pixels != w*h*3")
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = filterOf(y)
      raw((stride + 1) * y) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= 3) pixels(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) pixels((y - 1) * stride + i - 3) & 0xff else 0
        raw((stride + 1) * y + 1 + i) = (filterByte(ft, cur, left, up, ul) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      comp.write(buf, 0, n)
    }
    defl.end()
    val z = comp.toByteArray
    val ihdr = new ByteArrayOutputStream()
    ihdr.write(be32(width))
    ihdr.write(be32(height))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0))
    val out = new ByteArrayOutputStream()
    out.write(PngSignature)
    out.write(pngChunk("IHDR", ihdr.toByteArray))
    var off = 0
    while (off < z.length) {
      val n = math.min(512, z.length - off)
      out.write(pngChunk("IDAT", java.util.Arrays.copyOfRange(z, off, off + n)))
      off += n
    }
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decoded truecolor image: row-major RGB bytes plus the per-row
    * filter types the encoder chose. */
  final case class PixelImage(width: Int, height: Int,
      pixels: Array[Byte], filters: Array[Int])

  /** Full PNG pixel decode: IHDR dims, every IDAT chunk's data
    * concatenated and inflated (java.util.zip.Inflater), then the five
    * scanline-filter reconstructions applied per row. Supports what
    * [[synthesizePixelPng]] emits (8-bit truecolor, no interlace). */
  def decodePixels(b: Array[Byte]): PixelImage = {
    require(isPng(b), "not a PNG")
    require(new String(b, 12, 4, "US-ASCII") == "IHDR", "PNG missing IHDR")
    val width = readBe32(b, 16)
    val height = readBe32(b, 20)
    require(b(24) == 8 && b(25) == 2 && b(28) == 0,
      "only 8-bit truecolor non-interlaced PNG supported")
    val comp = new ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = readBe32(b, pos)
      val tag = new String(b, pos + 4, 4, "US-ASCII")
      require(pos + 8 + len <= b.length, s"PNG truncated inside $tag chunk")
      if (tag == "IDAT") comp.write(b, pos + 8, len)
      if (tag == "IEND") done = true
      pos += 12 + len
    }
    val infl = new java.util.zip.Inflater()
    infl.setInput(comp.toByteArray)
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var off = 0
    try {
      while (off < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, off, raw.length - off)
        require(n > 0 || !infl.needsInput(), "truncated zlib stream in IDAT")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"bad zlib stream in IDAT: ${e.getMessage}")
    } finally infl.end()
    require(off == raw.length, s"IDAT inflated to $off bytes, want ${raw.length}")
    val out = new Array[Byte](stride * height)
    val filters = new Array[Int](height)
    var y = 0
    while (y < height) {
      val ft = raw((stride + 1) * y) & 0xff
      filters(y) = ft
      var i = 0
      while (i < stride) {
        val f = raw((stride + 1) * y + 1 + i) & 0xff
        val left = if (i >= 3) out(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) out((y - 1) * stride + i - 3) & 0xff else 0
        out(y * stride + i) = (unfilterByte(ft, f, left, up, ul) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    PixelImage(width, height, out, filters)
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
