package graft.multimodal

import java.io.ByteArrayOutputStream

/** Dependency-free YUV4MPEG2 (`.y4m`) synthesis + parsing — the video
  * leg of the multimodal column plumbing (p23), sibling of
  * [[ImageCodec]] (p10/p16) and [[AudioCodec]] (p18). YUV4MPEG2 is the
  * uncompressed-video interchange format used by the reference video
  * toolchain ecosystem (mjpegtools/ffmpeg): an ASCII parameter header
  * (`YUV4MPEG2 W… H… F…:… Ip A1:1 C420jpeg\n`) followed by frames,
  * each a `FRAME\n` marker plus a raw 4:2:0 plane payload of exactly
  * `w*h*3/2` bytes.
  *
  * The spec allows header parameters in any order, so synthesis
  * emits two token orders (variant flag) and the decoder recovers
  * width/height/frame-rate by a genuine prefix-tagged token walk, not
  * fixed offsets. Frame count and per-frame leading bytes come from
  * walking the actual FRAME framing; a stream that does not consume
  * exactly to its end is rejected.
  *
  * Size contract (p23 oracle): total bytes = header-line length
  * (ASCII, including the newline) + nFrames * (6 + w*h*3/2).
  */
object VideoCodec {

  final case class Y4mInfo(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frameFirstBytes: Array[Int])

  /** One solid-color frame per entry of `frameFills`; 4:2:0 subsampling
    * requires even dimensions. `altOrder` moves the colorspace token to
    * the front (both orders are legal y4m). */
  def synthesizeY4m(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frameFills: Array[Byte], altOrder: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      "C420 frames need positive even dimensions")
    require(fpsNum > 0 && fpsDen > 0, "frame rate must be positive")
    val dims = s"W$width H$height F$fpsNum:$fpsDen Ip A1:1"
    val header =
      if (altOrder) s"YUV4MPEG2 C420jpeg $dims\n"
      else s"YUV4MPEG2 $dims C420jpeg\n"
    val frameSize = width * height * 3 / 2
    val out = new ByteArrayOutputStream(
      header.length + frameFills.length * (6 + frameSize))
    out.write(header.getBytes("US-ASCII"))
    frameFills.foreach { fill =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      var i = 0
      while (i < frameSize) { out.write(fill.toInt); i += 1 }
    }
    out.toByteArray
  }

  /** Parse stream parameters and frame framing from the bytes. Header
    * tokens are matched by their single-letter tag in any order; the
    * byte count of every frame is derived from the parsed W/H (4:2:0),
    * so a wrong header parse breaks the frame walk and is caught by
    * the exact-consumption check. */
  def decodeY4m(b: Array[Byte]): Y4mInfo = {
    val nl = b.indexOf('\n'.toByte)
    require(nl > 0, "no y4m header line")
    val header = new String(b, 0, nl, "US-ASCII")
    val tokens = header.split(" ").filter(_.nonEmpty)
    require(tokens.headOption.contains("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    var width = -1
    var height = -1
    var fpsNum = -1
    var fpsDen = -1
    tokens.drop(1).foreach { t =>
      t.charAt(0) match {
        case 'W' => width = t.drop(1).toInt
        case 'H' => height = t.drop(1).toInt
        case 'F' =>
          val Array(n, d) = t.drop(1).split(":", 2)
          fpsNum = n.toInt
          fpsDen = d.toInt
        case 'C' =>
          require(t.startsWith("C420"), s"unsupported colorspace $t")
        case _ => () // Ip / A1:1 / X extensions: irrelevant to the decode
      }
    }
    require(width > 0 && height > 0, "y4m header missing W/H")
    require(fpsNum > 0 && fpsDen > 0, "y4m header missing F")
    val frameSize = width * height * 3 / 2
    val firsts = Vector.newBuilder[Int]
    var pos = nl + 1
    while (pos < b.length) {
      val fnl = b.indexOf('\n'.toByte, pos)
      require(fnl >= 0, "truncated FRAME marker")
      val marker = new String(b, pos, fnl - pos, "US-ASCII")
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker, got '$marker'")
      require(fnl + 1 + frameSize <= b.length, "truncated frame payload")
      firsts += (b(fnl + 1) & 0xff)
      pos = fnl + 1 + frameSize
    }
    require(pos == b.length, "trailing bytes after last frame")
    Y4mInfo(width, height, fpsNum, fpsDen, firsts.result().toArray)
  }
}
