package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

class ImageCodecSpec extends AnyFunSuite {

  private val payload = "the quick brown fox".getBytes("UTF-8")

  test("png: decoder recovers the synthesized dimensions") {
    val dims = ImageCodec.decodeDims(ImageCodec.synthesizePng(576, 480, payload))
    assert(dims == ImageCodec.Dims("png", 576, 480))
  }

  test("jpeg: marker walk skips APP0+COM and finds SOF0 dims") {
    val dims = ImageCodec.decodeDims(ImageCodec.synthesizeJpeg(320, 200, payload))
    assert(dims == ImageCodec.Dims("jpeg", 320, 200))
  }

  test("byte-size contract matches the p10 oracle arithmetic") {
    // PNG: 8 sig + 25 IHDR + (12 + n) IDAT + 12 IEND; JPEG: 59 + n.
    assert(ImageCodec.synthesizePng(1, 1, payload).length == 57 + payload.length)
    assert(ImageCodec.synthesizeJpeg(1, 1, payload).length == 59 + payload.length)
    assert(ImageCodec.synthesizePng(1, 1, Array.emptyByteArray).length == 57)
    assert(ImageCodec.synthesizeJpeg(1, 1, Array.emptyByteArray).length == 59)
  }

  test("jdk ImageIO independently reads the same header dimensions") {
    // Cross-check our synthesis against the JDK's own header parsers
    // (getWidth/getHeight read metadata only, so the fake IDAT body is
    // never decompressed).
    def jdkDims(bytes: Array[Byte]): (Int, Int) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        assert(readers.hasNext, "JDK found no reader for synthesized bytes")
        val r = readers.next()
        r.setInput(iis)
        try (r.getWidth(0), r.getHeight(0))
        finally r.dispose()
      } finally iis.close()
    }
    assert(jdkDims(ImageCodec.synthesizePng(123, 45, payload)) == ((123, 45)))
    assert(jdkDims(ImageCodec.synthesizeJpeg(321, 54, payload)) == ((321, 54)))
  }

  test("unknown and truncated payloads are rejected") {
    intercept[IllegalArgumentException] {
      ImageCodec.decodeDims("not an image".getBytes("UTF-8"))
    }
    val jpeg = ImageCodec.synthesizeJpeg(320, 200, payload)
    intercept[IllegalArgumentException] {
      // Cut before SOF0: SOI(2) + APP0(18) + COM(4 + n) ends right
      // where SOF0 starts.
      ImageCodec.decodeDims(jpeg.take(2 + 18 + 4 + payload.length))
    }
  }
}
