package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the y4m synthesis/decode pair: round-trip of stream
  * parameters and frame bytes, the byte-size contract the p23 oracle
  * relies on, header token-order independence, and malformed-stream
  * rejection. */
class VideoCodecSpec extends AnyFunSuite {

  private val fills = Array[Byte](7, 'a', 0xff.toByte)

  test("decode recovers the synthesized parameters via a token walk") {
    val y4m = VideoCodec.synthesizeY4m(16, 12, 30000, 1001, fills)
    val info = VideoCodec.decodeY4m(y4m)
    assert(info.width == 16 && info.height == 12)
    assert(info.fpsNum == 30000 && info.fpsDen == 1001)
    assert(info.frameFirstBytes.toSeq == Seq(7, 'a'.toInt, 0xff))
  }

  test("header token order does not matter") {
    val a = VideoCodec.decodeY4m(
      VideoCodec.synthesizeY4m(8, 6, 25, 1, fills, altOrder = false))
    val b = VideoCodec.decodeY4m(
      VideoCodec.synthesizeY4m(8, 6, 25, 1, fills, altOrder = true))
    assert(a.width == b.width && a.height == b.height)
    assert(a.fpsNum == b.fpsNum && a.fpsDen == b.fpsDen)
    assert(a.frameFirstBytes.toSeq == b.frameFirstBytes.toSeq)
  }

  test("byte-size contract matches the p23 oracle arithmetic") {
    // total = len(header incl. newline) + nFrames * (6 + w*h*3/2)
    val y4m = VideoCodec.synthesizeY4m(16, 12, 25, 1, fills)
    val header = "YUV4MPEG2 W16 H12 F25:1 Ip A1:1 C420jpeg\n"
    assert(y4m.length == header.length + 3 * (6 + 16 * 12 * 3 / 2))
    val alt = VideoCodec.synthesizeY4m(16, 12, 25, 1, fills, altOrder = true)
    assert(alt.length == y4m.length) // same tokens, same length
  }

  test("zero frames is a valid stream") {
    val info = VideoCodec.decodeY4m(
      VideoCodec.synthesizeY4m(8, 6, 24, 1, Array.emptyByteArray))
    assert(info.frameFirstBytes.isEmpty)
  }

  test("malformed streams are rejected") {
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m("MPEG who?\n".getBytes("US-ASCII"))
    }
    val ok = VideoCodec.synthesizeY4m(8, 6, 25, 1, fills)
    // truncated inside the last frame payload
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(ok.dropRight(1))
    }
    // trailing garbage after the last frame fails exact consumption
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(ok :+ 0.toByte)
    }
    // odd dimensions are unrepresentable in C420
    intercept[IllegalArgumentException] {
      VideoCodec.synthesizeY4m(7, 6, 25, 1, fills)
    }
  }
}
