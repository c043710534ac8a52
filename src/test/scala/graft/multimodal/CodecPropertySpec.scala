package graft.multimodal

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the binary codecs: synth→decode round-trips
  * must hold for ANY dims/payload, not just the pinned examples. */
class CodecPropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, p)
    assert(res.passed, s"$name: $res")
  }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  private val dimGen: Gen[Int] = Gen.chooseNum(1, 0xffff)

  test("png synth/decode round-trips dims and body for any input") {
    check("png")(Prop.forAll(dimGen, dimGen, payloadGen) { (w, h, body) =>
      val png = ImageCodec.synthesizePng(w, h, body)
      ImageCodec.decodeDims(png) == ImageCodec.Dims("png", w, h) &&
        ImageCodec.extractBody(png).sameElements(body)
    })
  }

  test("jpeg synth/decode round-trips dims and body for any input") {
    check("jpeg")(Prop.forAll(dimGen, dimGen, payloadGen) { (w, h, body) =>
      val jpeg = ImageCodec.synthesizeJpeg(w, h, body)
      ImageCodec.decodeDims(jpeg) == ImageCodec.Dims("jpeg", w, h) &&
        ImageCodec.extractBody(jpeg).sameElements(body)
    })
  }

  test("wav synth/decode round-trips format and size for any input") {
    val rateGen = Gen.chooseNum(1, 192000)
    val chanGen = Gen.chooseNum(1, 8)
    check("wav")(Prop.forAll(rateGen, chanGen, payloadGen) { (rate, ch, body) =>
      val wav = AudioCodec.synthesizeWav(rate, ch, body)
      AudioCodec.decodeWav(wav) == AudioCodec.WavInfo(rate, ch, 16, body.length) &&
        wav.length == 78 + body.length + body.length % 2
    })
  }

  test("y4m synth/decode round-trips parameters for any input") {
    val evenDim = Gen.chooseNum(1, 64).map(_ * 2)
    val fpsGen = Gen.chooseNum(1, 60000)
    val fillsGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    check("y4m")(Prop.forAll(evenDim, evenDim, fpsGen, fpsGen, fillsGen,
      Gen.oneOf(true, false)) { (w, h, num, den, fills, alt) =>
      val y4m = VideoCodec.synthesizeY4m(w, h, num, den, fills, alt)
      val info = VideoCodec.decodeY4m(y4m)
      info.width == w && info.height == h &&
        info.fpsNum == num && info.fpsDen == den &&
        info.frameFirstBytes.toSeq == fills.toSeq.map(_ & 0xff)
    })
  }
}
