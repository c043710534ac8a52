package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import org.scalatest.funsuite.AnyFunSuite

/** Pins the WAV synthesis/decode pair: round-trip of format fields,
  * the byte-size contract the p18 oracle relies on, RIFF padding, and
  * an independent parse by the JDK's own audio header reader. */
class AudioCodecSpec extends AnyFunSuite {

  private val payload = "pcm payload bytes".getBytes("UTF-8") // odd length

  test("decode recovers the synthesized parameters via a chunk walk") {
    val wav = AudioCodec.synthesizeWav(16000, 2, payload)
    val info = AudioCodec.decodeWav(wav)
    assert(info == AudioCodec.WavInfo(16000, 2, 16, payload.length))
  }

  test("byte-size contract matches the p18 oracle arithmetic") {
    // total = 78 + dataLen + dataLen % 2
    assert(AudioCodec.synthesizeWav(8000, 1, payload).length ==
      78 + payload.length + payload.length % 2)
    assert(AudioCodec.synthesizeWav(8000, 1, Array.emptyByteArray).length == 78)
    val even = "even-length bytes!".getBytes("UTF-8")
    assert(AudioCodec.synthesizeWav(8000, 1, even).length == 78 + even.length)
  }

  test("jdk AudioSystem independently reads the same format") {
    val wav = AudioCodec.synthesizeWav(24000, 2, payload)
    val fmt = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(wav)).getFormat
    assert(fmt.getSampleRate == 24000f)
    assert(fmt.getChannels == 2)
    assert(fmt.getSampleSizeInBits == 16)
  }

  test("malformed streams are rejected") {
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav("not audio at all".getBytes("UTF-8"))
    }
    // truncate before the fmt chunk: RIFF(12) + LIST header only
    val wav = AudioCodec.synthesizeWav(8000, 1, payload)
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(wav.take(20))
    }
  }
}
