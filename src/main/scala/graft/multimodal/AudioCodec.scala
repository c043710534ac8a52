package graft.multimodal

import java.io.ByteArrayOutputStream

/** Dependency-free WAV (RIFF) synthesis + header parsing — the audio
  * leg of the multimodal column plumbing (p18), sibling of
  * [[ImageCodec]]. Synthesis produces a structurally valid 16-bit PCM
  * WAV: RIFF header, a LIST/INFO chunk BEFORE fmt (so decoding
  * requires a genuine chunk walk, not fixed offsets), the fmt chunk,
  * and a data chunk carrying the payload (padded to even length per
  * RIFF, with the size field keeping the true length). The decoder
  * recovers sample rate / channels / bits / data length by parsing
  * the actual bytes. Streams parse under the JDK's own
  * `javax.sound.sampled.AudioSystem` header reader (pinned by
  * AudioCodecSpec).
  *
  * Size contract (p18 oracle): LIST body is fixed at 26 bytes, so
  * total = 12 (RIFF) + 34 (LIST) + 24 (fmt) + 8 + dataLen + dataLen%2.
  */
object AudioCodec {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, dataLen: Int)

  /** Fixed LIST/INFO body: 'INFO' + ISFT subchunk header (8) + a
    * 14-byte even-length software tag = 26 bytes total. */
  private val ListBody: Array[Byte] = {
    val tag = "graft-wav-syn.".getBytes("US-ASCII") // 14 bytes, even
    require(tag.length == 14)
    "INFO".getBytes("US-ASCII") ++ "ISFT".getBytes("US-ASCII") ++
      le32(tag.length) ++ tag
  }

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** 16-bit PCM WAV with the given rate/channels and `data` as the
    * (unaligned, opaque) data chunk payload. */
  def synthesizeWav(sampleRate: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val fmt = new ByteArrayOutputStream()
    fmt.write(le16(1)) // PCM
    fmt.write(le16(channels))
    fmt.write(le32(sampleRate))
    fmt.write(le32(sampleRate * blockAlign)) // byte rate
    fmt.write(le16(blockAlign))
    fmt.write(le16(bits))
    val body = new ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII"))
    body.write(le32(ListBody.length))
    body.write(ListBody)
    body.write("fmt ".getBytes("US-ASCII"))
    body.write(le32(16))
    body.write(fmt.toByteArray)
    body.write("data".getBytes("US-ASCII"))
    body.write(le32(data.length))
    body.write(data)
    if (data.length % 2 == 1) body.write(0) // RIFF pad to even
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.size()))
    out.write(body.toByteArray)
    out.toByteArray
  }

  /** Parse format parameters from the bytes by walking RIFF chunks
    * (LIST before fmt means fixed offsets would mis-parse). */
  def decodeWav(b: Array[Byte]): WavInfo = {
    require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var dataLen = -1
    var pos = 12
    while (pos + 8 <= b.length && (sampleRate < 0 || dataLen < 0)) {
      val t = tag(b, pos)
      val len = readLe32(b, pos + 4)
      if (t == "fmt ") {
        require(len >= 16, "fmt chunk too short")
        require(readLe16(b, pos + 8) == 1, "not PCM")
        channels = readLe16(b, pos + 10)
        sampleRate = readLe32(b, pos + 12)
        bits = readLe16(b, pos + 22)
      } else if (t == "data") {
        dataLen = len
      }
      pos += 8 + len + (len & 1) // chunks are even-aligned
    }
    require(sampleRate > 0 && channels > 0, "WAV missing fmt chunk")
    require(dataLen >= 0, "WAV missing data chunk")
    WavInfo(sampleRate, channels, bits, dataLen)
  }
}
