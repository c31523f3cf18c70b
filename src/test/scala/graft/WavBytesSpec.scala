package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 hand-rolled RIFF/WAVE writer in Multimodal.encodeWav to the
  * AudioSystem.write bytes it replaced: the q182 oracle replays the byte
  * arithmetic (44-byte canonical framing + 26 for the planted LIST chunk)
  * and `wavWithListChunk` walks the chunk layout, so the encoder swap must
  * be BYTE-identical, not just decode-identical. */
class WavBytesSpec extends AnyFunSuite {

  /** The pre-r19 encoder, frozen here as the reference: synthesize the same
    * deterministic PCM and containerize via AudioSystem. */
  private def audioSystemWav(d: Long): Array[Byte] = {
    val n   = 3 * 160 // AudioWindows * WindowSamples
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = ((d * 7919L + t * 104729L) % 4096L).toInt - 2048
      pcm(2 * t) = (s & 0xff).toByte
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000.0f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("hand-rolled encodeWav is byte-identical to AudioSystem.write") {
    // ids spanning small/large, the %11 q182-variant bases, and sign edges
    val ids = Seq(0L, 1L, 7L, 11L, 22L, 997L, 4999L, 123456L, 4999999L)
    ids.foreach { d =>
      val manual = graft.operators.Multimodal.encodeWav(d)
      val ref    = audioSystemWav(d)
      assert(manual.length == ref.length, s"length differs for doc $d: ${manual.length} vs ${ref.length}")
      assert(java.util.Arrays.equals(manual, ref), s"bytes differ for doc $d")
    }
  }
}
