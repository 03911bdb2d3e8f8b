package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** REAL-decode laws for the audio family (q_multimodal_audio): the
  * clip bytes are genuine RIFF/WAVE PCM16 containers and the decoder is
  * `javax.sound.sampled.AudioSystem` — the audio twin of
  * MultimodalRealDecodeSpec's `javax.imageio` path. Features are
  * hand-checked against known sample sequences; corruption and
  * unsupported formats must report `decode_ok = false`, never a fake.
  */
class MultimodalAudioSpec extends AnyFunSuite {

  /** Arbitrary-content WAV builder (the fixture's [[Multimodal.wavBytes]]
    * is the closed-form corpus clip; specs need free sample control and
    * wrong-format containers for the negative paths).
    */
  private def wav(samples: Seq[Short], channels: Int = 1, bits: Int = 16,
      rate: Int = Multimodal.AudioRate): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * bytesPer)
    bb.putShort((channels * bytesPer).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(s => if (bits == 16) bb.putShort(s) else bb.put(s.toByte))
    bb.array
  }

  test("decode: hand-computed features from a known PCM sequence") {
    // signs: + - 0(nonneg) + → crossings at i=1 (+→−) and i=2 (−→+)
    val samples = Seq[Short](3000, -3000, 0, 6000)
    val Seq(row) = Multimodal.decodeAudioBatch(Seq(7L -> wav(samples)))
    assert(row.decode_ok)
    assert(row.sample_rate == 8000L)
    assert(row.n_samples == 4L)
    assert(row.duration_ms == 0L) // 4·1000 DIV 8000
    assert(row.peak_abs == 6000L)
    assert(row.sum_sq == 3000L * 3000 + 3000L * 3000 + 0L + 6000L * 6000)
    assert(row.zero_crossings == 2L)
  }

  test("decode: corpus synth → AudioSystem roundtrip matches the closed form") {
    val docId = 10L
    val nChars = 100L
    val n = (64 + nChars % 256).toInt
    val samples = (0 until n).map(i => (((docId + i) % 7 - 3) * 3000).toShort)
    val Seq(got) = Multimodal.decodeAudioBatch(
      Seq(docId -> Multimodal.wavBytes(docId, nChars)))
    assert(got.decode_ok && got.n_samples == n.toLong)
    assert(got.peak_abs == samples.map(s => math.abs(s.toLong)).max)
    assert(got.sum_sq == samples.map(s => s.toLong * s.toLong).sum)
    val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
    assert(got.zero_crossings == zc.toLong)
    assert(got.duration_ms == n.toLong * 1000 / 8000)
  }

  test("decode: corrupt container reports decode_ok = false with zeroed features") {
    val junk = Array.fill[Byte](64)(0x5a)
    val truncated = Multimodal.wavBytes(3L, 50L).take(20)
    for (bad <- Seq(junk, truncated, Array.empty[Byte])) {
      val Seq(row) = Multimodal.decodeAudioBatch(Seq(1L -> bad))
      assert(!row.decode_ok && row.n_samples == 0L && row.peak_abs == 0L &&
        row.sum_sq == 0L && row.zero_crossings == 0L,
        "corruption must not masquerade as a decoded clip")
    }
  }

  test("decode: unsupported formats (stereo, 8-bit) are rejected, not faked") {
    val stereo = wav(Seq[Short](1, 2, 3, 4), channels = 2)
    val eightBit = wav(Seq[Short](1, 2, 3, 4), bits = 8)
    for (bad <- Seq(stereo, eightBit)) {
      val Seq(row) = Multimodal.decodeAudioBatch(Seq(1L -> bad))
      assert(!row.decode_ok,
        "non-PCM16LE-mono payloads must report decode_ok = false")
    }
  }

  test("decode runs through AudioSystem (header parse is real)") {
    // a WAV whose declared data length exceeds the actual payload: the
    // JDK stream stops at the real bytes — a hand-rolled byte-offset
    // parser reading the declared length would throw or read garbage
    val full = wav(Seq[Short](1000, -1000, 1000, -1000))
    val lying = full.take(44 + 4) // header says 8 data bytes, 4 present
    val Seq(row) = Multimodal.decodeAudioBatch(Seq(1L -> lying))
    // AudioSystem surfaces the 2 readable frames
    assert(row.decode_ok && row.n_samples == 2L && row.zero_crossings == 1L)
  }
}
