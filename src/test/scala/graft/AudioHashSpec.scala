package graft

import graft.operators.Multimodal
import graft.plans.AudioHash
import org.scalatest.funsuite.AnyFunSuite

/** The WAV PCM energy-envelope hash (plans.AudioHash) against planted
  * fixtures, the JDK's own WAV reader, and the totality contract.
  */
class AudioHashSpec extends AnyFunSuite {

  /** A synthetic "tone-ish" signal with a deterministic envelope:
    * amplitude ramps per window so neighbor comparisons are stable. */
  private def pcm16(n: Int, ch: Int, amp: Int => Int): Array[Byte] = {
    val data = new Array[Byte](n * ch * 2)
    for (f <- 0 until n; c <- 0 until ch) {
      val v = amp(f) * (if ((f + c) % 2 == 0) 1 else -1)
      val p = (f * ch + c) * 2
      data(p) = (v & 0xff).toByte
      data(p + 1) = ((v >> 8) & 0xff).toByte
    }
    data
  }

  test("identical audio hashes identically; uniform gain preserves the envelope hash") {
    val n = 65 * 4
    def amp(f: Int): Int = 100 + (f / 65) * 997 + (f % 13) * 3
    val wav = Multimodal.buildWav(1, 8000, 16, pcm16(n, 1, amp))
    val h1 = AudioHash.ahash(wav)
    assert(h1 != null)
    assert(AudioHash.ahash(wav.clone()) == h1)
    // uniform gain ×2: every energy scales by 4 — every comparison,
    // and with it the hash, is unchanged (the envelope-gradient
    // invariance byte hashing cannot give)
    val gained = Multimodal.buildWav(1, 8000, 16, pcm16(n, 1, f => amp(f) * 2))
    assert(AudioHash.ahash(gained) == h1, "gain must not move the hash")
  }

  test("small dither moves few bits; unrelated audio moves many") {
    val n = 65 * 4
    def amp(f: Int): Int = 200 + (f / 65) * 1499 + (f % 11) * 5
    val base = AudioHash.ahash(Multimodal.buildWav(1, 8000, 16, pcm16(n, 1, amp)))
    // ±1-sample dither: window energies barely move
    val dith = AudioHash.ahash(Multimodal.buildWav(1, 8000, 16,
      pcm16(n, 1, f => amp(f) + (f % 3) - 1)))
    assert(java.lang.Long.bitCount(base ^ dith) <= Multimodal.AudioMaxHamming,
      s"dither moved ${java.lang.Long.bitCount(base ^ dith)} bits")
    // unrelated planted noise: far in hamming space
    val other = AudioHash.ahash(Multimodal.buildWav(1, 8000, 16,
      pcm16(n, 1, f => math.abs(Multimodal.plantedSamp(99L, f, 0)) / 4)))
    assert(java.lang.Long.bitCount(base ^ other) > 16,
      s"unrelated audio landed ${java.lang.Long.bitCount(base ^ other)} bits away")
  }

  test("multi-channel mono fold and the equal-window truncation rule") {
    val n = 65 * 2
    def amp(f: Int): Int = 50 + (f / 65) * 800
    // stereo whose channels cancel in half the frames exercises the
    // SUM (not per-channel) fold
    val stereo = Multimodal.buildWav(2, 16000, 16, pcm16(n, 2, amp))
    assert(AudioHash.ahash(stereo) != null)
    // a ≤ win-1 frame tail is truncated: hash equals the un-tailed one
    val noTail = Multimodal.buildWav(1, 8000, 16, pcm16(n, 1, amp))
    val tail = Multimodal.buildWav(1, 8000, 16, pcm16(n + 1, 1, amp))
    assert(AudioHash.ahash(tail) == AudioHash.ahash(noTail),
      "sub-window tail must not change the hash")
    // one more WHOLE window's worth changes the window length → may move
    val n3 = 65 * 3
    assert(AudioHash.ahash(Multimodal.buildWav(1, 8000, 16,
      pcm16(n3, 1, amp))) != null)
  }

  test("planted PCM matches javax.sound.sampled frame for frame") {
    val id = 7L // odd channels branch: 2 channels
    val ch = Multimodal.plantedChannels(id)
    val n = Multimodal.audioFrames(id)
    val data = new Array[Byte](n * ch * 2)
    for (f <- 0 until n; c <- 0 until ch) {
      val v = Multimodal.plantedSamp(id, f, c)
      val p = (f * ch + c) * 2
      data(p) = (v & 0xff).toByte
      data(p + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = Multimodal.buildWav(ch, Multimodal.plantedRate(id), 16, data)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getChannels == ch && fmt.getSampleSizeInBits == 16)
    assert(fmt.getSampleRate.toInt == Multimodal.plantedRate(id))
    val raw = in.readAllBytes()
    assert(raw.length >= n * ch * 2)
    for (f <- 0 until n; c <- 0 until ch) {
      val p = (f * ch + c) * 2
      val jv = ((raw(p) & 0xff) | (raw(p + 1) << 8)).toShort.toInt
      assert(jv == Multimodal.plantedSamp(id, f, c),
        s"frame $f ch $c: JDK reads $jv")
    }
    assert(AudioHash.ahash(wav) != null)
  }

  test("totality: malformed WAV payloads are NULL, never a throw") {
    // too short to hold 65 frames
    assert(AudioHash.ahash(
      Multimodal.buildWav(1, 8000, 16, new Array[Byte](64 * 2))) == null)
    // non-PCM format code
    val w = Multimodal.buildWav(1, 8000, 16, new Array[Byte](65 * 2))
    val bad = w.clone(); bad(20) = 3 // IEEE float format
    assert(AudioHash.ahash(bad) == null)
    // 24-bit samples: out of decode scope
    val w24 = w.clone(); w24(34) = 24
    assert(AudioHash.ahash(w24) == null)
    // truncations at chunk boundaries
    for (cut <- Seq(4, 12, 30, 44, 60))
      assert(AudioHash.ahash(java.util.Arrays.copyOf(w, cut)) == null)
    // adversarial RIFF size fields must not loop or overflow
    val loop = w.clone()
    loop(16) = 0xff.toByte; loop(17) = 0xff.toByte
    loop(18) = 0xff.toByte; loop(19) = 0xff.toByte
    AudioHash.ahash(loop) // any result, no throw
    // PNG/JPEG payloads are not audio
    assert(AudioHash.ahash(Multimodal.buildPng(8, 8)) == null)
    assert(AudioHash.ahash(Multimodal.buildJpeg(8, 8, 3)) == null)
  }

  test("mm_audio kernel == direct recompute on a planted doc (both windows paths)") {
    for (id <- Seq(3L, 4L, 10L, 13L)) {
      val ch = Multimodal.plantedChannels(id)
      val n = Multimodal.audioFrames(id)
      val data = new Array[Byte](n * ch * 2)
      for (f <- 0 until n; c <- 0 until ch) {
        val v = Multimodal.plantedSamp(id, f, c)
        val p = (f * ch + c) * 2
        data(p) = (v & 0xff).toByte
        data(p + 1) = ((v >> 8) & 0xff).toByte
      }
      val got = AudioHash.ahash(
        Multimodal.buildWav(ch, Multimodal.plantedRate(id), 16, data))
      // independent recompute of the definition, incl. onset trim
      val mono = Array.tabulate(n) { f =>
        (0 until ch).map(Multimodal.plantedSamp(id, f, _)).sum
      }
      val thr = mono.map(math.abs).max / 64
      val f0 = mono.indexWhere(m => math.abs(m) > thr)
      val f1 = mono.lastIndexWhere(m => math.abs(m) > thr)
      val win = (f1 - f0 + 1) / AudioHash.Windows
      val e = Array.tabulate(AudioHash.Windows) { w =>
        (f0 + w * win until f0 + (w + 1) * win).map { f =>
          val m = mono(f).toLong; m * m
        }.sum
      }
      var exp = 0L
      for (i <- 0 until 64) if (e(i + 1) > e(i)) exp |= 1L << i
      assert(got != null && got.longValue == exp, s"doc $id")
    }
  }

  test("onset alignment: silence-padded and trimmed copies hash identically (r14)") {
    val n = 65 * 3
    def amp(f: Int): Int = 300 + (f / 65) * 1201 + (f % 7) * 11
    val base = Multimodal.buildWav(1, 8000, 16, pcm16(n, 1, amp))
    val h = AudioHash.ahash(base)
    assert(h != null)
    // a re-upload with one full window (~1.5%) of leading silence and
    // a half window of trailing silence: the pre-r14 fixed grid shifted
    // every window boundary here and the hash moved arbitrarily — the
    // firewall evasion VERDICT r13 #5 named. Active-span alignment
    // makes it hash-identical (silence is below peak/64, the signal
    // frames all above).
    val lead = 65
    val tail = 32
    val padded = new Array[Byte]((lead + n + tail) * 2)
    System.arraycopy(pcm16(n, 1, amp), 0, padded, lead * 2, n * 2)
    assert(AudioHash.ahash(Multimodal.buildWav(1, 8000, 16, padded)) == h,
      "silence padding must not move the hash")
    // and the padded copy under ×3 gain STILL matches: the trim
    // threshold is peak-relative, so gain cannot move the span
    val gained = new Array[Byte]((lead + n + tail) * 2)
    System.arraycopy(pcm16(n, 1, f => amp(f) * 3), 0, gained,
      lead * 2, n * 2)
    assert(AudioHash.ahash(Multimodal.buildWav(1, 8000, 16, gained)) == h,
      "gain x padding must not move the hash")
    // the firewall consequence: identical hashes band-collide, so a
    // trimmed/padded re-upload now flags against the ahash_bands store
  }
}
