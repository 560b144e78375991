package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio energy-difference fingerprint: invariances, planted
  * near-dup geometry, input gating, and the banded-Hamming pair face.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def fp(id: Long, frames: Int = 130): Long =
    Multimodal.audioFingerprint(
      Multimodal.wavPcmBytes(1, 8000, frames,
        (t, _) => Multimodal.synthPcm(id)(t * 130 / frames))).get

  test("fingerprint is invariant to frame duplication (trivial resample)") {
    // 260 frames playing each 130-frame sample twice: every window holds
    // twice the energy, all comparisons unchanged
    assert(fp(7L, frames = 260) === fp(7L, frames = 130))
    // and to uniform volume scaling (synthPcm stays within half-range,
    // so doubling cannot clip)
    val loud = Multimodal.audioFingerprint(
      Multimodal.wavPcmBytes(1, 8000, 130,
        (t, _) => 2 * Multimodal.synthPcm(7L)(t))).get
    assert(loud === fp(7L))
  }

  test("planted variants sit within hamming 2 of base; other groups far") {
    for (grp <- Seq(0L, 3L, 11L); v <- 1 to 3) {
      val h = java.lang.Long.bitCount(fp(grp * 4) ^ fp(grp * 4 + v))
      assert(h <= 2, s"group $grp variant $v drifted $h bits")
    }
    val far = java.lang.Long.bitCount(fp(0L) ^ fp(400L))
    assert(far > 8, s"unrelated groups too close: $far bits")
  }

  test("stereo sums channels; non-PCM and too-short clips yield no fingerprint") {
    // stereo with both channels = mono signal: energies double, bits equal
    val stereo = Multimodal.audioFingerprint(
      Multimodal.wavPcmBytes(2, 8000, 130,
        (t, _) => Multimodal.synthPcm(5L)(t))).get
    assert(stereo === fp(5L))
    assert(Multimodal.audioFingerprint(
      Multimodal.wavPcmBytes(1, 8000, 64, (t, _) => t)).isEmpty, "< 65 frames")
    assert(Multimodal.audioFingerprint("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.audioFingerprint(Multimodal.bmpBytes(9, 8)).isEmpty)
  }

  test("MP3 header walk: facts, ID3v2 skip, VBR, truncation; decode stays refused") {
    // 128 kbps @ 48000, stereo, 4 frames, 64-byte ID3v2 payload:
    // frameLen = 144000*128/48000 = 384
    val mp3 = Multimodal.mp3Bytes(srIdx = 1, brIdx = 9, mono = false,
      frames = 4, id3Payload = 64)
    assert(mp3.length === 74 + 4 * 384)
    assert(Multimodal.mp3Facts(mp3) === Some((2, 48000, 4608L)))
    val feats = Multimodal.decodeOne(3L, mp3)
    assert((feats.format_guess, feats.channels, feats.sample_rate,
      feats.n_samples) === (("mp3", Some(2), Some(48000), Some(4608L))))
    // VBR: a 320 kbps frame follows a 128 kbps one — each frame's own
    // header sizes it; facts come from the first
    val vbr = Multimodal.mp3Bytes(0, 9, mono = true, frames = 1) ++
      Multimodal.mp3Bytes(0, 14, mono = true, frames = 1)
    assert(Multimodal.mp3Facts(vbr) === Some((1, 44100, 2304L)))
    // a cut inside the last frame drops it (log-and-truncate)
    assert(Multimodal.mp3Facts(java.util.Arrays.copyOf(mp3, mp3.length - 7))
      === Some((2, 48000, 3456L)))
    // payload decode stays a documented refusal
    assert(Multimodal.audioFingerprint(mp3).isEmpty)
    // free-format bitrate and garbage refuse; text stays text
    assert(Multimodal.mp3Facts("IDx plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeOne(4L, "plain".getBytes("UTF-8")).format_guess
      === "utf8-text")
  }

  test("ADTS header walk: facts, multi-frame walk, refusals") {
    // sfIdx 7 = 22050 Hz, 2 channels, 3 frames of 25-byte payloads
    val aac = Multimodal.adtsBytes(sfIdx = 7, chanCfg = 2, frames = 3,
      payload = 25)
    assert(aac.length === 3 * 32)
    assert(Multimodal.adtsFacts(aac) === Some((2, 22050, 3072L)))
    val feats = Multimodal.decodeOne(9L, aac)
    assert((feats.format_guess, feats.channels, feats.sample_rate,
      feats.n_samples) === (("aac-adts", Some(2), Some(22050), Some(3072L))))
    // truncation drops the cut frame
    assert(Multimodal.adtsFacts(java.util.Arrays.copyOf(aac, aac.length - 2))
      === Some((2, 22050, 2048L)))
    // PCE-defined channel config 0 refuses (facts would be a guess)
    assert(Multimodal.adtsFacts(
      Multimodal.adtsBytes(7, chanCfg = 0, frames = 1, payload = 8)).isEmpty)
    // an MP3 sync is NOT ADTS (layer bits differ) and vice versa
    val mp3 = Multimodal.mp3Bytes(0, 9, mono = true, frames = 1)
    assert(Multimodal.adtsFacts(mp3).isEmpty)
    assert(Multimodal.mp3Facts(aac).isEmpty)
    assert(Multimodal.audioFingerprint(aac).isEmpty)
  }

  test("audioNearDupPairs finds exactly the planted intra-group pairs") {
    val media = Multimodal.syntheticAudio((0L until 16L).toDF("doc_id"), "doc_id")
    val pairs = Multimodal.audioNearDupPairs(spark, media, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every intra-group pair is within hamming 3 via the <=2-per-variant
    // geometry only for variant-vs-base; variant-vs-variant can reach 4 —
    // so require at least all base-variant pairs, and no cross-group pair
    for (g <- 0L until 4L; v <- 1L to 3L)
      assert(pairs.contains((4 * g, 4 * g + v)),
        s"missing base-variant pair (${4 * g}, ${4 * g + v})")
    assert(pairs.forall { case (x, y) => x / 4 === y / 4 },
      s"cross-group false positive in $pairs")
  }

  test("IMA-ADPCM: the decoder follows the published predictor/step walk") {
    // a hand-decodable stream from a known state: pred=0, idx=0 (step 7);
    // nibble bits (2,1,0) add (step, step>>1, step>>2) on top of step>>3
    //   nibble 0  -> diff = 7>>3 = 0,            pred 0,   idx max(0,-1) = 0
    //   nibble 4  -> diff = 0 + 7 = 7,           pred 7,   idx 0+2 = 2 (step 9)
    //   nibble 7  -> diff = 1+2+4+9 = 16,        pred 23,  idx 2+8 = 10 (step 19)
    //   nibble 15 -> diff = -(2+4+9+19) = -34,   pred -11, idx 10+8 = 18
    val wav = Multimodal.adpcmWavBytes(8000, 0, 0, Array(0, 4, 7, 15))
    val got = {
      // decode via the internal walk directly (5 samples incl. header)
      val dataOff = 48
      Multimodal.imaAdpcmMono(wav, dataOff, wav.length - dataOff,
        blockAlign = 6, samplesPerBlock = 5).toSeq
    }
    assert(got === Seq(0, 0, 7, 23, -11))

    // clamps: all-max nibbles from a high predictor pin to int16 range
    val hot = Multimodal.adpcmWavBytes(8000, 32000, 88, Array.fill(8)(7))
    val hotSamples = Multimodal.imaAdpcmMono(hot, 48, hot.length - 48, 8, 9)
    assert(hotSamples.max === 32767, s"no int16 clamp: ${hotSamples.toSeq}")
  }

  test("IMA-ADPCM fingerprints: planted geometry holds; corpus gates like PCM") {
    val media = Multimodal.syntheticAdpcmAudio((0L until 16L).toDF("doc_id"), "doc_id")
    val fps = Multimodal.audioFingerprint64(spark, media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps.size === 16, "every ADPCM clip must fingerprint")
    // unrelated groups decorrelate (different seed predictors, indexes,
    // and nibble streams)
    assert(java.lang.Long.bitCount(fps(0L) ^ fps(4L)) > 8)
    // stereo ADPCM decodes via the 4-byte-word channel interleave: both
    // channels carrying the same stream double every window's energy and
    // leave the sign bits — hence the fingerprint — unchanged vs mono
    val nibbles = Array.tabulate(128)(j => (j * 7 + 3) % 16)
    val mono = Multimodal.audioFingerprint(
      Multimodal.adpcmWavBytes(8000, 120, 30, nibbles))
    val stereo = Multimodal.audioFingerprint(
      Multimodal.adpcmWavBytes(8000, 120, 30, nibbles, channels = 2))
    assert(mono.isDefined && stereo === mono)
    // non-integer-spec codecs stay refusals: an MP3-ish format tag is None
    val mp3ish = Multimodal.adpcmWavBytes(8000, 0, 0, nibbles)
    mp3ish(20) = 0x55   // format tag 0x0055 = MPEG layer 3
    assert(Multimodal.audioFingerprint(mp3ish).isEmpty)
  }
}
