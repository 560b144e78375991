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
}
