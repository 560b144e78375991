package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Video near-dup: the motion-BMP container walk, per-frame hashing, and
  * the set-Jaccard pair geometry over the planted corpus.
  */
class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("the container walk splits frames by each BMP's own size field") {
    val media = Multimodal.syntheticVideos(Seq(0L).toDF("doc_id"), "doc_id")
      .collect().head.getAs[Array[Byte]]("media")
    val frames = Multimodal.videoFrames(media)
    assert(frames.size === 10)
    // frame extents tile the payload exactly
    assert(frames.head._1 === 0)
    assert(frames.map(_._2).sum === media.length)
    assert(frames.sliding(2).forall { case Seq((o1, l1), (o2, _)) => o2 === o1 + l1 })
    // a corrupt tail truncates the walk instead of guessing
    val cut = java.util.Arrays.copyOf(media, media.length - 7)
    assert(Multimodal.videoFrames(cut).size === 9)
    assert(Multimodal.videoFrames("no frames here".getBytes("UTF-8")).isEmpty)
  }

  test("per-frame hashes equal the single-image hashes of the frame ids") {
    val hashes = Multimodal.videoFrameHashes(spark,
        Multimodal.syntheticVideos(Seq(8L).toDF("doc_id"), "doc_id"))
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(hashes.size === 10)
    // video 8 = group 2 base: frame k is the synthGray image of 2000 + 4k
    hashes.foreach { case (k, h) =>
      val expected = Multimodal.dHashGray(
        Multimodal.bmpGrayBytes(9, 8, Multimodal.synthGray(2000L + 4 * k))).get
      assert(h === expected, s"frame $k hash drifted")
    }
  }

  test("planted pairs: every base-variant pairs >= 0.8, no cross-group") {
    val media = Multimodal.syntheticVideos((0L until 16L).toDF("doc_id"), "doc_id")
    val pairs = Multimodal.videoNearDupPairs(spark, media, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    for (g <- 0L until 4L; v <- 1L to 3L) {
      val j = pairs.get((4 * g, 4 * g + v))
      assert(j.isDefined, s"missing base-variant pair (${4 * g}, ${4 * g + v})")
      // 9/11 when all 10 frame hashes are distinct; an intra-video hash
      // collision shrinks a set and RAISES the ratio (e.g. 7/8) — the
      // oracle replays the same collisions, so exactness lives there
      assert(j.get >= 9.0 / 11.0 - 1e-9, s"jaccard ${j.get} below 9/11")
    }
    assert(pairs.keySet.forall { case (x, y) => x / 4 == y / 4 },
      s"cross-group pair leaked: ${pairs.keySet}")
  }

  test("AVI/RIFF walk: DIB frames hash identically to the motion-BMP frames") {
    // the same synthetic corpus through the two REAL containers must agree
    // bit for bit (DIB bits are the BMP pixel array)
    val ids = (0L until 8L).toDF("doc_id")
    val bmp = Multimodal.videoFrameHashes(spark,
        Multimodal.syntheticVideos(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val avi = Multimodal.videoFrameHashes(spark,
        Multimodal.syntheticAviVideos(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(avi === bmp)
    // and the near-dup pairs ride the same machinery unchanged
    val pairs = Multimodal.videoNearDupPairs(spark,
        Multimodal.syntheticAviVideos(ids, "doc_id"), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty && pairs.forall { case (x, y) => x / 4 == y / 4 })
  }

  test("AVI walk facts: format from hdrl, frame chunks from movi, truncation") {
    val frames = (0 until 3).map(k =>
      java.util.Arrays.copyOfRange(
        Multimodal.bmpGrayBytes(9, 8, Multimodal.synthGray(4L * k)), 54, 54 + 28 * 8))
    val avi = Multimodal.aviBytes(9, 8, "DIB ", frames)
    assert(Multimodal.aviVideoFormat(avi) === Some((0, 24, 9, 8)))
    assert(Multimodal.aviFrames(avi).size === 3)
    assert(Multimodal.containerFrames(avi).size === 3)
    // a corrupt movi tail truncates the walk instead of guessing
    val cut = java.util.Arrays.copyOf(avi, avi.length - 7)
    assert(Multimodal.aviFrames(cut).size === 2)
    // non-AVI RIFF (a WAV) yields no frames
    assert(Multimodal.containerFrames(Multimodal.wavBytes(1, 8000, 10)).isEmpty)
  }

  test("ISO BMFF walk: raw MP4 samples hash identically to the motion-BMP frames") {
    // the same synthetic corpus through a THIRD real container must agree
    // bit for bit (raw 24-bit samples are exact top-down RGB byte math)
    val ids = (0L until 8L).toDF("doc_id")
    val bmp = Multimodal.videoFrameHashes(spark,
        Multimodal.syntheticVideos(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val mp4 = Multimodal.videoFrameHashes(spark,
        Multimodal.syntheticMp4Videos(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mp4 === bmp)
    // and the near-dup pairs ride the same machinery unchanged
    val pairs = Multimodal.videoNearDupPairs(spark,
        Multimodal.syntheticMp4Videos(ids, "doc_id"), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty && pairs.forall { case (x, y) => x / 4 == y / 4 })
  }

  test("MP4 walk facts: stsd shape, chunked sample tables, truncation, crafted bounds") {
    val frames = (0 until 10).map { k =>
      val f = new Array[Byte](9 * 8 * 3)
      (0 until 8).foreach { y => (0 until 9).foreach { x =>
        val p = (Multimodal.synthGray(4L * k)(x, y) & 0xff).toByte
        val o = (y * 9 + x) * 3
        f(o) = p; f(o + 1) = p; f(o + 2) = p
      }}
      f
    }
    val mp4 = Multimodal.mp4Bytes(9, 8, "raw ", frames)
    val v = Multimodal.mp4Video(mp4).get
    assert((v.format, v.depth, v.width, v.height) === (("raw ", 24, 9, 8)))
    // 10 samples in chunks of 4/4/2: ranges tile the mdat payload exactly,
    // in sample order, across the stsc run boundary
    assert(v.frames.size === 10)
    assert(v.frames.map(_._2).forall(_ === 9 * 8 * 3))
    assert(v.frames.sliding(2).forall {
      case Seq((o1, l1), (o2, _)) => o2 === o1 + l1 })
    // a payload cut inside the LAST chunk walks the intact prefix (the
    // moov is at the tail here, so re-walk a fixture with moov intact:
    // shrink one frame's stsz entry target by cutting mdat is not
    // possible without rewriting offsets — instead cut the moov itself
    // and assert the walk refuses rather than guesses)
    val cutMoov = java.util.Arrays.copyOf(mp4, mp4.length - 40)
    assert(Multimodal.mp4Video(cutMoov).isEmpty)
    assert(Multimodal.containerFrames(cutMoov).isEmpty)
    // a crafted stsd declaring an absurd geometry must skip frames (the
    // Long bounds math), never overflow or throw
    val huge = Multimodal.mp4Bytes(30000, 30000, "raw ", frames)
    assert(Multimodal.mp4Video(huge).isDefined)
    assert(Multimodal.containerFrames(huge).isEmpty)
    // non-MP4 payloads yield None
    assert(Multimodal.mp4Video("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    // decodeOne classifies the container and surfaces its geometry
    val feats = Multimodal.decodeOne(7L, mp4)
    assert((feats.format_guess, feats.width, feats.height) ===
      (("mp4", Some(9), Some(8))))
  }

  test("stsd is authoritative: a raw sample starting 0xFF 0xD8 stays raw") {
    // frame whose pixel (0,0) is R=0xFF G=0xD8 — the JPEG SOI magic as
    // the first two payload bytes; the declared 'raw ' format must win
    // over the sniff or the frame is misrouted to ImageIO and dropped
    def gray(x: Int, y: Int): Int = 0x40 + x + y
    val frame = new Array[Byte](9 * 8 * 3)
    (0 until 8).foreach { y => (0 until 9).foreach { x =>
      val p = (gray(x, y) & 0xff).toByte
      val o = (y * 9 + x) * 3
      frame(o) = p; frame(o + 1) = p; frame(o + 2) = p
    }}
    frame(0) = 0xff.toByte; frame(1) = 0xd8.toByte
    val mp4 = Multimodal.mp4Bytes(9, 8, "raw ", Seq(frame))
    val frames = Multimodal.containerFrames(mp4)
    assert(frames.size === 1)
    assert(frames.head(0) === 'B'.toByte && frames.head(1) === 'M'.toByte,
      "raw sample must rewrap as a BMP, not pass through as 'JPEG'")
    // and the rewrap is content-faithful (modulo the planted SOI pixel):
    // pixel (5, 3) survives the top-down -> bottom-up + RGB -> BGR flip
    val (w, h, g) = Multimodal.decodeGrayImage(frames.head).get
    assert((w, h) === ((9, 8)))
    assert(g(5, 3) === gray(5, 3))
  }

  test("a crafted stsz declaring an absurd sample count refuses up front") {
    val frame = new Array[Byte](9 * 8 * 3)
    val mp4 = Multimodal.mp4Bytes(9, 8, "raw ", Seq(frame, frame))
    // locate the stsz box and forge uniform=1, count=16M (> the 4M cap):
    // without the pre-materialization bound this would try to walk one
    // range per payload byte
    val idx = (0 until mp4.length - 4).find(i =>
      mp4(i) == 's' && mp4(i + 1) == 't' && mp4(i + 2) == 's' && mp4(i + 3) == 'z').get
    def putBe32(o: Int, v: Int): Unit = {
      mp4(o) = (v >> 24).toByte; mp4(o + 1) = (v >> 16).toByte
      mp4(o + 2) = (v >> 8).toByte; mp4(o + 3) = v.toByte
    }
    putBe32(idx + 8, 1)                 // uniform_size = 1 (fits n trivially)
    putBe32(idx + 12, 16 * 1024 * 1024) // sample_count, over MaxMp4Samples
    assert(Multimodal.mp4Video(mp4).isEmpty)
    assert(Multimodal.containerFrames(mp4).isEmpty)
  }

  test("MP4 jpeg samples decode through the JDK JPEG path within Hamming tolerance") {
    def ramp(x: Int, y: Int): Int = math.min(255, x * 3 + y)
    val exact = Multimodal.dHashGray(Multimodal.bmpGrayBytes(72, 64, ramp)).get
    val jpegFrame = Multimodal.imageIoBytes("jpg", 72, 64, ramp)
    val mp4 = Multimodal.mp4Bytes(72, 64, "jpeg", Seq(jpegFrame, jpegFrame))
    val hashes = Multimodal.videoFrameHashes(spark,
        Seq((1L, mp4)).toDF("doc_id", "media"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(hashes.map(_._1).toSeq === Seq(0, 1))
    hashes.foreach { case (_, h) =>
      val hamming = java.lang.Long.bitCount(h ^ exact)
      assert(hamming <= 4, s"MP4 jpeg frame hash drifted $hamming bits")
    }
  }

  test("MJPG frames decode through the JDK JPEG path within Hamming tolerance") {
    def ramp(x: Int, y: Int): Int = math.min(255, x * 3 + y)
    val exact = Multimodal.dHashGray(Multimodal.bmpGrayBytes(72, 64, ramp)).get
    val jpegFrame = Multimodal.imageIoBytes("jpg", 72, 64, ramp)
    val avi = Multimodal.aviBytes(72, 64, "MJPG", Seq(jpegFrame, jpegFrame))
    val hashes = Multimodal.videoFrameHashes(spark,
        Seq((1L, avi)).toDF("doc_id", "media"))
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(hashes.map(_._1).toSeq === Seq(0, 1))
    hashes.foreach { case (_, h) =>
      val hamming = java.lang.Long.bitCount(h ^ exact)
      assert(hamming <= 4, s"MJPG frame hash drifted $hamming bits")
    }
  }
}
