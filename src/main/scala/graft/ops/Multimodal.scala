package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The decode path is REAL at two depths. Header features: BMP and PNG
  * dimensions, JPEG dimensions via a marker-segment walk to the SOF frame
  * header (compressed payload untouched — SOF is plain byte math), GIF
  * logical-screen dimensions, and canonical RIFF/WAVE audio params
  * (channels, sample rate, bit depth, sample count) — all parsed from
  * bytes, pure JVM, no codec libraries. Pixel decode (the perceptual-hash
  * path): 24-bit BMP by byte math, PNG/GIF/JPEG through the JDK's own
  * `javax.imageio` decoders — still zero external dependencies. Anything
  * unrecognized falls back to utf8-text byte statistics. A production
  * deployment adds the remaining codecs (H.264 frames, audio samples, …)
  * via JNI/FFI inside the same `mapPartitions` contract (decoder
  * amortized per partition, no driver collect, columnar-friendly output).
  */
object Multimodal {

  /** One decoded-media feature row. Format-specific fields are None when the
    * payload is not that format.
    */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_guess: String,
      width: Option[Int], height: Option[Int],          // bmp / png
      channels: Option[Int], sample_rate: Option[Int],  // wav
      n_samples: Option[Long],                          // wav
      byte_sum_16: Option[Long])                        // utf8-text checksum

  /** Attach an opaque binary column + metadata struct to a text table,
    * standing in for ingest of raw media bytes. In production the binary
    * comes from the source (parquet BINARY / object-store pointers).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("media"),
      struct(
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        lit("utf8-text").as("format"),
        ascii(substring(col(textCol), 1, 1)).as("first_byte")).as("media_meta"))

  // ---- real header decoders (pure JVM byte math) ---------------------------

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Walk JPEG marker segments from after SOI to the first SOF frame header
    * (FFC0-FFCF minus DHT/JPG/DAC) and read (width, height) — the standard
    * dimensions probe that never touches entropy-coded data. None if no SOF
    * before scan data / end.
    */
  private[ops] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var off = 2
    while (off + 9 <= b.length && (b(off) & 0xff) == 0xff) {
      val marker = b(off + 1) & 0xff
      if (marker == 0xff) off += 1                           // spec-legal fill byte
      else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
        return Some((be16(b, off + 7), be16(b, off + 5)))   // (width, height)
      else if (marker == 0xd9 || marker == 0xda) return None // EOI / scan start
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8))
        off += 2                                             // standalone: TEM/RSTn/SOI — no length field
      else off += 2 + be16(b, off + 2)
    }
    None
  }

  /** Decode one payload: BMP/PNG/JPEG/GIF dims, WAV audio params, else text
    * stats.
    */
  private[ops] def decodeOne(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    // one marker walk per JPEG payload, shared by the branch test and the
    // field extraction (EXIF-heavy headers make the walk non-trivial)
    lazy val jpeg: Option[(Int, Int)] =
      if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        jpegDims(bytes)
      else None
    if (n >= 54 && bytes(0) == 'B' && bytes(1) == 'M')
      MediaFeatures(id, n, "bmp",
        width = Some(le32(bytes, 18)), height = Some(math.abs(le32(bytes, 22))),
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    else if (n >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      MediaFeatures(id, n, "png",
        width = Some(be32(bytes, 16)), height = Some(be32(bytes, 20)),
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    else if (jpeg.isDefined) {
      val (w, h) = jpeg.get
      MediaFeatures(id, n, "jpeg",
        width = Some(w), height = Some(h),
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    } else if (n >= 13 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
               bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      MediaFeatures(id, n, "gif",
        width = Some(le16(bytes, 6)), height = Some(le16(bytes, 8)),
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    else if (n >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
             bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') {
      val (w, h) = aviVideoFormat(bytes) match {
        case Some((_, _, vw, vh)) => (Some(vw), Some(vh))
        case None => (None, None)
      }
      MediaFeatures(id, n, "avi",
        width = w, height = h,
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    }
    else if (n >= 12 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' &&
             bytes(7) == 'p') {
      // stsd-only probe: no sample-table materialization on the decode path
      val v = mp4VideoFacts(bytes)
      MediaFeatures(id, n, "mp4",
        width = v.map(_._3), height = v.map(_._4),
        channels = None, sample_rate = None, n_samples = None, byte_sum_16 = None)
    }
    else if (n >= 44 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
             bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
      val channels = le16(bytes, 22)
      val rate = le32(bytes, 24)
      val bits = le16(bytes, 34)
      // walk RIFF chunks from offset 12 to the data chunk (canonical files
      // have it at 36, but fmt extensions can shift it)
      // walk with LONG offsets: a malformed/huge unsigned chunk size would
      // wrap an int offset negative and crash the scan on a corrupt file;
      // walking past the payload just ends the loop (dataSize stays -1)
      var off = 12L
      var dataSize = -1L
      while (dataSize < 0 && off + 8 <= bytes.length) {
        val o = off.toInt
        val sz = le32(bytes, o + 4).toLong & 0xffffffffL
        if (bytes(o) == 'd' && bytes(o + 1) == 'a' && bytes(o + 2) == 't' && bytes(o + 3) == 'a')
          dataSize = sz
        else off += 8L + sz + (sz & 1L)
      }
      val frameBytes = math.max(1, channels * math.max(8, bits) / 8)
      MediaFeatures(id, n, "wav",
        width = None, height = None,
        channels = Some(channels), sample_rate = Some(rate),
        n_samples = Some(math.max(0L, dataSize) / frameBytes), byte_sum_16 = None)
    } else adtsFacts(bytes) match {
      // compressed audio: header facts only (no JDK payload decoder —
      // fingerprinting stays a documented refusal)
      case Some((ch, sr, ns)) =>
        MediaFeatures(id, n, "aac-adts",
          width = None, height = None,
          channels = Some(ch), sample_rate = Some(sr), n_samples = Some(ns),
          byte_sum_16 = None)
      case None => mp3Facts(bytes) match {
        case Some((ch, sr, ns)) =>
          MediaFeatures(id, n, "mp3",
            width = None, height = None,
            channels = Some(ch), sample_rate = Some(sr), n_samples = Some(ns),
            byte_sum_16 = None)
        case None =>
          MediaFeatures(id, n, "utf8-text",
            width = None, height = None,
            channels = None, sample_rate = None, n_samples = None,
            byte_sum_16 = Some(bytes.take(16).foldLeft(0L)((s, b) => s + (b & 0xff))))
      }
    }
  }

  /** Batch decode: per-partition iteration over binary payloads, emitting
    * typed features — no driver collect, decoder state amortized per
    * partition, output columnar-friendly.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeOne(id, bytes) })
  }

  // ---- deterministic synthetic media (ingest simulation for tests) ---------

  /** A minimal valid 24-bit BMP: 54-byte header + zero-filled padded rows. */
  private[ops] def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, width); putLe32(22, height)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    out
  }

  /** A minimal well-formed JPEG: SOI + JFIF APP0 + grayscale SOF0 carrying
    * the dimensions + EOI — 35 bytes, no entropy-coded data (the decoder
    * only walks headers).
    */
  private[ops] def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](35)
    def putBe16(o: Int, v: Int): Unit = { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte                     // SOI
    out(2) = 0xff.toByte; out(3) = 0xe0.toByte; putBe16(4, 16)     // APP0 len 16
    "JFIF".zipWithIndex.foreach { case (c, i) => out(6 + i) = c.toByte }
    out(11) = 1; out(12) = 1                                       // version 1.1
    putBe16(14, 1); putBe16(16, 1)                                 // density 1x1
    out(20) = 0xff.toByte; out(21) = 0xc0.toByte; putBe16(22, 11)  // SOF0 len 11
    out(24) = 8                                                    // precision
    putBe16(25, height); putBe16(27, width)
    out(29) = 1; out(30) = 1; out(31) = 0x11; out(32) = 0          // 1 component
    out(33) = 0xff.toByte; out(34) = 0xd9.toByte                   // EOI
    out
  }

  /** A minimal GIF89a: 13-byte header (logical screen dims, no color table)
    * + trailer — 14 bytes.
    */
  private[ops] def gifBytes(width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](14)
    "GIF89a".zipWithIndex.foreach { case (c, i) => out(i) = c.toByte }
    out(6) = width.toByte; out(7) = (width >> 8).toByte
    out(8) = height.toByte; out(9) = (height >> 8).toByte
    out(13) = 0x3b.toByte
    out
  }

  /** A canonical 16-bit PCM WAV: 44-byte header + zero-filled data chunk. */
  private[ops] def wavBytes(channels: Int, sampleRate: Int, nSamples: Long): Array[Byte] = {
    val dataSize = (nSamples * channels * 2).toInt
    val out = new Array[Byte](44 + dataSize)
    def putLe16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit = { putLe16(o, v); putLe16(o + 2, v >> 16) }
    def putTag(o: Int, s: String): Unit = s.zipWithIndex.foreach { case (c, i) => out(o + i) = c.toByte }
    putTag(0, "RIFF"); putLe32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, channels)
    putLe32(24, sampleRate); putLe32(28, sampleRate * channels * 2)
    putLe16(32, channels * 2); putLe16(34, 16)
    putTag(36, "data"); putLe32(40, dataSize)
    out
  }

  /** Deterministic mixed-modality corpus over a text table: by doc_id mod 5,
    * a real BMP, WAV, JPEG, or GIF (parameters derived from the id in closed
    * form), or the raw utf8 text — so a decoder downstream can be verified
    * end-to-end against closed-form expectations.
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val gen = udf((id: Long, text: String) => (id % 5) match {
      case 0 => bmpBytes((id % 64).toInt + 1, (id % 48).toInt + 1)
      case 1 => wavBytes((id % 2).toInt + 1, 8000 + (id % 8).toInt * 1000, 100 + id % 50)
      case 2 => jpegBytes((id % 100).toInt + 1, (id % 80).toInt + 1)
      case 3 => gifBytes((id % 32).toInt + 1, (id % 24).toInt + 1)
      case _ => text.getBytes("UTF-8")
    })
    df.select(col(idCol).as("doc_id"),
      gen(col(idCol), col(textCol)).as("media"))
  }

  /** Fake frame sampling for "video" payloads: every strideBytes-th slice as
    * a frame — exercises the explode/repartition shape of frame pipelines.
    */
  def frameSample(media: DataFrame, strideBytes: Int, maxFrames: Int): DataFrame =
    media.select(col("doc_id"),
        posexplode(slice(
          transform(
            sequence(lit(0),
              greatest(((octet_length(col("media")) + strideBytes - 1) / strideBytes)
                .cast("int") - 1, lit(0))),
            i => col("media").substr(i * strideBytes + 1, lit(strideBytes))),
          1, maxFrames)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")

  // ---- perceptual image hashing (dHash) and image near-dup dedup -----------

  /** A 24-bit BMP whose LOGICAL pixel (x, y) — x right, y down — is the
    * grayscale value `gray(x, y)` (0..255, written to all three channels).
    * Rows are stored bottom-up per the BMP spec, which [[dHashGray]]
    * inverts back.
    */
  private[ops] def bmpGrayBytes(width: Int, height: Int,
                                gray: (Int, Int) => Int): Array[Byte] = {
    val out = bmpBytes(width, height)
    val rowSize = ((width * 3 + 3) / 4) * 4
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val g = (gray(x, y) & 0xff).toByte
        out(rowOff + x * 3) = g; out(rowOff + x * 3 + 1) = g
        out(rowOff + x * 3 + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** The closed-form grayscale of the synthetic image corpus: docs come in
    * GROUPS of 4 (`doc_id / 4`) sharing a base pattern; variants 1..3
    * perturb ONE cell each, so intra-group dHash Hamming distance is <= 2
    * per variant-vs-base pair (a one-cell change flips at most the two
    * comparisons that touch it) while unrelated groups differ in ~half the
    * bits. All integer arithmetic — the x70 oracle replays it literally.
    */
  private[ops] def synthGray(docId: Long)(x: Int, y: Int): Int = {
    val grp = docId / 4
    val v = (docId % 4).toInt
    val a = grp % 7 + 1
    val b = grp % 11 + 3
    val c = grp % 251
    val base = a * (x + 1) * (x + 2) + b * (y + 1) * (x + 3) + c * (y + 1) + 7 * grp
    val pert = if (v > 0 && x == 2 * v && y == v) 101L else 0L
    ((base + pert) % 256).toInt
  }

  /** Deterministic image corpus with planted near-duplicates: one 9x8 BMP
    * per doc from [[synthGray]] (9x8 = the dHash grid itself, so the
    * oracle needs no resampling arithmetic). Test fixture, like
    * [[syntheticMedia]].
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => bmpGrayBytes(9, 8, synthGray(id)))
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  /** Encode a grayscale grid through the JDK's own ImageIO writers.
    * `"png"` uses TYPE_INT_RGB (lossless RGB); `"gif"` uses
    * TYPE_BYTE_INDEXED with an explicit 256-entry gray palette (the GIF
    * writer preserves an indexed image's palette exactly — handing it RGB
    * would invite quantization); `"jpg"` is the deliberately LOSSY case
    * for the tolerance spec. Achromatic pixels + the exact-luma decode in
    * [[decodeGrayImage]] make the lossless two round-trip bit-exact.
    */
  private[ops] def imageIoBytes(format: String, width: Int, height: Int,
                                gray: (Int, Int) => Int): Array[Byte] = {
    require(imageIoReady)   // encode spools through the same disk cache decode does
    val img = format match {
      case "gif" =>
        val ramp = Array.tabulate(256)(_.toByte)
        val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      case _ =>
        new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = gray(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos),
      s"no ImageIO writer for format '$format'")
    baos.toByteArray
  }

  /** The [[syntheticImages]] corpus re-encoded through REAL compressed
    * formats: the same 9x8 [[synthGray]] grids, alternating PNG / GIF by
    * doc id — both lossless, so the decode→luma→dHash chain stays exactly
    * replayable from the closed-form pixels (the x71 oracle). JPEG is
    * excluded here by design: its loss is real, so it is spec-gated with
    * a Hamming tolerance instead of hash-gated.
    */
  def syntheticLosslessImages(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) =>
      imageIoBytes(if (id % 2 == 0) "png" else "gif", 9, 8, synthGray(id)))
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  // ImageIO's default decode path spools through a DISK cache file per
  // image — at corpus scale that is a hidden temp-file write per row, so
  // it is disabled once per JVM before the first decode
  @transient private lazy val imageIoReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Decode a payload to its grayscale pixel accessor `(w, h, gray(x, y))`.
    * 24-bit BMPs take a pure byte-math fast path (no buffer allocation, no
    * codec); everything else goes through the JDK's own `javax.imageio`
    * decoders (PNG, GIF, JPEG, and the BMP depths the fast path skips) —
    * no external codec dependency. Grayscale is the BT.601 integer luma
    * with weights summing to 256 (`(77r + 150g + 29b) >> 8`), which is
    * EXACT pass-through on achromatic pixels (r == g == b) — that identity
    * is what lets a lossless PNG/GIF gray image replay closed-form in the
    * oracle. None when no decoder recognizes the bytes.
    */
  private[ops] def decodeGrayImage(bytes: Array[Byte])
      : Option[(Int, Int, (Int, Int) => Int)] = {
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M' &&
        le16(bytes, 28) == 24) {
      val dataOff = le32(bytes, 10)
      val w = le32(bytes, 18)
      val h = le32(bytes, 22)
      // bounds math in LONG: a corrupt/crafted header with a huge width
      // would overflow `w * 3` / `rowSize * h` in Int, pass an Int-typed
      // check, and the accessor would throw out of bounds — killing the
      // task where every other undecodable payload contractually yields
      // None (payload length < 2 GiB caps the honest values anyway)
      val rowSize = ((w.toLong * 3 + 3) / 4) * 4
      if (w > 0 && h > 0 && dataOff >= 54 &&
          bytes.length.toLong >= dataOff.toLong + rowSize * h) {
        val rs = rowSize.toInt
        return Some((w, h,
          (x, y) => bytes(dataOff + (h - 1 - y) * rs + x * 3) & 0xff))
      }
    }
    if (!imageIoReady) return None   // never: forces the one-time init
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else Some((img.getWidth, img.getHeight, (x, y) => {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff
      val g = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      (77 * r + 150 * g + 29 * b) >> 8
    }))
  }

  /** 64-bit difference hash of an image payload: decode
    * ([[decodeGrayImage]] — BMP byte math or JDK ImageIO for PNG/GIF/
    * JPEG), nearest-neighbor-sample onto the standard 9x8 dHash grid
    * (identity when the image IS 9x8), then bit i = [cell(i%8+1, i/8)
    * brighter than cell(i%8, i/8)] — the published dHash scheme with
    * floor-sampling as the downscale (the resize kernel is a fidelity
    * knob, not a correctness one: any deterministic downscale yields a
    * valid perceptual hash, and this one is exactly replayable in SQL
    * for lossless gray sources). None for undecodable payloads or images
    * smaller than the 9x8 grid.
    */
  private[ops] def dHashGray(bytes: Array[Byte]): Option[Long] =
    decodeGrayImage(bytes).flatMap { case (w, h, gray) =>
      if (w < 9 || h < 8) None
      else {
        def cell(gx: Int, gy: Int): Int = gray(gx * w / 9, gy * h / 8)
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (cell(i % 8 + 1, i / 8) > cell(i % 8, i / 8)) hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    }

  /** (id, simhash) difference-hash frame over a `(doc_id, media)` corpus —
    * per-partition decode (no driver involvement; BMP byte math or JDK
    * ImageIO for PNG/GIF/JPEG), undecodable payloads dropped. The column
    * is named `simhash` so [[Dedup.simhashPairs]]'s banded-Hamming
    * machinery consumes it unchanged.
    */
  def dHash64(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        dHashGray(bytes).map(h => (id, h))
      })
      .toDF("id", "simhash")
  }

  /** Image near-duplicate pairs: dHash each payload, then the SAME banded
    * 64-bit Hamming blocking text SimHash uses ([[Dedup.simhashPairs]]) —
    * with `maxHamming <= numChunks - 1` the pigeonhole guarantees total
    * recall, so the result is exactly {pairs : hamming <= maxHamming},
    * never a probabilistic candidate set. One equi-join on chunk values;
    * no all-pairs stage at any scale.
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3, numChunks: Int = 4): DataFrame =
    Dedup.simhashPairs(dHash64(spark, media), maxHamming, numChunks)

  // ---- audio fingerprinting (energy-difference hash over PCM) --------------

  /** A canonical 16-bit PCM WAV with REAL sample values:
    * `sample(frame, channel)` (signed 16-bit). [[wavBytes]] with the data
    * chunk filled in.
    */
  private[ops] def wavPcmBytes(channels: Int, sampleRate: Int, nFrames: Int,
                               sample: (Int, Int) => Int): Array[Byte] = {
    val out = wavBytes(channels, sampleRate, nFrames.toLong)
    var t = 0
    while (t < nFrames) {
      var c = 0
      while (c < channels) {
        val v = sample(t, c)
        val off = 44 + (t * channels + c) * 2
        out(off) = v.toByte
        out(off + 1) = (v >> 8).toByte
        c += 1
      }
      t += 1
    }
    out
  }

  /** The published IMA-ADPCM tables (format tag 0x11; the integer spec in
    * the IMA Recommended Practices / multimedia registration): 89 step
    * sizes and the 8-entry step-index adjustment.
    */
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)

  private[ops] val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode an IMA-ADPCM data payload (4-bit nibbles, low nibble first)
    * to signed 16-bit samples, FRAME-MAJOR interleaved
    * (`samples(t * channels + c)`) — the published walk: per block a
    * 4-byte header PER CHANNEL seeds (predictor, stepIndex) and emits
    * the predictor as sample 0; the data then interleaves in 4-byte
    * (8-nibble) words per channel, each nibble adding
    * `±(step>>3 + bits·step-parts)` with int16 / [0, 88] clamps. Exact
    * integer arithmetic — the x80 oracle replays the mono walk as a
    * recursive SQL decode. A truncated tail block emits only the frames
    * every channel produced.
    */
  private[ops] def imaAdpcmInterleaved(bytes: Array[Byte], dataOff: Int, avail: Int,
                                       blockAlign: Int, samplesPerBlock: Int,
                                       channels: Int): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    val headerLen = 4 * channels
    var blockStart = dataOff
    while (blockStart + headerLen <= dataOff + avail) {
      val blockEnd = math.min(blockStart.toLong + blockAlign, (dataOff + avail).toLong).toInt
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      val samples = new Array[Int](samplesPerBlock * channels)
      val produced = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        val ho = blockStart + 4 * c
        pred(c) = ((bytes(ho) & 0xff) | (bytes(ho + 1) << 8)).toShort.toInt
        idx(c) = math.max(0, math.min(88, bytes(ho + 2) & 0xff))
        samples(c) = pred(c)            // frame 0 = the header predictor
        produced(c) = 1
        c += 1
      }
      var o = blockStart + headerLen
      while (o < blockEnd && produced.exists(_ < samplesPerBlock)) {
        val ch = ((o - blockStart - headerLen) / 4) % channels
        val wordEnd = math.min(o + 4, blockEnd)
        while (o < wordEnd) {
          val b = bytes(o) & 0xff
          var half = 0
          while (half < 2 && produced(ch) < samplesPerBlock) {
            val nib = if (half == 0) b & 0xf else (b >>> 4) & 0xf
            val step = ImaStepTable(idx(ch))
            var diff = step >> 3
            if ((nib & 1) != 0) diff += step >> 2
            if ((nib & 2) != 0) diff += step >> 1
            if ((nib & 4) != 0) diff += step
            if ((nib & 8) != 0) diff = -diff
            pred(ch) = math.max(-32768, math.min(32767, pred(ch) + diff))
            idx(ch) = math.max(0, math.min(88, idx(ch) + ImaIndexTable(nib & 7)))
            samples(produced(ch) * channels + ch) = pred(ch)
            produced(ch) += 1
            half += 1
          }
          o += 1
        }
      }
      val frames = produced.min
      var i = 0
      while (i < frames * channels) { out += samples(i); i += 1 }
      blockStart += math.max(blockAlign, headerLen + 1)   // malformed tiny blockAlign: stop
    }
    out.result()
  }

  /** Mono face of [[imaAdpcmInterleaved]] (the x80 oracle's exact walk). */
  private[ops] def imaAdpcmMono(bytes: Array[Byte], dataOff: Int, avail: Int,
                                blockAlign: Int, samplesPerBlock: Int): Array[Int] =
    imaAdpcmInterleaved(bytes, dataOff, avail, blockAlign, samplesPerBlock, 1)

  /** 64-bit energy-difference fingerprint of a WAV — the audio analogue
    * of [[dHashGray]]: frames map onto 65 equal windows by
    * `wnd = frame * 65 / nFrames` (floor — exactly replayable in SQL),
    * each window's energy is the integer sum of |sample| over its frames
    * and channels, and bit i = [energy(i+1) > energy(i)]. Pitch/volume
    * CHANGES register; uniform scaling and frame-duplication (the trivial
    * resample) do not — the published perceptual-fingerprint shape
    * (Haitsma-Kalper energy-band signs) reduced to exact integer
    * arithmetic an external engine can replay bit-for-bit.
    *
    * Codecs: 16-bit PCM (format 1, any channel count) and IMA-ADPCM
    * (format 0x11 via [[imaAdpcmInterleaved]], any channel count — the
    * published integer spec with the 4-byte-word channel interleave, so
    * the whole compressed path stays oracle-replayable). MP3/AAC have no
    * JDK decoder and no exact integer spec — None, never a guess. Also
    * None for clips shorter than 65 frames.
    */
  private[ops] def audioFingerprint(bytes: Array[Byte]): Option[Long] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
        bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
        bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    val fmtTag = le16(bytes, 20)
    val channels = le16(bytes, 22)
    if (channels < 1) return None
    // data chunk via the same long-offset walk decodeOne uses
    var off = 12L
    var dataOff = -1L
    var dataSize = -1L
    while (dataSize < 0 && off + 8 <= bytes.length) {
      val o = off.toInt
      val sz = le32(bytes, o + 4).toLong & 0xffffffffL
      if (bytes(o) == 'd' && bytes(o + 1) == 'a' && bytes(o + 2) == 't' && bytes(o + 3) == 'a') {
        dataOff = o + 8L; dataSize = sz
      } else off += 8L + sz + (sz & 1L)
    }
    if (dataOff < 0) return None
    val avail = math.min(dataSize, bytes.length - dataOff)
    val frameAbs: Array[Long] =
      if (fmtTag == 1 && le16(bytes, 34) == 16) {
        val nFrames = (avail / (channels * 2)).toInt
        val out = new Array[Long](math.max(0, nFrames))
        var t = 0
        while (t < nFrames) {
          var c = 0
          var sum = 0L
          while (c < channels) {
            val o = (dataOff + (t.toLong * channels + c) * 2).toInt
            sum += math.abs(((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt)
            c += 1
          }
          out(t) = sum
          t += 1
        }
        out
      } else if (fmtTag == 0x11 && le16(bytes, 34) == 4) {
        val blockAlign = le16(bytes, 32)
        // wSamplesPerBlock lives in the fmt extension (canonical layout)
        val spb = if (le32(bytes, 16) >= 20) le16(bytes, 38) else 0
        if (blockAlign < 4 * channels + 1 || spb < 1) return None
        // a block physically holds (blockAlign - headers) * 2 / channels
        // nibbles + the header sample per channel; a crafted header
        // declaring more would make the decoder allocate spb*channels
        // sample slots for data that cannot exist — refuse, don't alloc
        if (spb.toLong > (blockAlign - 4L * channels) * 2 / channels + 1) return None
        val inter = imaAdpcmInterleaved(bytes, dataOff.toInt, avail.toInt,
          blockAlign, spb, channels)
        Array.tabulate(inter.length / channels) { t =>
          var c = 0
          var sum = 0L
          while (c < channels) { sum += math.abs(inter(t * channels + c)); c += 1 }
          sum
        }
      } else return None
    val nFrames = frameAbs.length
    if (nFrames < 65) return None
    val energy = new Array[Long](65)
    var t = 0
    while (t < nFrames) {
      energy((t.toLong * 65 / nFrames).toInt) += frameAbs(t)
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (energy(i + 1) > energy(i)) fp |= (1L << i)
      i += 1
    }
    Some(fp)
  }

  /** The closed-form mono waveform of the synthetic audio corpus: docs in
    * GROUPS of 4 (`doc_id / 4`) share a base signal; variants 1..3 spike
    * ONE sample each, which changes at most one window's energy and so
    * flips at most the two fingerprint bits comparing it — intra-group
    * Hamming <= 2. The per-group quadratic COEFFICIENT comes through a
    * Knuth multiplicative hash, so unrelated groups wrap mod 30000 at
    * unrelated frequencies and their energy-sign fingerprints decorrelate
    * (measured: 1999 of 2000 groups survive the first-wins fold at
    * hamming <= 3 — a plain `grp % k` coefficient left only 60). All
    * positive integer arithmetic before the centering subtraction, so `%`
    * agrees across engines.
    */
  private[ops] def synthPcm(docId: Long)(t: Int): Int = {
    val grp = docId / 4
    val v = (docId % 4).toInt
    val f = (grp * 2654435761L) % 9973 + 17
    val base = f * (t + 1) * (t + 2) + (grp % 97) * (t + 1) + 13 * grp
    val pert = if (v > 0 && t == 2 * v) 5000L else 0L
    ((base + pert) % 30000).toInt - 15000
  }

  /** Deterministic audio corpus with planted near-duplicates: one mono
    * 16-bit 130-frame WAV per doc from [[synthPcm]] (130 = 2 frames per
    * fingerprint window, so the oracle's window arithmetic is exact).
    * Test fixture, like [[syntheticImages]].
    */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) =>
      wavPcmBytes(1, 8000, 130, (t, _) => synthPcm(id)(t)))
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  /** A canonical IMA-ADPCM WAV (format 0x11): 20-byte fmt chunk with the
    * samplesPerBlock extension, one data block — 4-byte header per
    * channel (predictor, step index) + packed nibbles, low nibble first,
    * channels interleaved in 4-byte words. Every channel carries the
    * SAME nibble stream (the multi-channel fixture shape).
    */
  private[ops] def adpcmWavBytes(sampleRate: Int, pred0: Int, idx0: Int,
                                 nibbles: Array[Int],
                                 channels: Int = 1): Array[Byte] = {
    val nData = (nibbles.length + 1) / 2
    // mono packs nibble bytes tightly; multi-channel interleaves whole
    // 4-byte words per channel (zero-padded tails decode but are capped
    // by samplesPerBlock)
    val wordsPerChannel = (nData + 3) / 4
    val dataLen = if (channels == 1) nData else wordsPerChannel * 4 * channels
    val blockAlign = 4 * channels + dataLen
    val spb = nibbles.length + 1              // header sample + one per nibble
    val out = new Array[Byte](12 + 8 + 20 + 8 + blockAlign)
    def putLe16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit = { putLe16(o, v); putLe16(o + 2, v >> 16) }
    def putTag(o: Int, s: String): Unit = s.zipWithIndex.foreach { case (c, i) => out(o + i) = c.toByte }
    putTag(0, "RIFF"); putLe32(4, out.length - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 20)
    putLe16(20, 0x11); putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * blockAlign / spb)           // nominal byte rate
    putLe16(32, blockAlign); putLe16(34, 4)              // blockAlign, 4-bit
    putLe16(36, 2); putLe16(38, spb)                     // cbSize, samplesPerBlock
    putTag(40, "data"); putLe32(44, blockAlign)
    (0 until channels).foreach { c =>
      putLe16(48 + 4 * c, pred0)
      out(50 + 4 * c) = idx0.toByte; out(51 + 4 * c) = 0
    }
    val dataStart = 48 + 4 * channels
    nibbles.zipWithIndex.foreach { case (n, j) =>
      val byteInChannel = j / 2
      (0 until channels).foreach { c =>
        // word w of channel c sits at dataStart + (w * channels + c) * 4
        // (mono: tight packing, same formula with channels = 1)
        val o =
          if (channels == 1) dataStart + byteInChannel
          else dataStart + ((byteInChannel / 4) * channels + c) * 4 + byteInChannel % 4
        out(o) = (if (j % 2 == 0) (out(o) & 0xf0) | (n & 0xf)
                  else (out(o) & 0x0f) | ((n & 0xf) << 4)).toByte
      }
    }
    out
  }

  /** Deterministic IMA-ADPCM corpus: per doc a mono clip of 129 samples
    * (1 header + 128 planted nibbles) whose seed predictor, seed step
    * index, and nibble stream are all closed forms of the doc id —
    * variants perturb ONE nibble. The x80 oracle replays the full
    * predictor/step-table walk as a recursive SQL decode, so these bytes
    * differentially test the [[imaAdpcmMono]] decoder, not echo it.
    */
  def syntheticAdpcmAudio(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => {
      val grp = id / 4
      val v = (id % 4).toInt
      val f = (grp * 2654435761L) % 9973 + 17
      val c = grp % 97
      val pred0 = ((grp * 2654435761L) % 2000).toInt - 1000
      val idx0 = ((grp * 40503L) % 89).toInt
      val nibbles = Array.tabulate(128) { j =>
        val pert = if (v > 0 && j == 40 + 2 * v) 7L else 0L
        ((f * (j + 1) * (j + 3) + c * (j + 1) + 5 * grp + pert) % 16).toInt
      }
      adpcmWavBytes(8000, pred0, idx0, nibbles)
    })
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  /** (id, simhash) fingerprint frame over a `(doc_id, media)` audio corpus
    * — per-partition decode, non-PCM payloads dropped; named `simhash` so
    * [[Dedup.simhashPairs]] consumes it unchanged (same as [[dHash64]]).
    */
  def audioFingerprint64(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioFingerprint(bytes).map(fp => (id, fp))
      })
      .toDF("id", "simhash")
  }

  /** Audio near-duplicate pairs: fingerprint + the same banded 64-bit
    * Hamming blocking as [[imageNearDupPairs]] — total recall at
    * `maxHamming <= numChunks - 1`, one equi-join, no all-pairs stage.
    */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3, numChunks: Int = 4): DataFrame =
    Dedup.simhashPairs(audioFingerprint64(spark, media), maxHamming, numChunks)

  // ---- audio: MPEG (MP3) and ADTS (AAC) HEADER walks -----------------------
  //
  // Metadata only — there is no JDK decoder for the audio PAYLOADS, so
  // fingerprinting compressed streams stays a documented refusal
  // (audioFingerprint returns None); but the published frame-header
  // grammars are pure byte math, and a 100 TB curation pipeline still
  // wants the facts (codec, channels, rate, duration) to route/filter/
  // dedup-by-metadata without decoding. Same log-and-truncate
  // discipline as every other header walk in this file.

  /** Layer III bitrates (kbps) by index 1..14; 0 = free (refused),
    * 15 = invalid.
    */
  private val Mp3KbpsV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3KbpsV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val AdtsRates =
    Array(96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050, 16000,
      12000, 11025, 8000, 7350)

  /** (channels, sample_rate, n_samples) of an MPEG Layer III stream:
    * optional ID3v2 prefix (syncsafe size) skipped, then consecutive
    * frame headers walked — each frame's own bitrate index sizes it
    * (VBR-safe), facts come from the FIRST frame, sample count is
    * frames x 1152 (MPEG1) / 576 (MPEG2/2.5). The walk stops at the
    * first lost sync (a trailing 128-byte ID3v1 "TAG" block is
    * tolerated); free-format bitrate and reserved version/layer/rate
    * indices refuse.
    */
  private[ops] def mp3Facts(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    val n = bytes.length
    var off = 0
    // ID3v2: "ID3" ver(2) flags(1) size(4 x 7-bit syncsafe)
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      off = 10 + size
      if (off >= n) return None
    }
    var channels = -1
    var rate = -1
    var samples = 0L
    var frames = 0L
    var ok = true
    while (ok && off + 4 <= n) {
      val b1 = bytes(off) & 0xff
      val b2 = bytes(off + 1) & 0xff
      val b3 = bytes(off + 2) & 0xff
      val b4 = bytes(off + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) ok = false
      else {
        val version = (b2 >> 3) & 3       // 0=2.5, 1=reserved, 2=2, 3=1
        val layer = (b2 >> 1) & 3         // 1 = Layer III
        val brIdx = (b3 >> 4) & 15
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        if (version == 1 || layer != 1 || brIdx == 0 || brIdx == 15 ||
            srIdx == 3) ok = false
        else {
          val kbps = if (version == 3) Mp3KbpsV1(brIdx) else Mp3KbpsV2(brIdx)
          val sr = version match {
            case 3 => Array(44100, 48000, 32000)(srIdx)
            case 2 => Array(22050, 24000, 16000)(srIdx)
            case _ => Array(11025, 12000, 8000)(srIdx)
          }
          val frameLen =
            (if (version == 3) 144000L else 72000L) * kbps / sr + padding
          if (frameLen < 4 || off + frameLen > n) ok = false
          else {
            if (frames == 0L) {
              channels = if (((b4 >> 6) & 3) == 3) 1 else 2
              rate = sr
            }
            samples += (if (version == 3) 1152L else 576L)
            frames += 1
            off += frameLen.toInt
            // tolerate a trailing ID3v1 tag
            if (off + 3 <= n && bytes(off) == 'T' && bytes(off + 1) == 'A' &&
                bytes(off + 2) == 'G' && n - off == 128) off = n
          }
        }
      }
    }
    if (frames >= 1) Some((channels, rate, samples)) else None
  }

  /** (channels, sample_rate, n_samples) of an ADTS AAC stream: 0xFFF
    * sync with layer 00 (what distinguishes ADTS from an MPEG-audio
    * sync), sampling-frequency index from the published table, channel
    * configuration (PCE-defined 0 refused), 13-bit frame length walked
    * frame to frame, 1024 samples per raw data block. Facts from the
    * first frame; truncation ends the walk with the intact prefix.
    */
  private[ops] def adtsFacts(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    val n = bytes.length
    var off = 0
    var channels = -1
    var rate = -1
    var samples = 0L
    var frames = 0L
    var ok = true
    while (ok && off + 7 <= n) {
      val b1 = bytes(off) & 0xff
      val b2 = bytes(off + 1) & 0xff
      val b3 = bytes(off + 2) & 0xff
      val b4 = bytes(off + 3) & 0xff
      val b5 = bytes(off + 4) & 0xff
      val b6 = bytes(off + 5) & 0xff
      val b7 = bytes(off + 6) & 0xff
      if (b1 != 0xff || (b2 & 0xf6) != 0xf0) ok = false
      else {
        val sfIdx = (b3 >> 2) & 15
        val chanCfg = ((b3 & 1) << 2) | ((b4 >> 6) & 3)
        val frameLen = ((b4 & 3) << 11) | (b5 << 3) | ((b6 >> 5) & 7)
        val rawBlocks = b7 & 3
        if (sfIdx >= AdtsRates.length || chanCfg == 0 || frameLen < 7 ||
            off + frameLen > n) ok = false
        else {
          if (frames == 0L) {
            channels = chanCfg          // cfg 1..6 = that many channels
            rate = AdtsRates(sfIdx)
          }
          samples += 1024L * (rawBlocks + 1)
          frames += 1
          off += frameLen
        }
      }
    }
    if (frames >= 1) Some((channels, rate, samples)) else None
  }

  /** A well-formed MPEG1 Layer III fixture stream: `frames` headers
    * (no CRC, no padding) each followed by a zero payload of the exact
    * frame length; optional ID3v2 prefix of `id3Payload` bytes.
    */
  private[ops] def mp3Bytes(srIdx: Int, brIdx: Int, mono: Boolean,
                            frames: Int, id3Payload: Int = 0): Array[Byte] = {
    val sr = Array(44100, 48000, 32000)(srIdx)
    val frameLen = (144000L * Mp3KbpsV1(brIdx) / sr).toInt
    val id3 = if (id3Payload > 0) 10 + id3Payload else 0
    val out = new Array[Byte](id3 + frames * frameLen)
    if (id3 > 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
      out(6) = ((id3Payload >> 21) & 0x7f).toByte
      out(7) = ((id3Payload >> 14) & 0x7f).toByte
      out(8) = ((id3Payload >> 7) & 0x7f).toByte
      out(9) = (id3Payload & 0x7f).toByte
    }
    (0 until frames).foreach { f =>
      val o = id3 + f * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte                       // MPEG1, L3, no CRC
      out(o + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
      out(o + 3) = (if (mono) 0xc0 else 0x00).toByte // channel mode
    }
    out
  }

  /** A well-formed ADTS fixture stream: `frames` no-CRC headers (AAC LC,
    * one raw data block) each followed by `payload` zero bytes.
    */
  private[ops] def adtsBytes(sfIdx: Int, chanCfg: Int, frames: Int,
                             payload: Int): Array[Byte] = {
    val frameLen = 7 + payload
    val out = new Array[Byte](frames * frameLen)
    (0 until frames).foreach { f =>
      val o = f * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = 0xf1.toByte                       // MPEG-4, layer 00, no CRC
      out(o + 2) = ((1 << 6) | (sfIdx << 2) | (chanCfg >> 2)).toByte // AAC LC
      out(o + 3) = (((chanCfg & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      out(o + 4) = ((frameLen >> 3) & 0xff).toByte
      out(o + 5) = (((frameLen & 7) << 5) | 0x1f).toByte  // + fullness hi
      out(o + 6) = 0xfc.toByte                            // fullness lo, 1 block
    }
    out
  }

  /** Deterministic compressed-audio corpus: even ids are MPEG1 Layer III
    * streams (rate/bitrate/channel-mode/frame-count/ID3 presence all
    * closed forms of the id), odd ids are ADTS AAC streams — every
    * header field the walks parse is replayable in SQL (the x83 oracle).
    */
  def syntheticCompressedAudio(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => {
      if (id % 2 == 0) {
        val k = id / 2
        mp3Bytes(srIdx = (k % 3).toInt, brIdx = (1 + k % 14).toInt,
          mono = id % 4 == 0, frames = (3 + k % 5).toInt,
          id3Payload = if (id % 6 == 0) 64 else 0)
      } else {
        val k = (id - 1) / 2
        adtsBytes(sfIdx = (4 + k % 8).toInt, chanCfg = (1 + k % 3).toInt,
          frames = (2 + k % 6).toInt, payload = (40 + k % 50).toInt)
      }
    })
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  // ---- video: frame-container walk + per-frame perceptual hashing ---------

  /** Split a motion-BMP payload (concatenated BMP files — the simplest
    * REAL container: each frame's extent comes from its own BMP `file
    * size` header field, so this is genuine container walking, not
    * fixed-stride slicing) into its frame byte ranges. Parsing stops at
    * the first non-BMP/corrupt offset (a real pipeline logs-and-truncates
    * rather than guessing). A production deployment swaps this walk for
    * an MP4/H.264 demuxer behind the same seam.
    */
  private[ops] def videoFrames(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var off = 0
    while (off + 54 <= bytes.length && bytes(off) == 'B' && bytes(off + 1) == 'M') {
      val size = le32(bytes, off + 2)
      if (size < 54 || off.toLong + size > bytes.length) return out.toSeq
      out += ((off, size))
      off += size
    }
    out.toSeq
  }

  /** Walk a RIFF/AVI container (the standard chunk grammar — the same
    * RIFF walk the WAV decoder does, two levels deeper) and return each
    * video frame as a decodable image payload:
    *
    *  - `LIST hdrl` -> per-stream `LIST strl` -> `strh` gives the stream
    *    type; the FIRST `vids` stream's `strf` (a BITMAPINFOHEADER)
    *    fixes width / height / bit depth / compression, and the stream's
    *    ORDINAL fixes the two-digit prefix of its movi chunk ids;
    *  - `LIST movi` -> `NNdb` / `NNdc` chunks of that stream (including
    *    ones nested in `LIST rec ` groups) are the frames in order:
    *    uncompressed 24-bit DIB bits get a 54-byte BMP header
    *    synthesized (then [[decodeGrayImage]]'s exact byte-math path
    *    applies); MJPG / JPEG-magic frames pass through as-is to the
    *    JDK's JPEG decoder.
    *
    * Parsing stops at the first malformed offset (log-and-truncate, like
    * the motion-BMP walk). Frames whose declared shape this walk cannot
    * decode (odd bit depths, other codecs) are skipped, not guessed.
    */
  private[ops] def aviFrames(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return out.toSeq
    var videoStream = -1        // ordinal of the first vids stream
    var streamOrdinal = 0
    // one chunk walker, recursing into the LIST types that matter
    def walk(from: Long, to: Long, inHdrl: Boolean, inMovi: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val o = off.toInt
        val id = fourcc(o)
        val sz = le32(bytes, o + 4).toLong & 0xffffffffL
        val overruns = off + 8 + sz > to
        if (id == "LIST" && sz >= 4) {
          // a truncated LIST still walks its intact PREFIX (log-and-
          // truncate, like the motion-BMP walk), then stops
          val end = math.min(off + 8 + sz, to)
          val listType = fourcc(o + 8)
          if (listType == "hdrl") walk(off + 12, end, inHdrl = true, inMovi = false)
          else if (listType == "strl" && inHdrl) {
            // strh fccType decides the stream kind; strf carries the
            // BITMAPINFOHEADER for video streams
            var so = off + 12
            var isVids = false
            var ok = true
            while (ok && so + 8 <= end) {
              val soi = so.toInt
              val sid = fourcc(soi)
              val ssz = le32(bytes, soi + 4).toLong & 0xffffffffL
              ok = so + 8 + ssz <= end
              if (ok) {
                if (sid == "strh" && ssz >= 4) isVids = fourcc(soi + 8) == "vids"
                if (sid == "strf" && isVids && videoStream < 0 && ssz >= 20)
                  videoStream = streamOrdinal
              }
              so += 8 + ssz + (ssz & 1)
            }
            streamOrdinal += 1
          }
          else if (listType == "movi" || (listType == "rec " && inMovi))
            walk(off + 12, end, inHdrl = false, inMovi = true)
        } else if (!overruns && inMovi && id.length == 4 && videoStream >= 0 &&
            id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "db" || id.substring(2) == "dc") &&
            (id.substring(0, 2).toInt == videoStream)) {
          out += ((o + 8, sz.toInt))
        }
        if (overruns) return       // nothing reliable past a truncated chunk
        off += 8 + sz + (sz & 1)   // chunks are word-aligned
      }
    }
    walk(12, bytes.length.toLong, inHdrl = false, inMovi = false)
    out.toSeq
  }

  /** One video frame of an AVI as image BYTES (see [[aviFrames]]): DIB
    * bits get a BMP header; JPEG frames pass through; anything else is
    * None.
    */
  private def aviFrameImage(bytes: Array[Byte], off: Int, len: Int,
                            compression: Int, bitCount: Int,
                            w: Int, h: Int): Option[Array[Byte]] = {
    val isJpeg = compression == 0x47504a4d ||                    // 'MJPG' LE
      (len >= 2 && (bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8)
    if (isJpeg) Some(java.util.Arrays.copyOfRange(bytes, off, off + len))
    else if (compression == 0 && bitCount == 24 && w > 0 && h > 0) {
      // bounds math in LONG (cf. decodeGrayImage): a crafted strf with a
      // huge width would overflow `w * 3` / `rowSize * h` in Int, pass the
      // check, and the copy would throw instead of skipping the frame
      val rowSize = ((w.toLong * 3 + 3) / 4) * 4
      if (len.toLong < rowSize * h) None
      else {
        val bmp = bmpBytes(w, h)
        System.arraycopy(bytes, off, bmp, 54, (rowSize * h).toInt)
        Some(bmp)
      }
    } else None
  }

  /** Every frame of a video payload as decodable image bytes: motion-BMP
    * (frames are whole BMP files), RIFF/AVI (DIB and MJPG frames), or
    * ISO base-media MP4/MOV (`raw ` and JPEG sample entries) — the one
    * seam a production demuxer (H.264/HEVC via FFI) swaps behind.
    */
  private[ops] def containerFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I') {
      // the header facts live in hdrl, so re-derive them here once
      val (comp, bits, w, h) = aviVideoFormat(bytes).getOrElse((-1, 0, 0, 0))
      aviFrames(bytes).flatMap { case (off, len) =>
        aviFrameImage(bytes, off, len, comp, bits, w, h)
      }
    } else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') {
      mp4Video(bytes).toSeq.flatMap { v =>
        v.frames.flatMap { case (off, len) =>
          mp4FrameImage(bytes, off.toInt, len.toInt, v.format, v.depth,
            v.width, v.height)
        }
      }
    } else
      videoFrames(bytes).map { case (off, len) =>
        java.util.Arrays.copyOfRange(bytes, off, off + len)
      }

  /** (compression, bitCount, width, height) of the first `vids` stream's
    * BITMAPINFOHEADER, from `LIST hdrl` -> `LIST strl` -> `strf`.
    */
  private[ops] def aviVideoFormat(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var off = 12L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val sz = le32(bytes, o + 4).toLong & 0xffffffffL
      if (o + 8 + sz > bytes.length) return None
      if (fourcc(o) == "LIST" && sz >= 4 && fourcc(o + 8) == "hdrl") {
        var so = off + 12
        while (so + 8 <= off + 8 + sz) {
          val soi = so.toInt
          val ssz = le32(bytes, soi + 4).toLong & 0xffffffffL
          if (fourcc(soi) == "LIST" && ssz >= 4 && fourcc(soi + 8) == "strl") {
            var io = so + 12
            var isVids = false
            while (io + 8 <= so + 8 + ssz) {
              val ioi = io.toInt
              val isz = le32(bytes, ioi + 4).toLong & 0xffffffffL
              if (fourcc(ioi) == "strh" && isz >= 4) isVids = fourcc(ioi + 8) == "vids"
              if (fourcc(ioi) == "strf" && isVids && isz >= 20)
                return Some((le32(bytes, ioi + 8 + 16), le16(bytes, ioi + 8 + 14),
                  le32(bytes, ioi + 8 + 4), le32(bytes, ioi + 8 + 8)))
              io += 8 + isz + (isz & 1)
            }
          }
          so += 8 + ssz + (ssz & 1)
        }
      }
      off += 8 + sz + (sz & 1)
    }
    None
  }

  // ---- video: ISO base-media (MP4/MOV) box walk ---------------------------

  /** Shared ISO/IEC 14496-12 box-walk primitives over one payload. All
    * bounds math is in Long (a crafted u32 size cannot wrap an Int
    * offset); 64-bit `largesize` headers and to-end-of-file boxes are
    * honored; a malformed or truncated box ends any scan with the intact
    * prefix.
    */
  private final class BmffWalk(bytes: Array[Byte]) {
    val n: Long = bytes.length.toLong
    def fourcc(o: Long): String =
      new String(bytes, o.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(o: Long): Int = be16(bytes, o.toInt)
    def u32(o: Long): Long = be32(bytes, o.toInt).toLong & 0xffffffffL
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)
    def isBmff: Boolean = n >= 12 && fourcc(4) == "ftyp"

    /** Payload extents of every `tag` child box in [from, to). */
    def children(tag: String, from: Long, to: Long): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val sz0 = u32(off)
        val id = fourcc(off + 4)
        val (hdr, sz) =
          if (sz0 == 1L) {
            if (off + 16 > to) { ok = false; (0L, 0L) } else (16L, u64(off + 8))
          } else if (sz0 == 0L) (8L, to - off)
          else (8L, sz0)
        if (ok && (sz < hdr || off + sz > to)) ok = false
        if (ok) {
          if (id == tag) out += ((off + hdr, off + sz))
          off += sz
        }
      }
      out.toSeq
    }
    def first(tag: String, from: Long, to: Long): Option[(Long, Long)] =
      children(tag, from, to).headOption

    /** stbl payload extents of every `vide` track, in file order. */
    def videoStbls: Seq[(Long, Long)] = for {
      (moovS, moovE) <- first("moov", 0L, n).toSeq
      (trakS, trakE) <- children("trak", moovS, moovE)
      (mdiaS, mdiaE) <- first("mdia", trakS, trakE).toSeq
      (hdlrS, hdlrE) <- first("hdlr", mdiaS, mdiaE).toSeq
      // hdlr payload: version/flags(4) pre_defined(4) handler_type(4)
      if hdlrE - hdlrS >= 12 && fourcc(hdlrS + 8) == "vide"
      (minfS, minfE) <- first("minf", mdiaS, mdiaE).toSeq
      stbl <- first("stbl", minfS, minfE).toSeq
    } yield stbl

    /** (format fourcc, depth, width, height) of a stbl's first
      * VisualSampleEntry: stsd is version/flags(4) entry_count(4), then
      * size(4) format(4) reserved(6) dri(2) pre_defined/reserved(16)
      * width(2) height(2) ... depth @ entry+82.
      */
    def stsdFacts(stblS: Long, stblE: Long): Option[(String, Int, Int, Int)] =
      first("stsd", stblS, stblE).flatMap { case (sS, sE) =>
        if (sE - sS >= 8 && u32(sS + 4) >= 1 &&
            sS + 8 + 86 <= sE && u32(sS + 8) >= 86) {
          val e = sS + 8
          Some((fourcc(e + 4), u16(e + 82), u16(e + 32), u16(e + 34)))
        } else None
      }
  }

  /** Facts of the FIRST `vide` track of an ISO base-media (MP4 / MOV)
    * container: the sample-entry FORMAT fourcc (`raw `, `jpeg`, `mjpa`,
    * `avc1`, ...), bit depth, width / height, and every video sample's
    * absolute (offset, length) byte range in sample order — resolved
    * from the published ISO/IEC 14496-12 sample tables: `stsd` (shape),
    * `stsz` (sizes), `stsc` (sample-to-chunk runs), `stco` / `co64`
    * (chunk offsets). The walk is truncation-safe like the RIFF walks:
    * a sample overrunning the payload ends the scan with the intact
    * PREFIX (log-and-truncate), and malformed tables yield None, never
    * guesses. Declared sample volume is BOUNDED before materialization:
    * a uniform-size table must fit the payload, and no table may declare
    * more than [[MaxMp4Samples]] samples per payload (4M ≈ 38 h at
    * 30 fps) — a crafted stsz cannot allocate unbounded range lists.
    */
  private[ops] final case class Mp4Video(format: String, depth: Int,
                                         width: Int, height: Int,
                                         frames: Seq[(Long, Long)])

  private[ops] val MaxMp4Samples: Long = 4L * 1024 * 1024

  /** The cheap stsd-only probe ([[decodeOne]]'s path): format fourcc,
    * depth, width, height of the first `vide` track — no sample-table
    * materialization.
    */
  private[ops] def mp4VideoFacts(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
    val wk = new BmffWalk(bytes)
    if (!wk.isBmff) None
    else wk.videoStbls.iterator
      .flatMap { case (s, e) => wk.stsdFacts(s, e) }
      .nextOption()
  }

  private[ops] def mp4Video(bytes: Array[Byte]): Option[Mp4Video] = {
    val wk = new BmffWalk(bytes)
    if (!wk.isBmff) return None
    import wk.{first, n, u32, u64}
    def trakVideo(stblS: Long, stblE: Long): Option[Mp4Video] = {
      for {
        (format, depth, w, h) <- wk.stsdFacts(stblS, stblE)
        (stszS, stszE) <- first("stsz", stblS, stblE)
        (stscS, stscE) <- first("stsc", stblS, stblE)
        // chunk offsets: stco (u32) or co64 (u64)
        ((chS, chE), coWidth) <- first("stco", stblS, stblE).map((_, 4L))
          .orElse(first("co64", stblS, stblE).map((_, 8L)))
        // stsz: version/flags(4) uniform_size(4) sample_count(4)
        if stszE - stszS >= 12
        uniform = u32(stszS + 4)
        count = u32(stszS + 8)
        // stsc runs: (first_chunk 1-based, samples_per_chunk, sdi)
        runCount = if (stscE - stscS >= 8) u32(stscS + 4) else -1L
        chunkCount = if (chE - chS >= 8) u32(chS + 4) else -1L
        // bound the declared volume BEFORE materializing anything: a
        // per-sample table must physically fit its box; a uniform table's
        // declared total must fit the payload; and the absolute sample
        // cap refuses tables that would allocate unbounded range lists
        if (if (uniform != 0L) count <= n / uniform
            else stszS + 12 + 4 * count <= stszE) &&
          count >= 1 && count <= MaxMp4Samples &&
          runCount >= 1 && stscS + 8 + 12 * runCount <= stscE &&
          chunkCount >= 1 && chS + 8 + coWidth * chunkCount <= chE
      } yield {
        def sampleSize(i: Long): Long =
          if (uniform != 0L) uniform else u32(stszS + 12 + 4 * i)
        val ranges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var run = 0L
        var sample = 0L
        var chunk = 1L
        var truncated = false
        while (!truncated && sample < count && chunk <= chunkCount) {
          // advance to the stsc run covering this chunk
          while (run + 1 < runCount && u32(stscS + 8 + 12 * (run + 1)) <= chunk)
            run += 1
          val spc = u32(stscS + 8 + 12 * run + 4)
          var off =
            if (coWidth == 4L) u32(chS + 8 + 4 * (chunk - 1))
            else u64(chS + 8 + 8 * (chunk - 1))
          var i = 0L
          while (!truncated && i < spc && sample < count) {
            val len = sampleSize(sample)
            // a sample past the payload truncates the walk (the intact
            // prefix stands), mirroring the RIFF walks
            if (off + len > n) truncated = true
            else {
              ranges += ((off, len))
              off += len
              sample += 1
              i += 1
            }
          }
          chunk += 1
        }
        if (ranges.nonEmpty)
          Some(Mp4Video(format, depth, w, h, ranges.toSeq))
        else None
      }
    }.flatten
    wk.videoStbls.iterator
      .map { case (s, e) => trakVideo(s, e) }
      .collectFirst { case Some(v) => v }
  }

  /** One MP4 video sample as image BYTES: `raw ` 24-bit samples —
    * packed TOP-DOWN RGB rows per the QuickTime uncompressed-video
    * layout — are rewrapped as a bottom-up BGR BMP (then
    * [[decodeGrayImage]]'s exact byte-math path applies); `jpeg` /
    * `mjpa` (or, for formats this walk doesn't know, JPEG-magic)
    * samples pass through to the JDK decoder. The stsd format is
    * AUTHORITATIVE: a declared `raw ` sample is never magic-sniffed —
    * raw pixels that happen to start 0xFF 0xD8 must not be misrouted to
    * the JPEG decoder. Anything else (avc1/hevc need a real codec) is
    * skipped, not guessed.
    */
  private def mp4FrameImage(bytes: Array[Byte], off: Int, len: Int,
                            format: String, depth: Int,
                            w: Int, h: Int): Option[Array[Byte]] = {
    val isJpeg = format != "raw " && (format == "jpeg" || format == "mjpa" ||
      (len >= 2 && (bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8))
    if (isJpeg) Some(java.util.Arrays.copyOfRange(bytes, off, off + len))
    else if (format == "raw " && depth == 24 && w > 0 && h > 0) {
      // bounds math in LONG (cf. aviFrameImage): a crafted stsd with a
      // huge width must not overflow `w * 3` in Int and slip the check
      val rowLen = w.toLong * 3            // packed — no row alignment
      if (len.toLong < rowLen * h) None
      else {
        val bmp = bmpBytes(w, h)
        val bmpRow = ((w * 3 + 3) / 4) * 4
        var y = 0
        while (y < h) {
          val src = off + y * rowLen.toInt
          val dst = 54 + (h - 1 - y) * bmpRow
          var x = 0
          while (x < w) {
            bmp(dst + x * 3) = bytes(src + x * 3 + 2)       // B
            bmp(dst + x * 3 + 1) = bytes(src + x * 3 + 1)   // G
            bmp(dst + x * 3 + 2) = bytes(src + x * 3)       // R
            x += 1
          }
          y += 1
        }
        Some(bmp)
      }
    } else None
  }

  /** (doc_id, frame_idx, frame_hash) — per-partition container walk
    * ([[containerFrames]]: motion-BMP or RIFF/AVI) + per-frame
    * [[dHashGray]]; frames that fail to hash are skipped.
    */
  def videoFrameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        containerFrames(bytes).zipWithIndex.flatMap { case (frame, i) =>
          dHashGray(frame).map(h => (id, i, h))
        }
      })
      .toDF("doc_id", "frame_idx", "frame_hash")
  }

  /** Video near-duplicate pairs: per-video DISTINCT frame-hash sets,
    * exact set-Jaccard via [[Dedup.jaccardPairs]]'s inverted index (the
    * frame hash IS the token — one equi-join on hash values, never
    * all-pairs). Videos sharing >= `threshold` of their distinct frame
    * hashes pair; reordering/duplicating frames does not (sets), while
    * replacing frames lowers Jaccard proportionally — standard keyframe-
    * signature dedup with the exact measure instead of a sketch.
    */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame,
                        threshold: Double): DataFrame = {
    val sets = videoFrameHashes(spark, media)
      .groupBy(col("doc_id")).agg(collect_set(col("frame_hash")).as("hashes"))
    Dedup.jaccardPairs(sets, "doc_id", "hashes", threshold,
      tokenizer = c => c)   // already a distinct hash array
  }

  /** Deterministic video corpus with planted near-duplicates: videos in
    * GROUPS of 4 (`doc_id / 4`); each is 10 motion-BMP frames whose
    * images are [[synthGray]] grids of frame doc-ids `grp*1000 + 4k`
    * (k = 0..9 — spaced by 4 so every frame is the BASE of a distinct
    * synthGray group; consecutive ids would be near-identical variants of
    * one pattern and hash-collide within the video); variant v REPLACES
    * frame 2v with the image of `grp*1000 + 400 + 4v`, so
    * Jaccard(base, variant) = 9/11 over distinct hashes (absent residual
    * hash collisions, which the oracle replays identically) and unrelated
    * groups share nothing.
    */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => {
      val grp = id / 4
      val v = (id % 4).toInt
      val frames = (0 until 10).map { k =>
        val fid = if (v > 0 && k == 2 * v) grp * 1000 + 400 + 4 * v
                  else grp * 1000 + 4 * k
        bmpGrayBytes(9, 8, synthGray(fid))
      }
      val total = frames.map(_.length).sum
      val out = new Array[Byte](total)
      var off = 0
      frames.foreach { f =>
        System.arraycopy(f, 0, out, off, f.length); off += f.length
      }
      out
    })
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  // ---- AVI fixture writer (a REAL container no corpus would refuse) --------

  /** A minimal well-formed AVI: `RIFF AVI ` with `LIST hdrl` (avih + one
    * `LIST strl` of strh('vids', handler) + strf BITMAPINFOHEADER) and
    * `LIST movi` carrying one `00db`/`00dc` chunk per frame. `frames` are
    * DIB pixel bits (bottom-up 24-bit rows) for `"DIB "`, or whole JPEG
    * files for `"MJPG"`.
    */
  private[ops] def aviBytes(w: Int, h: Int, handler: String,
                            frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = s.foreach(c => bos.write(c.toInt))
    val isJpeg = handler == "MJPG"
    // sizes, innermost out: each movi chunk is 8 + padded payload
    val framesSize = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + framesSize
    val strlSize = 4 + (8 + 56) + (8 + 40)         // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)   // 'hdrl' + avih + LIST strl
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(100000); le32(0); le32(0); le32(0)        // usec/frame, maxBps, pad, flags
    le32(frames.size); le32(0); le32(1); le32(0)   // totalFrames, initial, streams, sugBuf
    le32(w); le32(h); (0 until 4).foreach(_ => le32(0))
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag(handler)
    le32(0); le16(0); le16(0); le32(0)             // flags, priority, language, initial
    le32(1); le32(10)                              // scale, rate
    le32(0); le32(frames.size); le32(0); le32(-1)  // start, length, sugBuf, quality
    le32(0); le16(0); le16(0); le16(w); le16(h)    // sampleSize, rcFrame
    tag("strf"); le32(40)
    le32(40); le32(w); le32(h); le16(1); le16(24)  // biSize..biBitCount
    le32(if (isJpeg) 0x47504a4d else 0)            // biCompression ('MJPG' / BI_RGB)
    le32(0); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    frames.foreach { f =>
      tag(if (isJpeg) "00dc" else "00db"); le32(f.length)
      bos.write(f, 0, f.length)
      if ((f.length & 1) == 1) bos.write(0)
    }
    bos.toByteArray
  }

  /** The [[syntheticVideos]] corpus re-packed as REAL AVI containers with
    * uncompressed DIB frames (exact byte math end to end, so the x79
    * oracle replays the identical closed form through the RIFF walk).
    * Same group/variant planting — Jaccard structure unchanged.
    */
  def syntheticAviVideos(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => {
      val grp = id / 4
      val v = (id % 4).toInt
      val frames = (0 until 10).map { k =>
        val fid = if (v > 0 && k == 2 * v) grp * 1000 + 400 + 4 * v
                  else grp * 1000 + 4 * k
        // DIB bits = the BMP pixel array without its 54-byte file header
        java.util.Arrays.copyOfRange(bmpGrayBytes(9, 8, synthGray(fid)), 54,
          54 + ((9 * 3 + 3) / 4 * 4) * 8)
      }
      aviBytes(9, 8, "DIB ", frames)
    })
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }

  // ---- MP4 fixture writer (ISO base-media, the published box grammar) ------

  /** Big-endian byte builder for ISO base-media boxes. */
  private final class BeBuf {
    private val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u16((v >> 16).toInt); u16(v.toInt) }
    def tag(s: String): Unit = s.foreach(c => bos.write(c.toInt))
    def raw(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    def bytes: Array[Byte] = bos.toByteArray
  }
  private def beBuf(f: BeBuf => Unit): Array[Byte] = {
    val b = new BeBuf; f(b); b.bytes
  }
  private def mkBox(tag4: String, payload: Array[Byte]*): Array[Byte] =
    beBuf { b =>
      b.u32(8L + payload.map(_.length.toLong).sum)
      b.tag(tag4)
      payload.foreach(b.raw)
    }

  /** A minimal well-formed MP4: `ftyp` + `mdat` (samples back to back) +
    * trailing `moov` with one `vide` track whose full sample-table chain
    * (stsd/stts/stsc/stsz/stco) describes the frames — samples are
    * grouped into chunks of up to 4, so the stsc run table and the
    * chunk-offset interplay are genuinely exercised, not degenerate.
    * `format` is the sample-entry fourcc: `"raw "` frames are packed
    * top-down RGB rows; `"jpeg"` frames are whole JPEG files.
    */
  private[ops] def mp4Bytes(w: Int, h: Int, format: String,
                            frames: Seq[Array[Byte]]): Array[Byte] = {
    val ftyp = mkBox("ftyp", beBuf { b =>
      b.tag("isom"); b.u32(512); b.tag("isom"); b.tag("mp42")
    })
    val mdat = mkBox("mdat", frames: _*)
    val chunkSizes = frames.grouped(4).map(_.size).toSeq
    val dataStart = ftyp.length.toLong + 8
    val sampleOffsets = frames.scanLeft(dataStart)((o, f) => o + f.length)
    val chunkOffsets = chunkSizes.scanLeft(0)(_ + _).init.map(sampleOffsets(_))
    // collapse consecutive equal samples-per-chunk into stsc runs
    val runs = chunkSizes.zipWithIndex.foldLeft(List.empty[(Int, Int)]) {
      case (acc, (spc, idx)) =>
        if (acc.headOption.exists(_._2 == spc)) acc
        else (idx + 1, spc) :: acc
    }.reverse
    val entry = mkBox(format, beBuf { b =>
      (0 until 6).foreach(_ => b.u8(0)); b.u16(1)     // reserved, data_ref_index
      b.u16(0); b.u16(0)                              // pre_defined, reserved
      (0 until 3).foreach(_ => b.u32(0))              // pre_defined[3]
      b.u16(w); b.u16(h)
      b.u32(0x00480000L); b.u32(0x00480000L)          // 72 dpi
      b.u32(0); b.u16(1)                              // reserved, frame_count
      b.u8(5); b.tag("graft"); (0 until 26).foreach(_ => b.u8(0)) // name (32)
      b.u16(24); b.u16(0xffff)                        // depth, pre_defined
    })
    val stsd = mkBox("stsd", beBuf { b => b.u32(0); b.u32(1) }, entry)
    val stts = mkBox("stts", beBuf { b =>
      b.u32(0); b.u32(1); b.u32(frames.size.toLong); b.u32(1)
    })
    val stsc = mkBox("stsc", beBuf { b =>
      b.u32(0); b.u32(runs.size.toLong)
      runs.foreach { case (fc, spc) =>
        b.u32(fc.toLong); b.u32(spc.toLong); b.u32(1)
      }
    })
    val stsz = mkBox("stsz", beBuf { b =>
      b.u32(0); b.u32(0); b.u32(frames.size.toLong)
      frames.foreach(f => b.u32(f.length.toLong))
    })
    val stco = mkBox("stco", beBuf { b =>
      b.u32(0); b.u32(chunkOffsets.size.toLong)
      chunkOffsets.foreach(b.u32)
    })
    val stbl = mkBox("stbl", stsd, stts, stsc, stsz, stco)
    val url = mkBox("url ", beBuf(_.u32(1)))           // self-contained flag
    val dref = mkBox("dref", beBuf { b => b.u32(0); b.u32(1) }, url)
    val dinf = mkBox("dinf", dref)
    val vmhd = mkBox("vmhd", beBuf { b =>
      b.u32(1); b.u16(0); (0 until 3).foreach(_ => b.u16(0))
    })
    val minf = mkBox("minf", vmhd, dinf, stbl)
    val hdlr = mkBox("hdlr", beBuf { b =>
      b.u32(0); b.u32(0); b.tag("vide"); (0 until 3).foreach(_ => b.u32(0))
      b.tag("graft"); b.u8(0)
    })
    val mdhd = mkBox("mdhd", beBuf { b =>
      b.u32(0); b.u32(0); b.u32(0); b.u32(1000); b.u32(frames.size.toLong)
      b.u16(0x55c4); b.u16(0)                          // language 'und'
    })
    val mdia = mkBox("mdia", mdhd, hdlr, minf)
    val identityMatrix: BeBuf => Unit = { b =>
      b.u32(0x10000); b.u32(0); b.u32(0); b.u32(0); b.u32(0x10000); b.u32(0)
      b.u32(0); b.u32(0); b.u32(0x40000000L)
    }
    val tkhd = mkBox("tkhd", beBuf { b =>
      b.u32(7)                                         // v0, enabled|in-movie
      b.u32(0); b.u32(0); b.u32(1); b.u32(0)           // times, track_id, rsvd
      b.u32(frames.size.toLong); b.u32(0); b.u32(0)
      b.u16(0); b.u16(0); b.u16(0); b.u16(0)           // layer, alt, volume, rsvd
      identityMatrix(b)
      b.u32(w.toLong << 16); b.u32(h.toLong << 16)     // fixed-point dims
    })
    val mvhd = mkBox("mvhd", beBuf { b =>
      b.u32(0); b.u32(0); b.u32(0); b.u32(1000); b.u32(frames.size.toLong)
      b.u32(0x10000); b.u16(0x100); b.u16(0); b.u32(0); b.u32(0)
      identityMatrix(b)
      (0 until 6).foreach(_ => b.u32(0)); b.u32(2)     // pre_defined, next track
    })
    val moov = mkBox("moov", mvhd, mkBox("trak", tkhd, mdia))
    beBuf { b => b.raw(ftyp); b.raw(mdat); b.raw(moov) }
  }

  /** The [[syntheticVideos]] corpus re-packed as REAL ISO base-media
    * (MP4) containers with uncompressed `raw ` 24-bit samples — packed
    * top-down RGB rows, exact byte math end to end, so the x82 oracle
    * replays the identical closed form through the box walk. Same
    * group/variant planting — Jaccard structure unchanged.
    */
  def syntheticMp4Videos(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => {
      val grp = id / 4
      val v = (id % 4).toInt
      val frames = (0 until 10).map { k =>
        val fid = if (v > 0 && k == 2 * v) grp * 1000 + 400 + 4 * v
                  else grp * 1000 + 4 * k
        val f = new Array[Byte](9 * 8 * 3)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val p = (synthGray(fid)(x, y) & 0xff).toByte
            val o = (y * 9 + x) * 3
            f(o) = p; f(o + 1) = p; f(o + 2) = p
            x += 1
          }
          y += 1
        }
        f
      }
      mp4Bytes(9, 8, "raw ", frames)
    })
    df.select(col(idCol).as("doc_id"), gen(col(idCol)).as("media"))
  }
}
