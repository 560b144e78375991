package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The dHash decoder's grid sampling and input gating (the package-private
  * halves [[ImageNearDupSinkSpec]] cannot reach).
  */
class DHashSpec extends AnyFunSuite {

  test("dHash resamples larger images onto the 9x8 grid") {
    // a 36x16 image whose 9x8 floor-sample reproduces a known 9x8 pattern:
    // pixel(x, y) = base(x / 4, y / 2) makes sampling exact
    def base(gx: Int, gy: Int): Int = (gx * 31 + gy * 17 + 5) % 256
    val big = Multimodal.bmpGrayBytes(36, 16, (x, y) => base(x / 4, y / 2))
    val small = Multimodal.bmpGrayBytes(9, 8, base)
    assert(Multimodal.dHashGray(big).isDefined)
    assert(Multimodal.dHashGray(big) === Multimodal.dHashGray(small))
    // too-small and non-BMP payloads yield no hash
    assert(Multimodal.dHashGray(Multimodal.bmpGrayBytes(4, 4, base)).isEmpty)
    assert(Multimodal.dHashGray("xx".getBytes("UTF-8")).isEmpty)
  }

  test("the written BMP inverts to the logical pixel function") {
    def g(x: Int, y: Int): Int = (x * 7 + y * 13 + 1) % 256
    val bytes = Multimodal.bmpGrayBytes(9, 8, g)
    // dHash over identity sampling must equal the direct bit computation
    val expected = (0 until 64).foldLeft(0L) { (h, i) =>
      if (g(i % 8 + 1, i / 8) > g(i % 8, i / 8)) h | (1L << i) else h
    }
    assert(Multimodal.dHashGray(bytes) === Some(expected))
  }

  test("lossless PNG and GIF decode to the exact BMP hash (real ImageIO decode)") {
    def g(x: Int, y: Int): Int = (x * 29 + y * 41 + 3) % 256
    val viaBmp = Multimodal.dHashGray(Multimodal.bmpGrayBytes(9, 8, g))
    assert(viaBmp.isDefined)
    for (fmt <- Seq("png", "gif")) {
      val bytes = Multimodal.imageIoBytes(fmt, 9, 8, g)
      assert(Multimodal.dHashGray(bytes) === viaBmp,
        s"$fmt round trip must be bit-exact on achromatic pixels")
    }
    // and not just at grid size: a larger lossless image resamples the same
    def base(gx: Int, gy: Int): Int = (gx * 31 + gy * 17 + 5) % 256
    val bigPng = Multimodal.imageIoBytes("png", 36, 16, (x, y) => base(x / 4, y / 2))
    assert(Multimodal.dHashGray(bigPng) ===
      Multimodal.dHashGray(Multimodal.bmpGrayBytes(9, 8, base)))
  }

  test("JPEG round trip stays within a small Hamming tolerance (lossy by design)") {
    // a smooth ramp with large inter-cell steps: sampled dHash cells differ
    // by ~24 gray levels, far above default-quality JPEG error, so the
    // perceptual hash should survive the compression nearly unchanged
    def ramp(x: Int, y: Int): Int = math.min(255, x * 3 + y)
    val exact = Multimodal.dHashGray(Multimodal.bmpGrayBytes(72, 64, ramp)).get
    val jpeg = Multimodal.dHashGray(Multimodal.imageIoBytes("jpg", 72, 64, ramp))
    assert(jpeg.isDefined, "JPEG payload must decode through ImageIO")
    val hamming = java.lang.Long.bitCount(jpeg.get ^ exact)
    assert(hamming <= 4, s"JPEG perturbed the perceptual hash too far: $hamming bits")
  }

  test("undecodable bytes still yield no hash") {
    assert(Multimodal.dHashGray("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHashGray(Array[Byte]()).isEmpty)
    // a crafted header whose width overflows Int bounds math must yield
    // None, not an out-of-bounds crash (round-18 review finding)
    val evil = new Array[Byte](64)
    evil(0) = 'B'; evil(1) = 'M'
    evil(10) = 54            // data offset
    evil(28) = 24            // bit depth
    // width = 0x2AAAAAAB: w * 3 overflows Int negative
    evil(18) = 0xAB.toByte; evil(19) = 0xAA.toByte
    evil(20) = 0xAA.toByte; evil(21) = 0x2A.toByte
    evil(22) = 2             // height
    assert(Multimodal.dHashGray(evil).isEmpty)
  }
}
