package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the r16 multimodal kernels: the REAL codec round
  * trips (ImageIO PNG → dHash, ByteBuffer WAV → features) must equal an
  * INDEPENDENT driver replay of the shared byte rules — the same replay
  * the DuckDB oracles run, so a drift here is a t2 hash failure waiting
  * to happen. Driver-only (no Spark session): 100 seeded cases each. */
class MultimodalPropertySpec extends AnyFunSuite with graft.GenDriven {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(1, 400).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)))

  test("WAV round trip equals the byte->sample rule replay on random payloads") {
    forAllSampled(genBytes) { b =>
      val n = b.length
      val ns = MultimodalOps.audioSamples(n)
      val samples = Array.tabulate(ns)(i => ((b((2 * i) % n) & 0xff) - 128) * 256)
      var energy = 0L
      var zc = 0L
      var peak = 0L
      var i = 0
      while (i < ns) {
        val s = samples(i)
        energy += s.toLong * s
        if (i > 0 && samples(i - 1).toLong * s < 0) zc += 1
        if (math.abs(s) > peak) peak = math.abs(s)
        i += 1
      }
      val got = MultimodalOps.decodeAudio(MultimodalOps.encodeWav(b))
      assert(got === ((8000, ns, energy, zc, peak)), s"n=$n")
    }
  }

  test("dHash equals the byte->pixel rule replay on random payloads") {
    forAllSampled(genBytes) { b =>
      val n = b.length
      val (w, h) = MultimodalOps.imageDims(n)
      def gray(x: Int, y: Int): Int = {
        val i = (y * h / 8) * w + (x * w / 9)
        ((b((3 * i) % n) & 0xff) + (b((3 * i + 1) % n) & 0xff) +
          (b((3 * i + 2) % n) & 0xff)) / 3
      }
      val hex = "0123456789abcdef"
      val sb = new StringBuilder(16)
      var nib = 0
      var cnt = 0
      for (y <- 0 until 8; x <- 0 until 8) {
        nib = (nib << 1) | (if (gray(x, y) > gray(x + 1, y)) 1 else 0)
        cnt += 1
        if (cnt % 4 == 0) { sb.append(hex.charAt(nib)); nib = 0 }
      }
      val got = MultimodalOps.dHash(MultimodalOps.encodePng(b))
      assert(got === sb.toString, s"n=$n dims=${(w, h)}")
    }
  }
}
