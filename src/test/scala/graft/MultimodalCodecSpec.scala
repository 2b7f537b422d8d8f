package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps.Ppm

/** Unit coverage for the pure-JVM PPM (P6) codec behind the multimodal
  * gates — the grammar corners the gate rows cannot reach (the encoder
  * emits one canonical header shape), plus loud rejection of malformed
  * input. Spec: netpbm P6 — magic, whitespace/comment-separated decimal
  * fields, maxval ≤ 255, single whitespace, then w·h·3 raster bytes.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("round-trip: encode then decode returns the identical image") {
    val raster = Array.tabulate(2 * 3 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val img = Ppm.decode(Ppm.encode(2, 3, raster, "round trip"))
    assert(img.width == 2 && img.height == 3 && img.maxval == 255)
    assert(img.raster.toSeq == raster.toSeq)
  }

  test("parser accepts the grammar corners the canonical encoder never emits") {
    val raster = Array.tabulate(1 * 1 * 3)(_.toByte)
    // multiple whitespace kinds between fields, comments between any two
    // fields, multi-digit dims, CR/TAB separators
    val exotic = ascii("P6 # c1\n\t1\r\n# c2\n 1 # c3\n\t255\n") ++ raster
    val img = Ppm.decode(exotic)
    assert(img.width == 1 && img.height == 1)
    assert(img.raster.toSeq == raster.toSeq)
    // raster bytes that LOOK like header chars must not be reinterpreted
    val tricky = ascii("P6\n1 1\n255\n") ++ ascii("# 9")
    assert(Ppm.decode(tricky).raster.toSeq == ascii("# 9").toSeq)
  }

  test("malformed input fails loudly, never a silent partial image") {
    val ok = Ppm.encode(2, 1, new Array[Byte](6), "x")
    def mutated(f: Array[Byte] => Array[Byte]): Array[Byte] = f(ok.clone())
    // bad magic
    intercept[IllegalArgumentException](Ppm.decode(mutated { b => b(1) = '5'; b }))
    // truncated raster
    intercept[IllegalArgumentException](Ppm.decode(ok.dropRight(1)))
    // trailing junk after the promised raster
    intercept[IllegalArgumentException](Ppm.decode(ok :+ 0.toByte))
    // missing dimension digits
    intercept[IllegalArgumentException](Ppm.decode(ascii("P6\n\n255\n") ++ new Array[Byte](3)))
    // maxval beyond one byte (P6 would need 16-bit samples)
    intercept[IllegalArgumentException](
      Ppm.decode(ascii("P6\n1 1\n65535\n") ++ new Array[Byte](3)))
    // empty input
    intercept[IllegalArgumentException](Ppm.decode(Array.emptyByteArray))
  }

  test("encoder rejects rasters that disagree with the declared geometry") {
    intercept[IllegalArgumentException](Ppm.encode(2, 2, new Array[Byte](6), "short"))
    intercept[IllegalArgumentException](Ppm.encode(1, 1, new Array[Byte](3), "bad\ncomment"))
  }
}
