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

  test("q_mm_features lanes are the decoded raster's channel means (hand-computed fixture)") {
    // text "abc" → one 16-pixel row: bytes [97,98,99, 0×45]. Channel sums
    // 97/98/99 over 16 pixels; overall mean 294/48. Exact in binary64.
    import SparkTestBase._
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("graft-mmfeat").toString
    spark.range(1)
      .select(lit(7L).as("doc_id"), lit("abc").as("text"), lit("en").as("lang"))
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.operators.MultimodalOps.qMmFeatures(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 7L && row.getLong(1) == 3L)
    assert(row.getDouble(2) == 97.0 / 16)                 // f0 = 6.0625
    assert(row.getDouble(3) == 98.0 / 16)                 // f1 = 6.125
    assert(row.getDouble(4) == 99.0 / 16)                 // f2 = 6.1875
    assert(row.getDouble(5) == 6.125)                     // f3 = 294/48
  }

  test("WAV round-trip: encode then decode returns rate and samples exactly") {
    import graft.operators.MultimodalOps.Wav
    val pcm = Array[Short](256, -16384, 512, 0, Short.MinValue, Short.MaxValue)
    val a = Wav.decode(Wav.encode(pcm, 8000, "rt"))
    assert(a.rate == 8000 && a.samples.toSeq == pcm.toSeq)
  }

  test("WAV parser skips unknown chunks and honors the odd-size pad rule") {
    import graft.operators.MultimodalOps.Wav
    // the canonical encoder always emits an odd-sized JUNK chunk, so every
    // round-trip crosses both paths; this pins them explicitly at size 1
    val a = Wav.decode(Wav.encode(Array[Short](100), 8000, ""))
    assert(a.samples.toSeq == Seq(100.toShort))
  }

  test("WAV parser rejects malformed containers loudly") {
    import graft.operators.MultimodalOps.Wav
    val good = Wav.encode(Array[Short](1, 2, 3), 8000, "x")
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](Wav.decode(good.dropRight(1))) // bad RIFF size
    intercept[IllegalArgumentException](Wav.decode(good.take(12)))     // no chunks at all
    // data before fmt: swap by re-encoding a container with fmt renamed
    val nofmt = good.clone()
    val fmtAt = good.indexOfSlice("fmt ".getBytes)
    nofmt(fmtAt) = 'X'.toByte
    intercept[IllegalArgumentException](Wav.decode(nofmt))
  }

  test("q_mm_audio features are exact on a hand-computed fixture") {
    // "a b": bytes 97,32,98 -> samples 256,-16384,512 at bias 96
    // peak 16384; crossings 2; energy 256^2+16384^2+512^2 = 268763136
    import SparkTestBase._
    import org.apache.spark.sql.functions.lit
    val dir = java.nio.file.Files.createTempDirectory("graft-mmaudio").toString
    spark.range(1)
      .select(lit(7L).as("doc_id"), lit("a b").as("text"), lit("en").as("lang"))
      .write.parquet(s"$dir/documents.parquet")
    val r = graft.operators.MultimodalOps.qMmAudio(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 7L)
    assert(row.getLong(1) == 3L)          // n_samples
    assert(row.getLong(2) == 375L)        // duration_us at 8 kHz
    assert(row.getLong(3) == 16384L)      // peak
    assert(row.getLong(4) == 2L)          // zero crossings around the space
    assert(row.getLong(5) == 268763136L)  // energy
  }

  test("phash near-dup pigeonhole: every <=3-bit flip leaves a shared band (exhaustive)") {
    // 4 bands × 16 bits; flipping any 3 of the 64 bits must leave >=1 of
    // the 4 bands untouched (pigeonhole) — the completeness guarantee the
    // banded candidate join rests on. Exhaustive over all C(64,3) +
    // C(64,2) + 64 flip sets against a fixed base hash.
    val base = Array(0xBEEF, 0x1234, 0xF0F0, 0x0557) // arbitrary 16-bit bands
    def flipped(bits: Seq[Int]): Array[Int] = {
      val h = base.clone()
      bits.foreach(b => h(b / 16) ^= 1 << (b % 16))
      h
    }
    var checked = 0
    for (i <- 0 until 64) {
      assert(flipped(Seq(i)).zip(base).exists { case (x, y) => x == y }); checked += 1
      for (j <- i + 1 until 64) {
        assert(flipped(Seq(i, j)).zip(base).exists { case (x, y) => x == y }); checked += 1
        for (k <- j + 1 until 64) {
          assert(flipped(Seq(i, j, k)).zip(base).exists { case (x, y) => x == y })
          checked += 1
        }
      }
    }
    assert(checked == 64 + 64 * 63 / 2 + 64 * 63 * 62 / 6)
  }

  test("phash near-dup join: radius semantics on crafted band values") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import SparkTestBase.spark
    val schema = StructType(Seq("doc_id" -> LongType, "h0" -> IntegerType,
      "h1" -> IntegerType, "h2" -> IntegerType, "h3" -> IntegerType)
      .map { case (n, t) => StructField(n, t, nullable = false) })
    // 1: base; 2: identical (ham 0); 3: one bit in band0 (ham 1);
    // 4: three bits in band2 (ham 3); 5: four bits all in band1 (ham 4 —
    // candidate shares 3 bands, exact verify must REJECT);
    // 6: four bits spread 1-per-band (ham 4 — shares NO band, never a
    // candidate; either path must leave ham-4 out of the result)
    val rows = Seq(
      Row(1L, 0xBEEF, 0x1234, 0xF0F0, 0x0557),
      Row(2L, 0xBEEF, 0x1234, 0xF0F0, 0x0557),
      Row(3L, 0xBEEE, 0x1234, 0xF0F0, 0x0557),
      Row(4L, 0xBEEF, 0x1234, 0xF0F0 ^ 0x0111, 0x0557),
      Row(5L, 0xBEEF, 0x1234 ^ 0x000F, 0xF0F0, 0x0557),
      Row(6L, 0xBEEF ^ 1, 0x1234 ^ 2, 0xF0F0 ^ 4, 0x0557 ^ 8))
    val hashes = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = graft.operators.MultimodalOps.phashNearJoin(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // driver-side brute force = the completeness contract: the banded
    // join must return EXACTLY the <=radius pairs an all-pairs scan finds
    val byId = rows.map(r => r.getLong(0) ->
      (1 to 4).map(r.getInt)).toMap
    val want = (for {
      a <- byId.keys; b <- byId.keys if a < b
      hm = byId(a).zip(byId(b)).map { case (x, y) =>
        Integer.bitCount(x ^ y) }.sum
      if hm <= 3
    } yield (a, b, hm)).toSet
    assert(want.contains((1L, 2L, 0)) && want.contains((3L, 6L, 3)),
      "fixture must exercise ham-0 and a cross-band ham-3 pair")
    assert(!want.exists(_._1 == 5L) && !want.exists(_._2 == 5L),
      "fixture's in-band ham-4 row must be outside the radius")
    assert(got == want)
  }

  test("q_mm_keyframes selects exactly the above-threshold frames of q_mm_video") {
    import SparkTestBase._
    import graft.operators.MultimodalOps
    // mirror from the sibling gate's output: collect the clip motions and
    // re-apply the integer rule independently
    val motions = SparkEntry.queries("q_mm_video")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Long]("motion")))
      .groupBy(_._1)
    val want = motions.toSeq.flatMap { case (_, fs) =>
      val tot = fs.filter(_._2 > 0).map(_._3).sum
      fs.sortBy(_._2).filter { case (_, f, mo) =>
        f == 0 || mo * (MultimodalOps.VID_FRAMES - 1) * MultimodalOps.KF_DEN >
          MultimodalOps.KF_NUM * tot
      }.zipWithIndex.map { case ((d, f, mo), i) => (d, f, mo, i + 1) }
    }.toSet
    val got = SparkEntry.queries("q_mm_keyframes")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want, s"diff: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // structural invariants: every clip opens with keyframe 0 / rank 1, and
    // the fixture corpus actually exercises a non-trivial selection
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == motions.keySet, "every clip must keep >= 1 keyframe")
    byDoc.foreach { case (doc, ks) =>
      assert(ks.exists(k => k._2 == 0 && k._4 == 1), s"clip $doc must open with frame 0")
    }
    assert(got.size < motions.size * MultimodalOps.VID_FRAMES,
      "threshold must actually drop frames on the real corpus")
    assert(got.exists(_._2 > 0), "some clip must have a mid-clip shot boundary")
  }
}

