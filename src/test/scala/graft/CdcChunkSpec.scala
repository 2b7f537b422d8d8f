package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** q_cdc_chunks proofs: (1) chunking is LOSSLESS — a doc's chunks in order
  * reassemble the doc byte-for-byte; (2) cut points are CONTENT-defined —
  * prepending an arbitrary prefix to a doc leaves every interior cut point
  * of the shared text in place, so the shared chunks digest identically in
  * both copies (the property fixed-size/paragraph chunking lacks); (3) the
  * per-doc dup report equals a from-scratch brute-force mirror on both a
  * planted corpus and the real sf0.001 corpus.
  */
class CdcChunkSpec extends AnyFunSuite {
  import SparkTestBase._
  import DedupOps.{CDC_W, CDC_D}

  /** Deterministic pseudo-random lowercase string (LCG, no RNG). */
  private def gen(seed: Long, n: Int): String = {
    var x = seed
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + java.lang.Long.remainderUnsigned(x >>> 33, 26).toInt).toChar)
      i += 1
    }
    sb.toString
  }

  /** JVM twin of Fns.hash32: first 8 hex chars of md5 as unsigned long. */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII"))
    java.lang.Long.parseLong(f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x" +
      f"${d(2) & 0xff}%02x${d(3) & 0xff}%02x", 16)
  }

  /** Brute chunking straight from the definition: starts = {1} ∪
    * {j ≥ 2 : hash32(text[j, j+W)) mod D = 0, window fits}. 1-based. */
  private def chunksOf(t: String): Vector[String] = {
    val starts = 1 +: (2 to t.length - CDC_W + 1)
      .filter(j => hash32(t.substring(j - 1, j - 1 + CDC_W)) % CDC_D == 0)
      .toVector
    starts.zip(starts.drop(1) :+ (t.length + 1))
      .map { case (s, e) => t.substring(s - 1, e - 1) }.toVector
  }

  /** Brute per-doc report: chunk text recurring in ≥2 DISTINCT docs is dup. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val per = docs.map { case (id, t) => id -> chunksOf(t) }
    val owners = per.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    per.map { case (id, cs) =>
      val dups = cs.filter(c => (owners(c) - id).nonEmpty)
      id -> ((cs.size.toLong, dups.size.toLong, dups.map(_.length).sum.toLong))
    }.toMap
  }

  private def df(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Double)] =
    DedupOps.cdcChunksOf(df(docs)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("chunks reassemble every doc byte-for-byte (lossless partition)") {
    val docs = (0 until 12).map(i => ((i + 1).toLong, gen(100 + i, 40 + i * 97)))
    val got = DedupOps.cdcChunkFrame(df(docs)).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getString(2)).mkString }
    docs.foreach { case (id, t) =>
      assert(got(id) == t, s"doc $id must reassemble from its chunks")
    }
    // and the short-doc corner: below W+1 chars there is one whole-doc chunk
    val short = Seq((1L, gen(7, CDC_W - 3)))
    val sc = DedupOps.cdcChunkFrame(df(short)).collect()
    assert(sc.length == 1 && sc.head.getString(2) == short.head._2)
  }

  test("cut points survive a prefix shift (content-defined, not offset-defined)") {
    val payload = gen(55, 1200)
    val d1 = payload
    val d2 = gen(56, 137) + payload // every byte offset shifted by 137
    val by = DedupOps.cdcChunkFrame(df(Seq((1L, d1), (2L, d2)))).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toVector }
    val c1 = by(1L)
    val c2 = by(2L)
    // with a ~1/D boundary rate a 1200-char payload carries interior cuts
    // (deterministic for this fixed seed); all payload chunks after d2's
    // first in-payload cut must appear verbatim among d1's chunks
    val shared = c2.filter(c1.toSet)
    assert(shared.nonEmpty, "the shared payload must contribute identical chunks")
    assert(shared == c1.drop(1) || shared == c1,
      s"d2 must reproduce d1's interior chunks exactly: got ${shared.size} of ${c1.size}")
    // brute agrees: the gate reports those shared chars as dup on both docs
    val rep = run(Seq((1L, d1), (2L, d2)))
    val want = shared.map(_.length).sum.toLong
    assert(rep(1L)._3 == want && rep(2L)._3 == want,
      s"dup_chars must equal the shared-chunk chars: ${rep(1L)} / ${rep(2L)} want $want")
  }

  test("gate equals brute force on a planted corpus") {
    val base = (0 until 16).map(i => gen(2000 + i, 120 + (i * 211) % 900)).toArray
    for (k <- 0 until 6) {
      val p = gen(6000 + k, 150 + k * 60)
      val a = k % 16
      val b = (k * 5 + 2) % 16
      if (a != b) {
        val offA = (k * 17) % (base(a).length / 2)
        val offB = (k * 41 + 9) % (base(b).length / 2)
        base(a) = base(a).substring(0, offA) + p + base(a).substring(offA)
        base(b) = base(b).substring(0, offB) + p + base(b).substring(offB)
      }
    }
    val docs = base.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }.toSeq
    val expected = brute(docs)
    val got = run(docs)
    assert(expected.exists(_._2._3 > 0), "corpus must contain planted dup chunks")
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (nc, nd, dc)) =>
      val (gnc, gnd, gdc, gfr) = got(id)
      assert((gnc, gnd, gdc) == ((nc, nd, dc)),
        s"doc $id mismatch: got (${gnc},${gnd},${gdc}) want ($nc,$nd,$dc)")
      val nChars = docs.find(_._1 == id).get._2.length
      val want = math.floor(dc.toDouble / nChars * 1e4 + 0.5) / 1e4
      assert(gfr == want, s"doc $id dup_frac: $gfr != $want")
    }
  }

  test("gate equals brute force on the real sf0.001 corpus") {
    val corpus = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = brute(corpus)
    val got = DedupOps.qCdcChunks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, want) =>
      assert(got(id) == want, s"doc $id: ${got(id)} != $want")
    }
  }
}
