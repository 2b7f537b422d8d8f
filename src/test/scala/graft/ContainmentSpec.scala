package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fns
import graft.operators.DedupOps

/** Exact-recall proof for the asymmetric containment join: the gate's
  * prefix-filtered + positionally-pruned candidate generation must report
  * EXACTLY the pairs a brute-force all-pairs sweep finds — pruning is only
  * allowed to drop candidates the verify step would reject anyway.
  */
class ContainmentSpec extends AnyFunSuite {
  import SparkTestBase._

  // The corpus' shingle sets through the same shared primitives the gate
  // uses (pinned independently by FnsSpec), collected once.
  private lazy val shingles: Map[Long, Set[String]] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), Fns.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(Fns.shinglesOfTokens(col("toks"), col("text"), DedupOps.K)).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap

  private lazy val gate: Map[(Long, Long), Double] =
    DedupOps.qContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("gate equals the brute-force all-pairs containment sweep") {
    val eligible = shingles.filter(_._2.size >= DedupOps.CONT_MIN_SH).toSeq
    val brute = (for {
      (a, sa) <- eligible
      (b, sb) <- eligible
      if a != b
      inter = (sa & sb).size
      if inter * DedupOps.CONT_T_DEN >= sa.size * DedupOps.CONT_T_NUM
    } yield (a, b) -> math.floor(inter.toDouble / sa.size * 1e4 + 0.5) / 1e4).toMap
    assert(brute.nonEmpty, "corpus must contain containment pairs for this spec")
    assert(gate.keySet == brute.keySet,
      s"candidate pruning lost/added pairs: missing=${(brute.keySet -- gate.keySet).take(5)} " +
        s"extra=${(gate.keySet -- brute.keySet).take(5)}")
    brute.foreach { case (k, v) =>
      assert(gate(k) == v, s"containment value mismatch at $k: ${gate(k)} != $v")
    }
  }

  test("containment is asymmetric: catches contained-in pairs Jaccard misses") {
    // constructed corpus: doc 1 is a 30-word article; doc 2 wraps the same
    // article in ~120 words of boilerplate. C(1→2) = 1.0 but J(1,2) ≈ 0.2
    // — structurally invisible to the symmetric Jaccard gate.
    val article = (1 to 30).map(i => s"core$i").mkString(" ")
    val wrap = (1 to 60).map(i => s"pre$i").mkString(" ") + " " + article +
      " " + (1 to 60).map(i => s"post$i").mkString(" ")
    val other = (1 to 40).map(i => s"other$i").mkString(" ")
    import spark.implicits._
    val docs = Seq((1L, article), (2L, wrap), (3L, other))
      .toDF("doc_id", "text")
    val rep = DedupOps.containmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rep.keySet == Set((1L, 2L)), s"expected only (1,2), got ${rep.keySet}")
    assert(rep((1L, 2L)) == 1.0, s"full containment must score 1.0: ${rep((1L, 2L))}")
    // and the pair is indeed below the Jaccard gate's threshold
    val sh = Set(1L, 2L).map { id =>
      val toks = (if (id == 1L) article else wrap).split(" ").toSeq
      id -> toks.sliding(DedupOps.K).map(_.mkString(" ")).toSet
    }.toMap
    val jac = (sh(1L) & sh(2L)).size.toDouble / (sh(1L) | sh(2L)).size
    assert(jac < DedupOps.JAC_T, s"constructed pair should be sub-Jaccard, got $jac")
  }
}
