package graft

import graft.functions.{Fns, VectorExprs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the shared column builders — edge cases (empty
  * text, fewer than k words, hash range) evaluated through real Spark
  * plans. Cases are enumerated / fixed-seed so runs are reproducible (the
  * scalatest-scalacheck bridge artifact is not in the offline cache). */
class FnsSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def tokensOf(text: String): Seq[String] = {
    Seq(text).toDF("text")
      .select(Fns.tokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
  }

  private def shinglesOf(text: String, k: Int): Seq[String] = {
    Seq(text).toDF("text")
      .select(Fns.wordShingles(col("text"), k).as("s"))
      .collect()(0).getSeq[String](0)
  }

  test("tokens of empty / whitespace-only text is empty") {
    assert(tokensOf("").isEmpty)
    assert(tokensOf("   \t \n ").isEmpty)
  }

  test("tokens splits on arbitrary whitespace runs") {
    assert(tokensOf(" a  b\tc \n d ") == Seq("a", "b", "c", "d"))
  }

  test("shingles collapse to whole trimmed text when fewer than k words") {
    assert(shinglesOf("one two", 4) == Seq("one two"))
    assert(shinglesOf("  solo  ", 3) == Seq("solo"))
  }

  test("shingle count is nWords - k + 1 when nWords >= k") {
    for (n <- 1 to 12; k <- 2 to 5) {
      val words = (1 to n).map(i => s"w$i")
      val sh = shinglesOf(words.mkString(" "), k)
      if (n >= k) {
        assert(sh.length == n - k + 1)
        assert(sh.head == words.take(k).mkString(" "))
        assert(sh.last == words.takeRight(k).mkString(" "))
      } else assert(sh == Seq(words.mkString(" ")))
    }
  }

  test("hash32 is within [0, 2^32) and deterministic") {
    val texts = Seq("", "a", "hello world", "é中文")
    val got = texts.toDF("t").select(Fns.hash32(col("t")).as("h"))
      .collect().map(_.getLong(0))
    got.foreach(h => assert(h >= 0L && h < (1L << 32)))
    val again = texts.toDF("t").select(Fns.hash32(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(again))
  }

  test("roundP rounds the exact binary double (not its shortest decimal print)") {
    // 4.725 as a double is 4.72499999...: exact-binary half-up gives 4.72.
    // (Spark's round() would print-then-round to 4.73 — the divergence
    // roundP exists to avoid; DuckDB agrees with 4.72.)
    val vals = Seq((4.725, 2, 4.72), (0.12344, 4, 0.1234), (1.0, 2, 1.0))
    vals.foreach { case (x, n, want) =>
      val got = Seq(x).toDF("x").select(Fns.roundP(col("x"), n)).collect()(0).getDouble(0)
      assert(math.abs(got - want) < 1e-9, s"roundP($x, $n) = $got, want $want")
    }
  }

  test("dist2/dotp codegen expressions match scala math") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 20).map { _ =>
      (List.fill(8)(rnd.nextDouble() * 20 - 10), List.fill(8)(rnd.nextDouble() * 20 - 10))
    }
    cases.toDF("a", "b")
      .select(col("a"), col("b"),
        VectorExprs.dotp(col("a"), col("b")).as("dot"),
        VectorExprs.dist2(col("a"), col("b")).as("d2"))
      .collect()
      .foreach { row =>
        val a = row.getSeq[Double](0)
        val b = row.getSeq[Double](1)
        val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
        val d2 = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
        assert(row.getDouble(2) == dot)
        assert(row.getDouble(3) == d2)
      }
  }
}
