package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders used across the operator library.
  *
  * Hashing convention: `hash32(s)` = first 32 bits of md5 as an unsigned
  * long. md5 is available identically in Spark and DuckDB, which makes
  * minhash / simhash / fingerprint pipelines *oracle-checkable* — the same
  * signature math can be expressed in the driver's DuckDB SQL.
  * (Spark's `hash`/`xxhash64` have no DuckDB twin, so they are only used
  * where no oracle is needed.)
  */
object Fns {

  /** First 8 hex chars of md5(s) as a long in [0, 2^32). Codegen-friendly:
    * conv/substring/md5 are all built-in codegen expressions. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Full whitespace trim. Spark's `trim` strips only 0x20 spaces, so a
    * text like "\t\n" would survive it and then split into ["", ""] —
    * regexp-trim both ends instead. */
  def wsTrim(text: Column): Column =
    regexp_replace(text, "^\\s+|\\s+$", "")

  /** Whitespace tokens; whitespace-only or empty text → empty array. */
  def tokens(text: Column): Column = {
    val t = wsTrim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** k-word shingles joined by single space; texts with < k words collapse
    * to one whole-text shingle.
    *
    * PERFORMANCE: pass a *materialized attribute* (a column produced by a
    * prior `select`) as `toks`, not a raw expression — the `slice` inside the
    * lambda evaluates its child once per shingle index, so an inline
    * `split(...)` subtree here turns one split per row into one split per
    * shingle (O(L²) regex work; measured 5× slowdown on the documents table).
    */
  def shinglesOfTokens(toks: Column, text: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(wsTrim(text)))

  /** One-shot convenience form of [[shinglesOfTokens]]; only for small
    * inputs/tests — see the performance note above. */
  def wordShingles(text: Column, k: Int): Column =
    shinglesOfTokens(tokens(text), text, k)

  /** Oracle-portable round-half-up for non-negative doubles:
    * floor(x*10^n + 0.5)/10^n. Spark's `round` on doubles detours through
    * Double.toString (BigDecimal.valueOf), so e.g. 189/40 = 4.7249999...996
    * prints "4.725" and rounds UP to 4.73, while DuckDB rounds the exact
    * binary value DOWN to 4.72. floor arithmetic on the identical input
    * double gives the identical answer in both engines.
    *
    * On NEGATIVE inputs the formula still rounds halfway cases toward
    * +inf (−1.5e-6 → −1e-6, i.e. toward zero magnitude), NOT
    * half-away-from-zero. Every oracle-gated caller feeds non-negative
    * values; the one negative-domain caller ([[graft.gql.Hmm]]'s
    * ln-probabilities — a GQL surface with no oracle twin) uses the
    * half-toward-+inf behavior DELIBERATELY, with InferenceSpec
    * mirroring the identical formula. */
  def roundP(c: Column, n: Int): Column = {
    val p = math.pow(10.0, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The DuckDB-side twin of [[roundP]] for oracle SQL strings. */
  def roundPSql(expr: String, n: Int): String = {
    val p = math.pow(10.0, n).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }

  /** Dot product of two equal-length double arrays. Left-to-right fold, so
    * the summation order is fixed and reproducible. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity between two array&lt;double&gt; columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
