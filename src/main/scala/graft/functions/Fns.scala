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

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** k-word shingles joined by single space; texts with < k words collapse
    * to one whole-text shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val w = tokens(text)
    when(size(w) >= k,
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", slice(w, i, lit(k)))))
      .otherwise(array(trim(text)))
  }

  /** Dot product of two equal-length double arrays. Left-to-right fold, so
    * the summation order is fixed and reproducible. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity between two array&lt;double&gt; columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
