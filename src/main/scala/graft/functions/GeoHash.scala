package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E14 — geohash encode, precision `P` chars (reference
  * /root/reference/src/Type/Hash.cpp:18-90; standard base32 geohash).
  *
  * Formulated as quantize-and-interleave (equivalent to the reference's
  * bisection loop): lon → 15-bit cell, lat → 15-bit cell, bits interleaved
  * lon-first into 30 bits, emitted as 6 base32 chars. Pure integer column
  * algebra — codegen'd, zero shuffle, and the same closed-form expression
  * is emitted as DuckDB SQL so the operator is oracle-checkable (the
  * reference's loop form would need a recursive CTE).
  */
object GeoHash {
  val P = 6 // chars
  private val BITS = P * 5 / 2 // 15 bits per axis for even P
  val ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 15-bit quantized cell of a coordinate within [-range, range). */
  private def quant(c: Column, range: Double): Column =
    least(lit((1 << BITS) - 1),
      floor((c + lit(range)) / lit(2 * range) * lit(1 << BITS)).cast("long"))

  def encode(lon: Column, lat: Column): Column = {
    val lonQ = quant(lon, 180.0)
    val latQ = quant(lat, 90.0)
    // interleave: bit i (from msb) of lon lands at 29-2i, of lat at 28-2i
    val interleaved = (0 until BITS).map { i =>
      val lonBit = shiftright(lonQ, BITS - 1 - i).bitwiseAND(lit(1L))
      val latBit = shiftright(latQ, BITS - 1 - i).bitwiseAND(lit(1L))
      shiftleft(lonBit, 2 * BITS - 1 - 2 * i) + shiftleft(latBit, 2 * BITS - 2 - 2 * i)
    }.reduce(_ + _)
    concat((0 until P).map { j =>
      lit(ALPHABET).substr(
        (shiftright(interleaved, 5 * (P - 1 - j)).bitwiseAND(lit(31L)) + 1).cast("int"),
        lit(1))
    }: _*)
  }

  /** DuckDB twin of [[encode]] over SQL expressions for lon/lat. */
  def encodeSql(lon: String, lat: String): String = {
    val lonQ = s"least(${(1 << BITS) - 1}, CAST(floor((($lon) + 180.0) / 360.0 * ${1 << BITS}) AS BIGINT))"
    val latQ = s"least(${(1 << BITS) - 1}, CAST(floor((($lat) + 90.0) / 180.0 * ${1 << BITS}) AS BIGINT))"
    val interleaved = (0 until BITS).map { i =>
      s"((($lonQ >> ${BITS - 1 - i}) & 1) << ${2 * BITS - 1 - 2 * i}) + " +
        s"((($latQ >> ${BITS - 1 - i}) & 1) << ${2 * BITS - 2 - 2 * i})"
    }.mkString(" + ")
    val chars = (0 until P).map { j =>
      s"substring('$ALPHABET', CAST((((($interleaved)) >> ${5 * (P - 1 - j)}) & 31) AS INT) + 1, 1)"
    }
    chars.mkString(" || ")
  }
}
