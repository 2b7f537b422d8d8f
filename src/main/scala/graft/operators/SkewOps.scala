package graft.operators

import graft.functions.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY §4 / the brief's "salting for
  * skew" bullet). AQE's skew-join split handles most runtime skew; these
  * are the explicit forms for the two cases it does not:
  *
  *  - a HOT-KEY JOIN where neither side broadcasts: salt the fact side
  *    deterministically, replicate the dim side across every salt, join on
  *    (key, salt) — the hot key's rows spread over `salts` reducers.
  *  - a HOT-KEY holistic aggregation (collect_list/collect_set), where
  *    map-side partial aggregation cannot shrink the shuffle: aggregate
  *    per (key, salt) first, then merge the per-salt results.
  *
  * Both forms are pure column algebra over deterministic salts (hash of a
  * caller-named unique column, never rand()) — rerunning the plan yields
  * byte-identical results, keeping them oracle-checkable.
  */
object SkewOps {

  /** Deterministic salt in [0, salts) from a unique row column. */
  private def saltOf(rowKey: Column, salts: Int): Column =
    pmod(Fns.hash32(rowKey.cast("string")), lit(salts))

  /** Internal salt column name guaranteed absent from every input —
    * a fixed name would silently overwrite (then drop) caller data. */
  private def freshSaltCol(inputs: DataFrame*): String = {
    val taken = inputs.flatMap(_.columns).toSet
    Iterator.from(0).map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(!taken.contains(_)).get
  }

  /** Inner-join `fact` to `dim` on `key`, spreading each fact key over
    * `salts` partitions: fact rows get a salt hashed from `factRowKey`
    * (any unique column), dim rows are replicated once per salt value, and
    * the join key becomes (key, salt). Row multiplicity is identical to
    * the plain join — dim replication only widens the build side by
    * `salts`, it never duplicates matches. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factRowKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val sc = freshSaltCol(fact, dim)
    val saltedFact = fact.withColumn(sc, saltOf(col(factRowKey), salts))
    val saltedDim = dim.withColumn(sc,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact.join(saltedDim, Seq(key, sc)).drop(sc)
  }

  /** Two-phase collect_list for a skewed group key: phase 1 collects per
    * (key, salt) — the hot key's values land on `salts` different reducers
    * — phase 2 flattens the per-salt lists and sorts for a deterministic
    * result. Equivalent to groupBy(key).agg(sort_array(collect_list)). */
  def saltedCollect(df: DataFrame, key: String, valueCol: String,
                    rowKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive (got $salts)")
    val sc = freshSaltCol(df)
    df.withColumn(sc, saltOf(col(rowKey), salts))
      .groupBy(col(key), col(sc))
      .agg(collect_list(col(valueCol)).as("_part"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("_part")))).as(s"${valueCol}_list"))
  }
}
