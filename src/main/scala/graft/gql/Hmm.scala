package graft.gql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

import Ast._

/** E10 inference evaluation — Viterbi decoding over the declared
  * hidden-variable chain (README §4.6). The reference DECLARES this
  * surface and implements none of it (`src/Graph/DecisionNetwork.cpp`
  * 0 LoC, empty test bodies, no grammar rule), so the executable
  * semantics are defined HERE and pinned by InferenceSpec:
  *
  *  - hidden states: the distinct `hidden_variant.*` identifiers, in arc
  *    declaration order;
  *  - observations: the `event:` list in order; an arc ending in an event
  *    label is an emission weight P(obs | state), an arc ending in another
  *    hidden state a transition weight P(to | from);
  *  - the start distribution is uniform over the declared states;
  *    undeclared arcs weigh 0 (ln → −∞, so impossible paths prune);
  *  - `gassian(mu, sigma)` evaluates as the normal density at the
  *    observation when it is numeric, at the mode (1/(σ√2π)) for symbolic
  *    observations;
  *  - output: one row per step of the Viterbi-decoded best path with the
  *    running best ln-probability (ln space so long chains cannot
  *    underflow); argmax ties break toward the earlier-declared state.
  *
  * The chain is declaration-sized (states × events), so evaluation is
  * driver-side — the statement declares a model, it does not scan data.
  */
object Hmm {
  private val HV = "hidden_variant."

  private def density(w: InfWeight, v: GVal): Double = w match {
    case WNum(x) => x
    case WGauss(mu, sigma) =>
      val x = v match {
        case GNum(d) => Some(d)
        case GInt(i) => Some(i.toDouble)
        case _       => None
      }
      x match {
        case Some(d) =>
          math.exp(-(d - mu) * (d - mu) / (2 * sigma * sigma)) /
            (sigma * math.sqrt(2 * math.Pi))
        case None => 1.0 / (sigma * math.sqrt(2 * math.Pi)) // mode
      }
  }

  def run(spark: SparkSession, inf: Inference): DataFrame = {
    val states: Seq[String] = inf.arcs.flatMap(a => Seq(a.from, a.to))
      .filter(_.startsWith(HV)).map(_.stripPrefix(HV)).distinct
    require(states.nonEmpty, "inference: no hidden_variant.* states declared")
    val obs = inf.events
    val emis: Map[(String, String), InfWeight] = inf.arcs.collect {
      case InfArc(f, w, t) if f.startsWith(HV) && !t.startsWith(HV) =>
        (f.stripPrefix(HV), t) -> w
    }.toMap
    val trans: Map[(String, String), InfWeight] = inf.arcs.collect {
      case InfArc(f, w, t) if f.startsWith(HV) && t.startsWith(HV) =>
        (f.stripPrefix(HV), t.stripPrefix(HV)) -> w
    }.toMap
    def ln(x: Double): Double =
      if (x > 0) math.log(x) else Double.NegativeInfinity

    val n = states.length
    val T = obs.length
    val delta = Array.ofDim[Double](T, n)
    val back = Array.ofDim[Int](T, n)
    def e(t: Int, j: Int): Double =
      emis.get((states(j), obs(t)._1)).map(w => density(w, obs(t)._2)).getOrElse(0.0)
    for (j <- 0 until n)
      delta(0)(j) = ln(1.0 / n) + ln(e(0, j))
    for (t <- 1 until T; j <- 0 until n) {
      var bi = 0
      var bv = Double.NegativeInfinity
      for (i <- 0 until n) {
        val tw = trans.get((states(i), states(j)))
          .map(w => density(w, GStr(""))).getOrElse(0.0)
        val cand = delta(t - 1)(i) + ln(tw)
        if (cand > bv) { bv = cand; bi = i } // strict >: earliest state wins ties
      }
      delta(t)(j) = bv + ln(e(t, j))
      back(t)(j) = bi
    }
    var bj = 0
    var bv = Double.NegativeInfinity
    for (j <- 0 until n) if (delta(T - 1)(j) > bv) { bv = delta(T - 1)(j); bj = j }
    val path = new Array[Int](T)
    path(T - 1) = bj
    for (t <- T - 1 to 1 by -1) path(t - 1) = back(t)(path(t))

    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def show(v: GVal): String = v match {
      case GStr(s) => s
      case GInt(i) => i.toString
      case GNum(d) => d.toString
      case other   => other.toString
    }
    (0 until T).map { t =>
      (t + 1, obs(t)._1, show(obs(t)._2), states(path(t)), delta(t)(path(t)))
    }.toDF("step", "event", "observation", "state", "lp")
      .select(col("step"), col("event"), col("observation"), col("state"),
        // roundP over NEGATIVE ln-probabilities is half-toward-+inf at
        // exact halfway points (documented on Fns.roundP) — deliberate:
        // this GQL surface has no DuckDB twin and InferenceSpec mirrors
        // the identical formula, so the contract is pinned, not assumed
        graft.functions.Fns.roundP(col("lp"), 6).as("ln_prob"))
      .orderBy("step")
  }
}
