package graft.ml

import org.apache.spark.sql.DataFrame

/** Societal metric selector for antidote optimization (paper §3, Alg. 1
  * targets exactly one of these per run). */
sealed trait Metric

object Metric {

  /** Mean over items of the across-user variance of predictions. */
  case object Polarization extends Metric

  /** Variance across users of the per-user squared-error loss ℓ_u. */
  case object IndividualUnfairness extends Metric

  /** |mean ℓ_u in group A − mean ℓ_u in group B|; `groups` maps
    * user_id → a `grp` label (users absent or in other groups get zero
    * gradient weight but still contribute to the per-item normal
    * equations). */
  final case class GroupUnfairness(groups: DataFrame, a: String, b: String)
    extends Metric
}
