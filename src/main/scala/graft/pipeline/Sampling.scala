package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-corpus construction.
  *
  * Decisions are a pure function of (salt, id) — a portable integer hash,
  * not an RNG: the sample is reproducible across runs, engines and
  * repartitionings, a row's fate never depends on which partition scans it,
  * and the filter is a codegen'd scan-level predicate (no shuffle, no
  * state). Disjoint salts give independent samples; the same salt gives
  * nested samples (rate 100 ⊂ rate 500), which is what makes held-out
  * splits and progressive subsets consistent at 100 TB.
  */
object Sampling {

  /** Per-row sample coordinate in [0, 1000): portable 31-bit char fold of
    * `"salt:id"` (Dedup.arithHash31 — any SQL engine recomputes it). */
  def samplePermille(id: Column, salt: String): Column =
    Dedup.arithHash31(concat(lit(salt), lit(":"), id.cast("string"))) % 1000

  /** Uniform deterministic sample: keep rows whose coordinate falls below
    * `permille`. */
  def sample(df: DataFrame, idCol: String, permille: Int,
      salt: String = "s"): DataFrame =
    df.where(samplePermille(col(idCol), salt) < permille)

  /** Stratified deterministic sample: per-stratum keep rates (the training
    * mix — up/down-weight sources), `defaultPermille` for unlisted strata.
    * The rate lookup folds to a literal CASE chain, so the whole decision
    * stays a scan-level predicate. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPermille: Int,
      salt: String = "s"): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.where(samplePermille(col(idCol), salt) < rate)
  }
}
