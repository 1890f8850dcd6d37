package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation chain — exact dedup, quality gate,
  * repetition cap, PII redaction, deterministic sampling — composed as ONE
  * declarative plan, the way a production training-data pipeline stages it.
  *
  * Scale shape: exactly one shuffle in the whole chain (the 64-bit
  * fingerprint window for canonical-member election); the quality gate,
  * repetition cap, redaction and sampling are all scan-level
  * projections/predicates that run at codegen speed and compose into the
  * same stage. Filters ahead of the shuffle are pushed below it by
  * Catalyst where legal; everything behind it pipelines.
  */
object Curate {

  /** Curated corpus: canonical members (min id per content fingerprint)
    * that pass the quality gate and the within-doc repetition cap, PII
    * redacted, deterministically sampled at `samplePermille` under `salt`.
    * Adds `repetition_x1000`, `redacted`, `n_red` to the surviving rows. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      maxRepetitionPermille: Int = 300, samplePermille: Int = 1000,
      salt: String = "cur", shingleK: Int = 3): DataFrame = {
    val byFp = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
    val deduped = docs
      .withColumn("__keep_id", min(col(idCol)).over(byFp))
      .where(col("__keep_id") === col(idCol)).drop("__keep_id")
    val qualified = deduped.where(TextAnalysis.qualityKeep(col(textCol)))
    val unrepetitive = TextAnalysis.withRepetition(qualified, textCol, shingleK)
      .where(col("repetition_x1000") <= maxRepetitionPermille)
    val redacted = unrepetitive
      .withColumn("redacted", TextAnalysis.redactPii(col(textCol)))
      .withColumn("n_red", TextAnalysis.redactionCount(col(textCol)))
    Sampling.sample(redacted, idCol, samplePermille, salt)
  }
}
