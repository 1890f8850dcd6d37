package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation chain — exact dedup, quality gate,
  * repetition cap, PII redaction, deterministic sampling — composed as ONE
  * declarative plan, the way a production training-data pipeline stages it.
  *
  * Scale shape: two keyed exchanges — the fingerprint window for
  * canonical-member election and the id-keyed repetition aggregate+join
  * (the join-back form exists precisely because gating on the scan-local
  * repetition column re-inlines its lambda chain through predicate
  * pushdown; see TextAnalysis.withRepetition). The quality gate,
  * redaction and sampling are scan-level projections/predicates that run
  * at codegen speed and pipeline between the exchanges.
  */
object Curate {

  /** Curated corpus: canonical members (min id per content fingerprint)
    * that pass the quality gate (and, when a model is supplied, the
    * hashed-linear classifier gate — heuristics first, model second, the
    * standard pipeline order) and the within-doc repetition cap, PII
    * redacted, deterministically sampled at `samplePermille` under `salt`.
    * Adds `repetition_x1000`, `redacted`, `n_red` to the surviving rows.
    *
    * `classifier` = (weights, margin threshold). The gate is a direct
    * scan predicate: unlike the repetition column it references the token
    * array only twice (score + count), so pushdown costs a second split —
    * linear, not the quadratic alias re-inlining repetitionByDoc avoids. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      maxRepetitionPermille: Int = 300, samplePermille: Int = 1000,
      salt: String = "cur", shingleK: Int = 3,
      classifier: Option[(Seq[Int], Long)] = None): DataFrame =
    stages(docs, idCol, textCol, maxRepetitionPermille, samplePermille,
      salt, shingleK, classifier).last._2

  /** The chain's stage boundaries, in order: (stage name, rows surviving
    * through that stage). The last element is [[curate]]'s result. Shared
    * by the chain and the attrition report so the two can never drift. */
  def stages(docs: DataFrame, idCol: String, textCol: String,
      maxRepetitionPermille: Int = 300, samplePermille: Int = 1000,
      salt: String = "cur", shingleK: Int = 3,
      classifier: Option[(Seq[Int], Long)] = None): Seq[(String, DataFrame)] = {
    val byFp = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
    val deduped = docs
      .withColumn("__keep_id", min(col(idCol)).over(byFp))
      .where(col("__keep_id") === col(idCol)).drop("__keep_id")
    val heurGated = deduped.where(TextAnalysis.qualityKeep(col(textCol)))
    val qualified = classifier match {
      case Some((w, thr)) =>
        heurGated.where(TextAnalysis.classifierKeep(col(textCol), w, thr))
      case None => heurGated
    }
    // gate on the AGGREGATE repetition form: filtering on the scan-local
    // column re-inlines its lambda chain through predicate pushdown
    // (quadratic split-per-lambda, measured 8× — see TextAnalysis caution)
    val rep = TextAnalysis.repetitionByDoc(qualified, idCol, textCol, shingleK)
      .where(col("repetition_x1000") <= maxRepetitionPermille)
    val unrepetitive = qualified.join(rep, col(idCol) === rep("id"))
      .drop("id")
    val redacted = unrepetitive
      .withColumn("redacted", TextAnalysis.redactPii(col(textCol)))
      .withColumn("n_red", TextAnalysis.redactionCount(col(textCol)))
    Seq("input" -> docs, "deduped" -> deduped, "quality" -> heurGated) ++
      classifier.map(_ => "classifier" -> qualified).toSeq ++
      Seq("repetition" -> unrepetitive,
        "sampled" -> Sampling.sample(redacted, idCol, samplePermille, salt))
  }

  /** Pipeline observability: per-stage survivor counts of the chain —
    * (stage_idx, stage, n_docs), one row per stage in chain order. The
    * attrition curve is what a pipeline operator actually watches (a gate
    * suddenly eating 90% of the corpus is the classic silent data bug).
    * Each stage count recomputes its prefix at test scale; a production
    * run caches the chain once and counts off the cache. */
  def attrition(docs: DataFrame, idCol: String, textCol: String,
      maxRepetitionPermille: Int = 300, samplePermille: Int = 1000,
      salt: String = "cur", shingleK: Int = 3,
      classifier: Option[(Seq[Int], Long)] = None): DataFrame =
    stages(docs, idCol, textCol, maxRepetitionPermille, samplePermille,
      salt, shingleK, classifier)
      .zipWithIndex.map { case ((name, df), i) =>
        df.groupBy().agg(count(lit(1)).cast("long").as("n_docs"))
          .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"))
      }.reduce(_.unionByName(_))
}
