package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline over the `documents` fixture — the
  * library's user story in one main, every stage a first-class operator
  * with its own oracle elsewhere:
  *
  *   raw docs → markup strip → corpus line dedup → repeated-span removal
  *   → clusters materialized once (size audit + keepBest election from
  *   ONE resolution) → curation chain (fingerprint dedup, quality gate,
  *   classifier gate, repetition cap, PII redaction, sampling) → CCNet
  *   per-language perplexity-third cut → token-budget mix → sequence
  *   packing + chunk manifest, plus the no-split bin layout and an
  *   in-engine perceptron-trained language gate report
  *
  * Prints one JSON line of per-stage row/token counts and writes the
  * packed manifest to the output dir. Usage:
  *   runMain graft.tools.PipelineDemo [sfDir] [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString)
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline._

    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val n0 = raw.count()

    // 1. markup strip (scan-level)
    val stripped = raw.withColumn("text",
      TextAnalysis.strippedText(col("text")))

    // 2. corpus-level line dedup; keep docs that retain any content
    val lineDeduped = TextAnalysis.lineDedup(stripped, "doc_id", "text")
      .where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("kept_text").as("text"))
      .join(raw.select(col("doc_id"), col("source")), Seq("doc_id"))
    val n1 = lineDeduped.count()

    // 2a. exact-substring span removal (round 16): excise corpus-repeated
    // passages, keep the novel remainder — doc-level dedup downstream
    // then judges the cleaned text, not the shared boilerplate
    val spanCleaned = Dedup.removeRepeatedSpans(
      lineDeduped, "doc_id", "text", k = 5)
      .where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("cleaned_text").as("text"))
      .join(raw.select(col("doc_id"), col("source")), Seq("doc_id"))
    val nSpan = spanCleaned.count()

    // 2b. clusters-materialized: the composition pattern for cluster
    // consumers at corpus scale — run the expensive chain (shingle
    // self-join + label propagation) ONCE, materialize, and fan the
    // consumers out from the materialized frame. The bench queries
    // deliberately re-run the chain per query (self-contained oracles);
    // a production pipeline does THIS instead.
    val pairs = Dedup.ngramJaccard(spanCleaned, "doc_id", "text", 3)
      .where(col("inter") * 10 >= col("union_n") * 6)
    val clusters = Dedup.duplicateClusters(pairs)
      .localCheckpoint() // one evaluation serves both consumers below
    val sizeHist = Dedup.clusterSizeHistogram(clusters).collect()
      .map(r => s""""${r.getLong(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
    val scored = spanCleaned.withColumn("len", length(col("text")))
    val reps = Dedup.keepBestFromClusters(scored, "doc_id", "len", clusters)
    val nReps = reps.count()

    // 2c. provenance audit (round 16): cross-source duplicate overlap —
    // the report a mix designer reads BEFORE setting per-source budgets
    // (a source that is mostly another source's content shouldn't get
    // independent weight)
    val xsrc = Dedup.crossSourceOverlap(spanCleaned, "text", "source")
      .agg(count(lit(1)), coalesce(max(col("overlap_x1000")), lit(0L)))
      .collect()(0)
    val (nXPairs, xMax) = (xsrc.getLong(0), xsrc.getLong(1))

    // 2d. compressibility screen (round 16): char-4-gram distinct
    // permille; the sub-300 count is the "would be dropped as
    // machine-repetitive" report next to the word-level gates below
    val nRepetitive = spanCleaned.select(
      TextAnalysis.compressibilitySignals(col("text"))
        .toMap.apply("distinct_x1000").as("cx"))
      .where(col("cx") < 300).count()

    // 3. curation chain (dedup, quality, classifier, repetition, PII, sample)
    val w = (0 until 64).map(b => (b * 37 + 11) % 7)
    val curated = Curate.curate(spanCleaned, "doc_id", "text",
      classifier = Some((w, 2000L)), samplePermille = 900)
      .localCheckpoint() // chain reused by three consumers below
    val n2 = curated.count()

    // 4. statistical tail cut, CCNet-faithful (round 16): per-LANGUAGE
    // perplexity thirds over the corpus-trained bigram LM; the tail
    // third of each language drops (exact histogram cuts — no approx
    // percentile, no NULL corner: every doc gets a bucket)
    val withLang = curated.join(raw.select(col("doc_id"), col("lang")),
      Seq("doc_id"))
    val buckets = TextAnalysis.ccnetBuckets(withLang, "doc_id", "text", "lang")
    val kept = curated.join(
      buckets.where(col("bucket") =!= "tail").select(col("id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val n3 = kept.count()

    // 5. token-budget mixture across sources, then 6. pack + manifest
    val withTokens = kept.withColumn("n_tok",
      TextAnalysis.tokenCount(col("text")))
    val mixed = Sampling.tokenBudgetMix(withTokens, "doc_id", "source",
      "n_tok", budgetPerStratum = 20000L)
    val n4 = mixed.count()
    val packed = Packing.packSequences(mixed, "doc_id", "text", seqLen = 512)
    val manifest = Packing.chunkManifest(packed, seqLen = 512)
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    val nSeq = spark.read.parquet(s"$outDir/manifest").count()

    // 6b. document-preserving alternative layout (round 16): whole docs
    // into 512-capacity bins, bounded overflow instead of truncation —
    // report the bin count and how many bins run past nominal capacity
    val bins = Packing.binFill(
      Packing.packDocsNoSplit(mixed, "doc_id", "text", binCapacity = 512),
      binCapacity = 512)
      .agg(count(lit(1)), sum(when(col("overflow"), 1L).otherwise(0L)))
      .collect()(0)
    val (nBins, nOver) = (bins.getLong(0), bins.getLong(1))

    // 6c. in-engine trained language gate (round 16): batch perceptron on
    // the shipped mix's own language labels — the report shows the
    // trained separation (epoch error counts falling)
    val pTraj = TextAnalysis.perceptronTrain(
      mixed.join(raw.select(col("doc_id"), col("lang")), Seq("doc_id")),
      "doc_id", "text", col("lang") === "en", dim = 64, epochs = 3)
    val pErrs = pTraj.map(_._3).mkString("[", ",", "]")

    // 7. held-out split over the mixed corpus (round 12): growth-stable
    // permille bands of the hash coordinate — the labels survive corpus
    // regrowth, so val/test stay clean across pipeline re-runs
    val splitCounts = Sampling.assignSplit(mixed, "doc_id",
      Seq("train" -> 900, "val" -> 50, "test" -> 50), salt = "demo")
      .groupBy(col("split")).count().collect()
      .map(r => (if (r.isNullAt(0)) "null" else r.getString(0)) -> r.getLong(1))
      .sortBy(_._1)
    val splitJson = splitCounts
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

    // 8. release audit (round 12): the data card over the shipped mix —
    // the rollup a dataset release publishes next to the manifest
    val card = Curate.datacard(
      mixed.join(raw.select(col("doc_id"), col("lang")), Seq("doc_id")),
      "text")
    card.write.mode("overwrite").parquet(s"$outDir/datacard")
    val nCardGroups = spark.read.parquet(s"$outDir/datacard").count()

    println(s"""{"stage_counts":{"raw":$n0,"line_deduped":$n1,""" +
      s""""span_cleaned":$nSpan,"curated":$n2,"ccnet_kept":$n3,"mixed":$n4},""" +
      s""""xsource_pairs":$nXPairs,"xsource_max_permille":$xMax,""" +
      s""""repetitive_docs":$nRepetitive,""" +
      s""""packed_sequences":$nSeq,"nosplit_bins":$nBins,"overflow_bins":$nOver,""" +
      s""""perceptron_epoch_errors":$pErrs,""" +
      s""""cluster_size_hist":$sizeHist,"keepbest_rows":$nReps,""" +
      s""""splits":$splitJson,"datacard_groups":$nCardGroups,"out":"$outDir"}""")
    spark.stop()
  }
}
