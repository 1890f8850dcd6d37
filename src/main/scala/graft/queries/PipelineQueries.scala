package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators over `documents`/`embeddings`:
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine), ANN similarity search, text analysis, multimodal plumbing, and
  * whois-style enrichment. Hash-checkable ops carry DuckDB oracles; the
  * LSH/float ops are rows-only here and pinned by ScalaTest recall checks
  * against their exact counterparts (PipelineSpec).
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- dedup ----------------------------------------------------------
    "q_dedup_exact" -> ((s, dir) => {
      val fp = TextAnalysis.fingerprint(col("text"))
      docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(fp).cast("long").as("n_unique"))
        .orderBy(col("source"))
    }),
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
      Dedup.ngramJaccard(d, "doc_id", "text", 3)
        .where(col("inter") * 10 >= col("union_n") * 6)
        .orderBy(col("a"), col("b"))
    }),
    "q_dedup_minhash" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
      Dedup.minhashCandidates(d, "doc_id", "text").orderBy(col("a"), col("b"))
    }),
    "q_dedup_simhash" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
      Dedup.simhashCandidates(d, "doc_id", "text", k = 3, maxHamming = 8)
        .orderBy(col("a"), col("b"))
    }),
    "q_dedup_cosine" -> ((s, dir) =>
      // label works as the blocking stage: only same-label pairs scored
      Dedup.cosineNearDup(emb(s, dir), "vec_id", "embedding", 0.93,
        blockCol = Some("label"))
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))),

    // --- similarity search ---------------------------------------------
    "q_sim_bruteforce" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id").isin(0L, 17L, 42L))
      Similarity.bruteForceTopK(e, probes, "vec_id", "embedding", 10)
        .select(col("probe_id"), col("id"), col("rank"))
        .orderBy(col("probe_id"), col("rank"))
    }),
    "q_sim_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id").isin(0L, 17L, 42L))
      Similarity.lshTopK(e, probes, "vec_id", "embedding", 10)
        .select(col("probe_id"), col("id"), col("rank"))
        .orderBy(col("probe_id"), col("rank"))
    }),

    // --- text analysis --------------------------------------------------
    "q_text_langid" -> ((s, dir) =>
      docs(s, dir).groupBy(TextAnalysis.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("lang_pred"))),
    "q_text_quality" -> ((s, dir) => {
      val m = TextAnalysis.qualityMetrics(col("text"))
      val sel = col("source") +: m.map { case (n, c) => c.as(n) } :+
        TextAnalysis.qualityKeep(col("text")).as("keep")
      docs(s, dir).select(sel: _*)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"),
          sum(col("n_words")).cast("long").as("total_words"),
          sum(col("mean_word_len_x1000")).cast("long").as("sum_mwl"),
          sum(col("alpha_x1000")).cast("long").as("sum_alpha"))
        .orderBy(col("source"))
    }),
    "q_text_tokens" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("total_tokens"),
          sum(TextAnalysis.wordCount(col("text"))).cast("long").as("total_words"))
        .orderBy(col("lang"))),

    // --- multimodal -----------------------------------------------------
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.blobsFromDocuments(docs(s, dir))
        .groupBy(col("modality"))
        .agg(count(lit(1)).cast("long").as("n_assets"),
          sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
          countDistinct(md5(col("payload"))).cast("long").as("n_distinct_payloads"),
          min(col("meta.width")).cast("long").as("min_width"),
          max(col("meta.duration_ms")).cast("long").as("max_duration_ms"))
        .orderBy(col("modality"))),
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.decodeStub(Multimodal.blobsFromDocuments(docs(s, dir)))
        .groupBy(col("modality"))
        .agg(count(lit(1)).cast("long").as("n_assets"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          sum(size(filter(col("feature"), f => f > 0))).cast("long").as("nonzero_dims"))
        .orderBy(col("modality"))),

    // --- enrichment (E1-E3 cache-table pattern) -------------------------
    "q_whois_enrich" -> ((s, dir) =>
      graft.enrich.Whois.enrichOriginAs(
        graft.sources.RouteEventGen.routeEvents(s, dir))
        .groupBy(col("whois_org"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          countDistinct(col("prefix_str")).cast("long").as("n_prefixes"))
        .orderBy(col("whois_org"))))

  private val docNorm = "regexp_replace(trim(text), '\\s+', ' ', 'g')"

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT lower($docNorm)) AS n_unique
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split($docNorm, ' ') AS words FROM documents
         |), sh0 AS (
         |  SELECT doc_id, words, unnest(range(1, len(words)-1)) AS i
         |  FROM d WHERE len(words) >= 3
         |), sh AS (
         |  SELECT DISTINCT doc_id, words[i]||' '||words[i+1]||' '||words[i+2] AS s
         |  FROM sh0
         |  UNION
         |  SELECT DISTINCT doc_id, array_to_string(words, ' ') AS s
         |  FROM d WHERE len(words) < 3
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
         |), pairs AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS inter
         |  FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT a, b, CAST(inter AS BIGINT) AS inter,
         |  CAST(sa.n + sb.n - inter AS BIGINT) AS union_n
         |FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |WHERE inter*10 >= (sa.n + sb.n - inter)*6
         |ORDER BY a, b""".stripMargin,
    "q_sim_bruteforce" ->
      """WITH v AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM v GROUP BY vec_id
        |), probes AS (SELECT * FROM v WHERE vec_id IN (0, 17, 42)),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS id,
        |    SUM(p.x * c.x) / (MAX(np.nrm) * MAX(nc.nrm)) AS cosine
        |  FROM probes p
        |  JOIN v c ON p.i = c.i AND c.vec_id <> p.vec_id
        |  JOIN norms np ON np.vec_id = p.vec_id
        |  JOIN norms nc ON nc.vec_id = c.vec_id
        |  GROUP BY 1, 2
        |)
        |SELECT probe_id, id, CAST(rnk AS BIGINT) AS rank FROM (
        |  SELECT probe_id, id,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, id) AS rnk
        |  FROM scored) t
        |WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin,
    "q_text_langid" ->
      """WITH s AS (
        |  SELECT
        |    len(regexp_extract_all(text,'\bthe\b'))+len(regexp_extract_all(text,'\band\b'))
        |      +len(regexp_extract_all(text,'\bof\b'))+len(regexp_extract_all(text,'\bto\b'))
        |      +len(regexp_extract_all(text,'\bin\b')) AS s_en,
        |    len(regexp_extract_all(text,'\bder\b'))+len(regexp_extract_all(text,'\bdie\b'))
        |      +len(regexp_extract_all(text,'\bund\b'))+len(regexp_extract_all(text,'\bdas\b'))
        |      +len(regexp_extract_all(text,'\bist\b')) AS s_de,
        |    len(regexp_extract_all(text,'\ble\b'))+len(regexp_extract_all(text,'\bla\b'))
        |      +len(regexp_extract_all(text,'\bet\b'))+len(regexp_extract_all(text,'\bles\b'))
        |      +len(regexp_extract_all(text,'\bdes\b')) AS s_fr,
        |    len(regexp_extract_all(text,'\bel\b'))+len(regexp_extract_all(text,'\bla\b'))
        |      +len(regexp_extract_all(text,'\blos\b'))+len(regexp_extract_all(text,'\bque\b'))
        |      +len(regexp_extract_all(text,'\bde\b')) AS s_es
        |  FROM documents
        |), p AS (
        |  SELECT CASE
        |    WHEN s_en=0 AND s_de=0 AND s_fr=0 AND s_es=0 THEN 'und'
        |    WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
        |    WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |    WHEN s_en >= s_de THEN 'en'
        |    ELSE 'de' END AS lang_pred
        |  FROM s
        |)
        |SELECT lang_pred, COUNT(*) AS n FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_quality" ->
      s"""WITH m AS (
         |  SELECT source,
         |    len(string_split($docNorm, ' ')) AS n_words,
         |    length(text) AS n_chars,
         |    len(regexp_extract_all(text, '[A-Za-z]')) AS alpha,
         |    len(regexp_extract_all(text,'\\bthe\\b'))+len(regexp_extract_all(text,'\\band\\b'))
         |      +len(regexp_extract_all(text,'\\bof\\b'))+len(regexp_extract_all(text,'\\bto\\b'))
         |      +len(regexp_extract_all(text,'\\bin\\b'))
         |      +len(regexp_extract_all(text,'\\bder\\b'))+len(regexp_extract_all(text,'\\bdie\\b'))
         |      +len(regexp_extract_all(text,'\\bund\\b'))+len(regexp_extract_all(text,'\\bdas\\b'))
         |      +len(regexp_extract_all(text,'\\bist\\b'))
         |      +len(regexp_extract_all(text,'\\ble\\b'))+len(regexp_extract_all(text,'\\bla\\b'))
         |      +len(regexp_extract_all(text,'\\bet\\b'))+len(regexp_extract_all(text,'\\bles\\b'))
         |      +len(regexp_extract_all(text,'\\bdes\\b'))
         |      +len(regexp_extract_all(text,'\\bel\\b'))+len(regexp_extract_all(text,'\\bla\\b'))
         |      +len(regexp_extract_all(text,'\\blos\\b'))+len(regexp_extract_all(text,'\\bque\\b'))
         |      +len(regexp_extract_all(text,'\\bde\\b')) AS stop
         |  FROM documents
         |), q AS (
         |  SELECT source, n_words,
         |    CAST(FLOOR(n_chars*1000.0/greatest(n_words,1)) AS BIGINT) AS mwl,
         |    CAST(FLOOR(stop*1000.0/greatest(n_words,1)) AS BIGINT) AS stopx,
         |    CAST(FLOOR(alpha*1000.0/greatest(n_chars,1)) AS BIGINT) AS alphax
         |  FROM m
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN n_words>=10 AND stopx>=20 AND alphax>=600 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(SUM(n_words) AS BIGINT) AS total_words,
         |  CAST(SUM(mwl) AS BIGINT) AS sum_mwl,
         |  CAST(SUM(alphax) AS BIGINT) AS sum_alpha
         |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_text_tokens" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_tokens,
         |  CAST(SUM(len(string_split($docNorm, ' '))) AS BIGINT) AS total_words
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT CASE doc_id%3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  COUNT(*) AS n_assets,
        |  CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
        |  CAST(MIN(CASE WHEN doc_id%3=0 THEN doc_id%640+64 END) AS BIGINT) AS min_width,
        |  CAST(MAX(CASE WHEN doc_id%3<>0 THEN doc_id%60000+1000 END) AS BIGINT) AS max_duration_ms
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_whois_enrich" -> (RibQueries.cte +
      """SELECT 'AS'||(CASE WHEN eid%2=1 THEN 65001 ELSE a2 END)
        |    ||'-ORG-'||((CASE WHEN eid%2=1 THEN 65001 ELSE a2 END)%2) AS whois_org,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT prefix_str) AS n_prefixes
        |FROM re GROUP BY 1 ORDER BY 1""".stripMargin))
}
