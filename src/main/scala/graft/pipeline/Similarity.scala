package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * probe set against the corpus, one pass, no shuffle of the corpus. Scale
  * path: random-hyperplane LSH — signatures are one narrow projection;
  * candidate generation shuffles only (bucket, id); exact re-rank touches
  * candidates only. At 100 TB the corpus never moves: probes broadcast,
  * buckets partition.
  */
object Similarity {

  private def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  // native codegen'd kernels (VecDotExpr) — bit-identical to the HOF fold
  // they replace, minus the per-row boxed-lambda interpretation
  private def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  private def norm(v: Column): Column = graft.functions.VecDot.norm(v)

  /** Brute-force cosine top-k: for each probe vector, the k nearest corpus
    * vectors (excluding the probe itself). `probes` must be small (it is
    * broadcast). Returns (probe_id, id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
      .withColumn("pn", norm(col("pv")))
    val scored = c.join(broadcast(p), col("id") =!= col("probe_id"))
      .withColumn("cosine", dot(col("v"), col("pv")) / (col("n") * col("pn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Symmetric per-vector int8 quantization — the storage/bandwidth lever
    * a 100 TB embedding corpus reaches for first: codes are 1/4 the bytes
    * of float32 (1/8 of the double working form), so every downstream
    * shuffle, broadcast and scan of the embedding column shrinks 4× while
    * similarity ordering survives to within the quantization step.
    *
    * scale = max|x| (0-vectors keep scale 0 and all-zero codes);
    * code_i = round(x_i·127/scale) ∈ [−127, 127]. Everything after the
    * division is integer-exact, and the division/round chain is the same
    * double arithmetic in any engine — which is what makes the codes
    * themselves (not a float digest of them) hash-comparable in the
    * DuckDB oracle. Returns (id, scale, q).
    *
    * Scale shape: a pure per-row projection — no shuffle, no aggregate,
    * scan-local at any corpus size. */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    // scale materialized in its own projection BEFORE the lambda uses it —
    // a bare alias inside a same-select lambda resolves laterally (the
    // plantedEmb dim-damping trap)
    emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .select(col("id"), col("scale"),
        transform(col("v"), x => when(col("scale") === 0.0d, lit(0))
          .otherwise(round(x * lit(127.0d) / col("scale")).cast("int")))
          .as("q"))

  /** Brute-force cosine top-k over int8-quantized vectors: the integer
    * dot Σ qa·qb is exact (|q| ≤ 127, so any realistic dim stays inside
    * double's 2^53 integer window via the codegen'd VecDot), and the
    * per-pair score (scale_a/127)·(scale_b/127)·dot recovers the
    * approximate cosine after norm division. Ordering matches exact
    * cosine to within quantization error (recall spec); ties break on id
    * like [[bruteForceTopK]]. The quantized corpus — codes + one double —
    * is what rides the broadcast/shuffle, the 4× win above. */
  def int8TopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def quant(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col("id"), col("scale"),
        transform(col("q"), x => x.cast("double")).as("qd"))
      .withColumn("qn", norm(col("qd")))
    val c = quant(corpus)
    // no scale on the probe side: scales cancel in the code-space cosine
    // (comment below), so carrying one through the broadcast is dead weight
    val p = quant(probes).select(col("id").as("probe_id"),
      col("qd").as("pqd"), col("qn").as("pqn"))
    val scored = c.join(broadcast(p), col("id") =!= col("probe_id"))
      // scales cancel in the cosine of the DEQUANTIZED vectors, so the
      // quantized cosine is just the code-space cosine — scale only
      // matters for reconstructing magnitudes, not for ranking
      .withColumn("qcos", dot(col("qd"), col("pqd")) / (col("qn") * col("pqn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qcos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("rank").cast("long").as("rank"))
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed to a long.
    *
    * Plane components are deterministic mixed integers of (plane, dim) in
    * [-2^19, 2^19) — no RNG state, reproducible across executors. The
    * input is quantized to fixed point (floor(x·2^20), exact: a float cast
    * to double then scaled by a power of two rounds nothing) so the
    * projection is a 64-bit INTEGER sum: exact, order-independent, and
    * bit-identical in any engine that can do long arithmetic — which is
    * what makes the full LSH pipeline DuckDB-oracle-checkable instead of
    * rows-only (sign bits computed from float sums can flip in the last
    * ulp between engines; integer sums cannot). Overflow-safe: |q| ≤
    * |x|·2^20, |w| < 2^19, so 64-dim sums stay far below 2^63.
    *
    * The mixer is three 31-bit LCG rounds with a xor-shift-16 between
    * rounds (PCG-style multipliers), every intermediate < 2^61 so both
    * Spark longs and DuckDB BIGINTs compute it exactly without HUGEINT.
    * One linear round is NOT enough: the original single-LCG weights had
    * linear structure across planes — plane p and p+52 were IDENTICAL
    * (sign agreement 1.0 on the sf0.1 corpus; 259 of 1770 plane pairs
    * beyond ±0.2 of independence), discovered when the round-10 sf1 scale
    * measurement showed LSH candidate counts ~50× the true near-pair
    * density. The xor-shifts break the linearity: with this mixer the
    * same corpus measures zero plane pairs beyond ±0.2 and candidates
    * track the planted-duplicate truth (SCALE.md "Measured scaling").
    *
    * Evaluation is the native codegen'd [[graft.functions.RhpSig]] node
    * (one JIT-compiled planes×dims loop per row — the
    * [[graft.functions.VecDot]] discipline); the composed-HOF form of the
    * identical math survives as [[rhpSignatureRef]], the executable
    * specification the native node is spec-pinned bit-identical to, null
    * cases included. */
  def rhpSignature(vec: Column, planes: Int): Column =
    graft.functions.RhpSig(vec, planes)

  /** Reference HOF implementation of [[rhpSignature]] — interpreted and
    * slow, kept ONLY as the executable specification for the equivalence
    * spec (and as the authoritative statement of the null semantics: a
    * null array or element poisons every plane's projection and
    * `when(proj >= 0, 1).otherwise(0)` books each bit as 0). */
  private[graft] def rhpSignatureRef(vec: Column, planes: Int): Column = {
    val v = asDouble(vec)
    val q = transform(v, x => floor(x * lit(1048576.0d)).cast("long"))
    def projInline(p: Column): Column = aggregate(
      zip_with(q, sequence(lit(0L), size(v).cast("long") - 1), (xq, i) => {
        val s1 = p.cast("long") * 1000003L + i
        val h1 = pmod(s1 * 1103515245L + 12345L, lit(2147483648L))
        val s2 = h1.bitwiseXOR(shiftright(h1, 16))
        val h2 = pmod(s2 * 747796405L + 2891336453L, lit(2147483648L))
        val s3 = h2.bitwiseXOR(shiftright(h2, 16))
        val h3 = pmod(s3 * 277803737L + 12345L, lit(2147483648L))
        xq * (shiftright(h3, 11) - 524288L)
      }),
      lit(0L), (acc, x) => acc + x)
    val bits = transform(sequence(lit(0), lit(planes - 1)), p =>
      when(projInline(p) >= 0, lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(planes - 1)), (b, i) => call_function("shiftleft", b, i.cast("int"))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** `nlist` sizing for the IVF cells / semanticDedup clusters: the cell
    * count must grow with the corpus (√n — the FAISS/SemDeDup practice) so
    * per-cell populations stay ~√n-bounded and the within-cell quadratic
    * work (semanticDedup's pair join, IVF's probe scoring) stays linear in
    * total — the same corpus-scaled discipline as Dedup.lshParamsFor for
    * band bits. Floored for tiny corpora, capped where the centroid
    * literal matrix (nlist×dim doubles) would stop being a reasonable
    * broadcast/plan constant. */
  def ivfParamsFor(n: Long, minList: Int = 8, maxList: Int = 65536): Int =
    math.min(maxList.toLong,
      math.max(minList.toLong,
        math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong)).toInt

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` Voronoi
    * cells around L2 k-means centroids (the FAISS-IVFFlat layout); at query
    * time score only the members of each probe's `nprobe` nearest cells.
    * The other classic scale path next to LSH banding.
    *
    * Deterministic end-to-end: seeds are the `nlist` lowest-hash corpus
    * vectors (no RNG state), every Lloyd iteration is one distributed
    * aggregation — assignment is a narrow projection against broadcast
    * centroid literals; the per-(cell, dim) means shuffle nlist×dim partial
    * sums (map-side combined), and only the nlist×dim centroid matrix ever
    * reaches the driver. At 100 TB the corpus never moves: it is scanned
    * once per iteration and once for the final assignment, and the probe
    * join touches ~nprobe/nlist of the rows. Recall < 1 by construction
    * (pinned against bruteForceTopK by spec).
    *
    * Cell scoring is argmax(dot(v, w_i) − ‖w_i‖²/2) ≡ argmin ‖v − w_i‖²:
    * the ‖w_i‖² halves are driver-side literals, so NO per-row norm is
    * evaluated — normalizing rows inside a lambda re-evaluates the norm
    * aggregate per element (the O(d²)-per-reference inlining trap that
    * made the first cut of this operator ~30× slower). */
  private def dotLit(v: Column, w: Array[Double]): Column =
    graft.functions.VecDot(v, lit(w))

  /** Nearest-centroid index; ties resolve to the LOWEST cell index. Native
    * codegen kernel ([[graft.functions.NearestCell]]): the composed
    * score-array form below survives as [[cellOfRef]], the executable
    * specification the kernel is spec-pinned bit-identical to — at
    * corpus-sized nlist (√n, ivfParamsFor) the composed array of nlist
    * VecDot nodes falls out of whole-stage codegen, the interpreted cliff
    * the round-11 sf1 measurement caught on q_sim_ivf_auto. */
  private def cellOf(v: Column, cents: Array[Array[Double]]): Column =
    graft.functions.NearestCell(v, cents)

  /** Reference composed implementation of [[cellOf]] — kept ONLY as the
    * executable specification for the equivalence spec (1-based
    * array_position over the score array = first maximum; null element or
    * length≠dim poisons every score → null). */
  private[graft] def cellOfRef(v: Column, cents: Array[Array[Double]]): Column = {
    val scores = array(cents.map(w =>
      dotLit(v, w) - lit(w.map(x => x * x).sum / 2)): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** The deterministic IVF training stage, exposed on its own so the
    * correctness oracle can embed the trained centroids as SQL literals
    * (PipelineQueries.ivfOracleSql) — same seeds, same Lloyd iterations as
    * the query path ([[ivfTopK]] calls this). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 2, maxTrain: Long = 0L): Array[Array[Double]] = {
    // Sampled-subset training seam (the 100 TB path SCALE.md promises):
    // with maxTrain > 0, the Lloyd iterations run over a deterministic
    // hash-sample of ~maxTrain vectors — pmod(xxhash64(id), k) == 0 with
    // k = ceil(n/maxTrain), so the subset is a pure function of the ids
    // (reproducible across runs and engines, no RNG state), while the
    // FINAL assignment/query path still touches every row. The sampling
    // decision costs one corpus count (the cosineNearDupAuto discipline)
    // but lives INSIDE the memoized computation below, so only the first
    // uncached training pays it — repeated invocations (query + oracle
    // generation + re-planning) hit the memo without touching the source.
    // Centroid quality degrades gracefully (means over a uniform
    // hash-sample), pinned by the sampled-recall spec. maxTrain = 0
    // (default) trains on the full corpus.
    // training is a pure function of (corpus plan, cols, nlist, iters) —
    // hash-min seeds, fixed Lloyd iterations — so memoize per semantic
    // plan: the IVF query, the clustering ops and the oracle generator all
    // train over the same corpus and would otherwise re-run the k
    // aggregation passes each. The memo assumes data under a given plan is
    // immutable for the JVM lifetime (true of the engine's parquet
    // fixtures); after rewriting files in place, call
    // [[clearCentroidCache]]. Bounded: access-order LRU of 64 entries
    // (each value is only nlist×dim doubles, but plans accumulate) —
    // the earlier wholesale clear could race a concurrent
    // computeIfAbsent and drop a just-computed entry (r10 VERDICT nit);
    // the LRU evicts exactly one cold entry under the same lock that
    // inserts, so no thread's result disappears. Training runs OUTSIDE
    // the cache lock (Spark jobs under a lock would serialize unrelated
    // callers); racing first-callers for the SAME key share one training
    // run via a per-key in-flight thunk (a thread-safe lazy val): the
    // first evaluator trains, the racers block on that key's monitor
    // only — identical results either way (pure function), but the
    // k-means Spark jobs run once, not once per caller.
    // the canonicalized plan string is the discriminator — semanticHash
    // alone is a 32-bit plan hash, and a silent collision between two
    // different corpus plans would hand the wrong centroids to every
    // downstream path (IVF, clustering, the oracle generator)
    val key = (corpus.queryExecution.analyzed.canonicalized.toString,
      idCol, vecCol, nlist, iters, maxTrain)
    val hit = centroidCache.synchronized { Option(centroidCache.get(key)) }
    hit.getOrElse {
      // per-key in-flight marker: the mapping function only BUILDS the
      // memoizing thunk (cheap, safe under the CHM bin lock); evaluation
      // happens after, so concurrent first-callers block on this key's
      // lazy monitor and share one training run instead of each running
      // the full Lloyd job
      val thunk = centroidInFlight.computeIfAbsent(key, _ => {
        lazy val result: Array[Array[Double]] = {
          val base =
            if (maxTrain <= 0L) corpus
            else {
              val n = corpus.count()
              if (n <= maxTrain) corpus
              else {
                val k = math.ceil(n.toDouble / maxTrain).toLong
                corpus.where(pmod(xxhash64(col(idCol)), lit(k)) === 0)
              }
            }
          trainCentroids(base, idCol, vecCol, nlist, iters)
        }
        () => result
      })
      // in-flight entry is removed on BOTH paths: a trainCentroids
      // failure must not leave the stale thunk funneling future callers
      // through its monitor forever (r13 advice item). Removal happens
      // AFTER the cache put so a racing caller between the two never
      // retrains.
      try {
        val trained = thunk()
        centroidCache.synchronized { centroidCache.put(key, trained) }
        trained
      } finally centroidInFlight.remove(key)
    }
  }

  /** Drop memoized training results (use after overwriting input data in
    * place — the semantic-plan key cannot see data changes). */
  def clearCentroidCache(): Unit =
    centroidCache.synchronized { centroidCache.clear() }

  private type CentroidKey = (String, String, String, Int, Int, Long)
  private val centroidInFlight = new java.util.concurrent.ConcurrentHashMap[
    CentroidKey, () => Array[Array[Double]]]()
  private val centroidCache =
    new java.util.LinkedHashMap[CentroidKey, Array[Array[Double]]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[CentroidKey, Array[Array[Double]]]): Boolean =
        size > 64
    }

  private def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): Array[Array[Double]] = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    var cents: Array[Array[Double]] = c
      .orderBy(pmod(xxhash64(col("id")), lit(1000003L)), col("id")).limit(nlist)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = cents(0).length
    for (_ <- 1 to iters) {
      // per-(cell, dim) means WITHOUT a generator: exploding v would
      // re-evaluate the 16-score cell expression once per exploded row
      // (64× per vector — measured 7× slower); element_at over the array
      // attribute keys the aggregation off one cell evaluation per row
      val means = c.select(cellOf(col("v"), cents).as("cell"), col("v"))
        .groupBy(col("cell"))
        .agg(avg(element_at(col("v"), 1)).as("m0"),
          (1 until dim).map(j => avg(element_at(col("v"), j + 1)).as(s"m$j")): _*)
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        val cell = r.getInt(0)
        (0 until dim).foreach(j => next(cell)(j) = r.getDouble(j + 1))
      }
      cents = next // cells with no members kept their old centroid
    }
    cents
  }

  /** Content clustering for corpus curation: nearest-centroid assignment
    * against the deterministic k-means centroids — the IVF training stage
    * reused as a first-class clustering operator (cluster-balanced training
    * mixes, per-topic diversity analysis, cluster-scoped dedup). Returns
    * (id, v, cluster). The assignment is a narrow scan-level projection
    * against broadcast centroid literals: the corpus never shuffles, cost
    * is one pass — the same 100 TB posture as the IVF query path. */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, iters: Int = 2): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, iters)
    corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cluster", cellOf(col("v"), cents))
  }

  /** IVF approximate top-k: probe the `nprobe` nearest of `nlist` trained
    * cells, score only their members. PRECONDITION: `idCol` is unique per
    * corpus row — the candidate join relies on it (see the no-distinct
    * note below); exact-duplicate (id, v) rows would surface as duplicate
    * scored candidates and consume top-k rank slots. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 2, maxTrain: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cents = ivfCentroids(corpus, idCol, vecCol, nlist, iters, maxTrain)
    val assigned = c.withColumn("cell", cellOf(col("v"), cents))
    // probe side: nprobe nearest cells via sorted (score, cell) structs
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    val pDots = array(cents.zipWithIndex.map { case (w, i) =>
      struct((dotLit(col("pv"), w) - lit(w.map(x => x * x).sum / 2)).as("d"),
        lit(i).as("cell")) }: _*)
    val pCells = p.withColumn("cells",
        slice(reverse(array_sort(pDots)), 1, nprobe))
      .select(col("probe_id"), col("pv"), explode(col("cells.cell")).as("cell"))
    // NO distinct here, deliberately: ids are unique per row (the scaladoc
    // precondition), cells partition the corpus (each id
    // is assigned to exactly one cell) and a probe's nprobe cells are
    // distinct, so a (probe_id, id) pair can match at most once — a
    // dedup would be a no-op that still pays a full shuffle of the rows
    // WITH both vector payloads (the r9 item-5 pattern, here avoidable
    // entirely rather than slimmed)
    val scored = assigned.as("c").join(broadcast(pCells).as("p"),
        col("c.cell") === col("p.cell") && col("c.id") =!= col("p.probe_id"))
      .select(col("probe_id"), col("id"), col("v"), col("pv"))
      .withColumn("cosine", dot(col("v"), col("pv")) / (norm(col("v")) * norm(col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** [[ivfTopK]] with corpus-sized parameters — the IVF twin of
    * Dedup.cosineNearDupAuto: counts the corpus once, takes
    * [[ivfParamsFor]]'s √n cells and probes nlist/4 of them (floor 4 — the
    * fixed 4/16 ratio of the pinned variant, now scale-following: per-cell
    * population and the scored candidate fraction both stay √n-bounded as
    * the corpus grows instead of a fixed 16-cell layout going quadratic
    * per cell). */
  /** Recall@k of an approximate top-k against the exact ground truth —
    * THE acceptance metric for every ANN deployment (faiss/ScaNN report
    * it; a pruned index without a recall number is unshippable). Both
    * inputs are (probe_id, id, rank) top-k frames (any of this module's
    * *TopK outputs); rows ranked > k are ignored so a wider truth frame
    * can be reused across k values. Per probe: hits = |truth∩approx|,
    * `k` = the truth rows actually present (< k when the corpus is
    * smaller than k), recall permille by the oracle-safe
    * floor(h·1000.0/k) pattern.
    *
    * Shape: both sides are k·|probes| rows — the eval is dimension-table
    * sized at any corpus scale; one equi-join + one map-side-combined
    * rollup. The COST lives in the topK inputs, which carry their own
    * scale postures. */
  def recallAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val t = truth.where(col("rank") <= k)
      .select(col("probe_id"), col("id"))
    val a = approx.where(col("rank") <= k)
      .select(col("probe_id"), col("id"), lit(1L).as("__hit"))
    t.join(a, Seq("probe_id", "id"), "left")
      .groupBy(col("probe_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).cast("long").as("n_hit"),
        count(lit(1)).cast("long").as("k"))
      .select(col("probe_id"), col("n_hit"), col("k"),
        floor(col("n_hit").cast("double") * 1000.0 /
          col("k").cast("double")).cast("long").as("recall_x1000"))
  }

  def ivfTopKAuto(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int = 2, maxTrain: Long = 0L): DataFrame = {
    val nlist = ivfParamsFor(corpus.count())
    ivfTopK(corpus, probes, idCol, vecCol, k, nlist = nlist,
      nprobe = math.max(4, nlist / 4), iters = iters, maxTrain = maxTrain)
  }

  /** Product-quantization codebooks: the embedding dimension splits into
    * `m` contiguous subspaces and each subspace trains its own
    * deterministic k-means codebook of `ksub` sub-centroids — the FAISS-PQ
    * layout. Training per subspace reuses the memoized deterministic Lloyd
    * pipeline ([[ivfCentroids]] over a sub-vector projection — each
    * subspace is its own semantic plan, so the memo keys them apart).
    * Returns [m][ksub][dsub]. Only m·ksub·dsub doubles reach the driver. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ksub: Int = 8, iters: Int = 2): Array[Array[Array[Double]]] = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    (0 until m).toArray.map { s =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), s * dsub + 1, dsub).as(vecCol))
      ivfCentroids(sub, idCol, vecCol, ksub, iters)
    }
  }

  /** PQ codes: (id, v, codes) with `codes(s)` the nearest sub-centroid of
    * subspace s — the compressed representation (m small ints instead of
    * dim floats; at 100 TB THIS is what a compressed-domain scan reads).
    * Scan-local projection against codebook literals, no shuffle; the
    * per-subspace argmax shares [[cellOf]]'s first-max tie-break. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]]): DataFrame = {
    val dsub = books(0)(0).length
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    c.withColumn("codes", array(books.zipWithIndex.map { case (bk, s) =>
      cellOf(slice(col("v"), s * dsub + 1, dsub), bk)
    }: _*))
  }

  /** PQ ANN (asymmetric-distance computation + exact re-rank): candidates
    * rank by the cosine between the probe and each corpus vector's
    * RECONSTRUCTION — per subspace, one table lookup of the probe·centroid
    * dot and the centroid's squared norm, both codebook literals, so the
    * compressed-domain pass reads only the m-int code per row; the top
    * `rerank` candidates per probe are re-scored with exact cosine. Same
    * output shape as the other ANN ops; recall < 1 by construction
    * (pinned against bruteForceTopK by spec). At 100 TB: probes broadcast,
    * the corpus scan is compressed-domain, only `rerank` rows per probe
    * touch full vectors again. */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, ksub: Int = 8, rerank: Int = 50,
      iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = pqCodebooks(corpus, idCol, vecCol, m, ksub, iters)
    val dsub = books(0)(0).length
    val encoded = pqEncode(corpus, idCol, vecCol, books)
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    // Σ_s table_s[code_s]: probe·sub-centroid dots (ADC numerator) and the
    // reconstruction's squared norm — both resolved per row by code lookup
    val approxDot = (0 until m).map { s =>
      val tab = array(books(s).map(wc =>
        dotLit(slice(col("pv"), s * dsub + 1, dsub), wc)): _*)
      element_at(tab, element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val recNorm2 = (0 until m).map { s =>
      val tab = array(books(s).map(wc => lit(wc.map(x => x * x).sum)): _*)
      element_at(tab, element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val joined = encoded.join(broadcast(p), col("id") =!= col("probe_id"))
      .withColumn("adc", approxDot / (norm(col("pv")) * sqrt(recNorm2)))
    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").desc, col("id"))
    val cands = joined.withColumn("crank", row_number().over(wAdc))
      .where(col("crank") <= rerank)
    val scored = cands.withColumn("cosine",
      dot(col("v"), col("pv")) / (norm(col("v")) * norm(col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed ANN: signature chunks as buckets, exact cosine re-rank of
    * the candidates only. Same output shape as bruteForceTopK; recall < 1
    * by construction (ScalaTest pins it against brute force).
    *
    * `multiprobe = 1` (the FAISS-style multiprobe trade): each PROBE also
    * looks into the buckets whose band value differs from its own in one
    * bit — the buckets a true neighbor most likely fell into when one sign
    * bit flipped. Recall rises steeply (fixture-measured 0.40 → 0.97 at
    * recall@10) for (1 + bits-per-band)× the probe keys; the expansion is
    * entirely on the broadcast probe side — the corpus is banded, stored
    * and shuffled exactly as at multiprobe=0, so it is the cheap
    * alternative to more bands whenever re-banding the corpus is the
    * expensive side (always, at 100 TB).
    *
    * 100 TB posture: per-probe candidate volume is corpus_n / 2^(planes/
    * chunks) per band (× (1+bits) under multiprobe) — FIXED banding
    * degrades toward scanning a constant fraction of the corpus as it
    * grows. Size (planes, chunks) with Dedup.lshParamsFor (bits-per-band
    * ~ log2(n/occupancy)). */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 16, chunks: Int = 4,
      multiprobe: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(multiprobe == 0 || multiprobe == 1,
      "multiprobe supports 0 (exact bucket) or 1 (one-bit-flip neighbors)")
    val chunkBits = planes / chunks
    // only (id, chunk, chunk_val) rides the band join, and multi-band
    // (and multiprobe-key) collisions dedup on BARE ID PAIRS — carrying
    // the vectors through the band join and the distinct exchange ships
    // redundant KB-scale payload per duplicate collision (the VERDICT r9
    // item-5 defect, fixed in cosineNearDup's LSH path; multiprobe would
    // amplify it up to (1+bits)×). Vectors re-attach afterwards: probes
    // via a second broadcast, the corpus via one equi-join on id.
    def banded(df: DataFrame, idName: String, expand: Boolean) = {
      val base = df.select(col(idCol).as(idName),
        rhpSignature(col(vecCol), planes).as(s"${idName}_sig"))
        .select(col(idName),
          posexplode(transform(sequence(lit(0), lit(chunks - 1)), c =>
            call_function("shiftright", col(s"${idName}_sig"), (c * chunkBits).cast("int"))
              .bitwiseAND(lit((1L << chunkBits) - 1)))))
        .toDF(idName, "chunk", "chunk_val")
      if (!expand) base
      else base.select(col(idName), col("chunk"),
        explode(array((lit(0L) +: (0 until chunkBits).map(b => lit(1L << b)))
          .map(m => col("chunk_val").bitwiseXOR(m)): _*)).as("chunk_val"))
    }
    val cb = banded(corpus, "id", expand = false)
    val pb = banded(probes, "probe_id", expand = multiprobe == 1)
    val cands = cb.join(broadcast(pb),
        cb("chunk") === pb("chunk") && cb("chunk_val") === pb("chunk_val") &&
          col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"))
      .distinct()
    val withVecs = cands
      .join(broadcast(probes.select(col(idCol).as("probe_id"),
        asDouble(col(vecCol)).as("pv"))), "probe_id")
      .join(corpus.select(col(idCol).as("id"),
        asDouble(col(vecCol)).as("v")), "id")
    val scored = withVecs.withColumn("cosine",
      dot(col("v"), col("pv")) / (norm(col("v")) * norm(col("pv"))))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Matryoshka truncate-then-rerank ANN (MRL-style two-stage retrieval):
    * stage 1 scores the whole corpus against the probes on only the first
    * `prefixDims` vector components — matryoshka-trained embeddings
    * front-load their signal, so the truncated cosine is a cheap, well-
    * ordered surrogate — and keeps the top `cand` ids per probe; stage 2
    * re-attaches full vectors to that slim (probe_id, id) set and re-ranks
    * by exact full-dimension cosine. Output shape matches
    * [[bruteForceTopK]]; with `prefixDims` = the full dimension and `cand`
    * ≥ corpus size the two are identical (spec-pinned), and recall at a
    * real truncation is pinned against brute force on the fixture.
    *
    * 100 TB posture: the full-corpus stage runs on prefixDims/dims of the
    * arithmetic AND of the broadcast bytes (a 64→16 cut is 4× on both);
    * candidate selection is a rank-`cand` window that Spark's
    * WindowGroupLimit rewrites into per-partition partial top-`cand`
    * BEFORE the shuffle, so only ~cand×probes×partitions slim id rows ever
    * move; the exact stage touches cand×probes rows re-attached by one
    * equi-join (the lshTopK discipline — vectors never ride the candidate
    * shuffle). Stage 1 composes: any bucketed ANN in this file can run
    * over the truncated column instead of the scan when the corpus is
    * banded anyway. */
  def mrlTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, prefixDims: Int = 16, cand: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cand >= k, s"cand ($cand) must be >= k ($k)")
    require(prefixDims > 0, s"prefixDims must be positive, got $prefixDims")
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    val ct = c.select(col("id"), slice(col("v"), 1, prefixDims).as("tv"))
      .withColumn("tn", norm(col("tv")))
    val pt = p.select(col("probe_id"), slice(col("pv"), 1, prefixDims).as("ptv"))
      .withColumn("ptn", norm(col("ptv")))
    val w1 = Window.partitionBy(col("probe_id")).orderBy(col("tcos").desc, col("id"))
    val candidates = ct.join(broadcast(pt), col("id") =!= col("probe_id"))
      .withColumn("tcos", dot(col("tv"), col("ptv")) / (col("tn") * col("ptn")))
      .withColumn("crank", row_number().over(w1))
      .where(col("crank") <= cand)
      .select(col("probe_id"), col("id"))
    val w2 = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    candidates
      .join(broadcast(p.withColumn("pn", norm(col("pv")))), "probe_id")
      .join(c.withColumn("n", norm(col("v"))), "id")
      .withColumn("cosine", dot(col("v"), col("pv")) / (col("n") * col("pn")))
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Sign-bit binary quantization — 1 bit per dimension, packed 32 bits
    * per word: bit_j of word_w is [x_{32w+j} > 0], so a float32 embedding
    * column shrinks 32× (the aggressive end of the int8 lever above; on
    * roughly isotropic embeddings the Hamming distance between sign codes
    * is a monotone surrogate for angular distance — the binary-quantized
    * retrieval trick). Words stay below 2^32 ON PURPOSE: 64-bit packing
    * would need wrapping arithmetic at bit 63, which Spark longs do and
    * DuckDB BIGINTs refuse (overflow error, the arg_max flattening lesson)
    * — 32-bit words keep every engine's integer arithmetic exact, and the
    * DuckDB oracle rebuilds the identical words by an independent
    * power-of-two sum. Empty vectors code to an empty array (the RhpSig
    * empty-input convention). Returns (id, code: array<long>); a pure
    * per-row projection, scan-local at any corpus size. */
  def binaryQuantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val word = (w: Column) => aggregate(
      sequence(lit(31), lit(0), lit(-1)), lit(0L),
      (acc, j) => acc * 2 + when(element_at(col("__bv"), (w * 32 + j + 1).cast("int")) > 0.0d,
        lit(1L)).otherwise(lit(0L)))
    emb.select(col(idCol).as("id"), v.as("__bv"))
      .select(col("id"),
        when(size(col("__bv")) === 0, array().cast("array<bigint>"))
          .otherwise(transform(
            // Column./ is float division — truncate back to the int word
            // count (positive, so the cast floors)
            sequence(lit(0), ((size(col("__bv")) + 31) / 32).cast("int") - 1),
            word))
          .as("code"))
  }

  /** Binary-quantized ANN: stage 1 ranks the whole corpus per probe by
    * Hamming distance between sign codes (32× smaller than the vectors —
    * only codes ride the broadcast and the scan) and keeps the `cand`
    * closest ids; stage 2 re-attaches full vectors to that slim
    * (probe_id, id) set and re-ranks by exact cosine — the [[mrlTopK]]
    * two-stage discipline with Hamming as the cheap surrogate. Ties in
    * code space break by id, so the candidate set is deterministic and
    * the whole chain is DuckDB-replayable (sign bits compare identical
    * doubles; xor/bit_count are integer-exact).
    *
    * 100 TB posture: the full-corpus stage streams codes only (dims/8
    * bytes per row), the rank-`cand` window is per-probe partial top-k
    * before its one shuffle (WindowGroupLimit), and the exact stage
    * touches cand×probes re-attached rows — vectors never ride the
    * candidate shuffle. Output shape matches [[bruteForceTopK]]. */
  def binaryTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, cand: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cand >= k, s"cand ($cand) must be >= k ($k)")
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    val cc = binaryQuantize(corpus, idCol, vecCol)
    val pc = binaryQuantize(probes, idCol, vecCol)
      .select(col("id").as("probe_id"), col("code").as("pcode"))
    val w1 = Window.partitionBy(col("probe_id")).orderBy(col("ham"), col("id"))
    val candidates = cc.join(broadcast(pc), col("id") =!= col("probe_id"))
      .withColumn("ham", aggregate(
        zip_with(col("code"), col("pcode"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), _ + _))
      .withColumn("crank", row_number().over(w1))
      .where(col("crank") <= cand)
      .select(col("probe_id"), col("id"))
    val w2 = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("id"))
    candidates
      .join(broadcast(p.withColumn("pn", norm(col("pv")))), "probe_id")
      .join(c.withColumn("n", norm(col("v"))), "id")
      .withColumn("cosine", dot(col("v"), col("pv")) / (col("n") * col("pn")))
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("id"), col("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the
    * LASER/CCMatrix criterion): mined (src, tgt) pairs are mutual nearest
    * neighbors whose cosine clears a RATIO margin over each side's
    * top-`k` neighborhood mean — absolute-threshold mining fails because
    * hubness inflates some vectors' cosines globally; the margin divides
    * that hub mass out.
    *
    *   margin(x,y) = cos(x,y) / (½·(avgTopK(x→tgt) + avgTopK(y→src)))
    *
    * mined iff y = argmax over tgt for x, x = argmax over src for y
    * (forward-backward "intersection" strategy) AND margin >
    * `marginX1000/1000`. The margin test is evaluated cross-multiplied —
    * `2000·cos·cntX·cntY > m·(sumX·cntY + sumY·cntX)` — so no division
    * touches the doubles and an external engine replays the identical
    * arithmetic.
    *
    * `blockCol` is the blocking stage (same posture as cosineNearDup's
    * label blocks: length bucket, domain, LSH band — at corpus scale the
    * caller blocks, this operator never goes all-pairs). Per block the
    * candidate table is |src|·|tgt| rows reduced immediately by two
    * partial-top-k windows (WindowGroupLimit — no full sort); the two
    * directions each aggregate to one row per vector before the final
    * (small) mutual join. The pair subtree is evaluated once per
    * direction — recompute beats materializing a block² frame. */
  def bitextMine(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, blockCol: String, k: Int = 4,
      marginX1000: Long = 1200L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val s = src.select(col(blockCol).as("blk"), col(idCol).as("sid"),
        asDouble(col(vecCol)).as("sv"))
      .withColumn("sn", norm(col("sv")))
    val t = tgt.select(col(blockCol).as("blk"), col(idCol).as("tid"),
        asDouble(col(vecCol)).as("tv"))
      .withColumn("tn", norm(col("tv")))
    val scored = s.join(t, "blk")
      .select(col("sid"), col("tid"),
        (dot(col("sv"), col("tv")) / (col("sn") * col("tn"))).as("cosine"))
    def topkAgg(part: String, other: String) = {
      val w = Window.partitionBy(col(part))
        .orderBy(col("cosine").desc, col(other))
      scored.withColumn("r", row_number().over(w)).where(col("r") <= k)
        .groupBy(col(part))
        .agg(sum(when(col("r") === 1, col(other))).as(s"${part}_top1"),
          sum(when(col("r") === 1, col("cosine"))).as(s"${part}_cos"),
          sum(col("cosine")).as(s"${part}_sum"),
          count(lit(1)).as(s"${part}_cnt"))
    }
    val fwd = topkAgg("sid", "tid")
    val bwd = topkAgg("tid", "sid")
    fwd.join(bwd,
        col("sid_top1") === col("tid") && col("tid_top1") === col("sid"))
      .where(col("sid_cos") * lit(2000.0) * col("sid_cnt") * col("tid_cnt") >
        lit(marginX1000.toDouble) *
          (col("sid_sum") * col("tid_cnt") + col("tid_sum") * col("sid_cnt")))
      .select(col("sid").as("src_id"), col("tid").as("tgt_id"))
  }

  /** [[bitextMine]] behind corpus-sized random-hyperplane blocking — the
    * production entry point when no bounded natural blocking key exists.
    * A fixed-cardinality block column is quadratic per block BY SEMANTICS,
    * so on a growing corpus it degrades toward all-pairs (the
    * q_dedup_cosine lesson, SCALE.md round 10); here BOTH sides compute
    * the same integer-exact [[rhpSignature]] and block on its low
    * `bandBits` sign bits, and the band count GROWS with the corpus:
    * bandBits defaults to clamp(ceil(log2((|src|+|tgt|)/targetOccupancy)),
    * 4, planes−1) — the [[graft.pipeline.Dedup.lshParamsFor]] sizing rule
    * — holding expected band occupancy near `targetOccupancy` and total
    * candidate volume ~linear in the corpus. The cost is recall at the
    * band boundary: a pair with angle θ agrees on each sign bit with
    * probability 1−θ/π (the standard RHP trade — exact-duplicate
    * directions agree on every bit and are never lost), and both margin
    * neighborhoods are band-scoped. Sizing is one count job; because the
    * signature is an integer sum, the whole pipeline — sizing rule
    * included — replays exactly in an external engine. */
  def bitextMineLsh(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, marginX1000: Long = 1200L,
      planes: Int = 32, targetOccupancy: Int = 64,
      bandBits: Option[Int] = None): DataFrame = {
    require(planes >= 5 && planes <= 63, s"planes must be in [5, 63]: $planes")
    val bits = bandBits.getOrElse {
      val n = src.count() + tgt.count()
      val wanted = math.ceil(math.log(math.max(1L, n).toDouble /
        math.max(1, targetOccupancy)) / math.log(2.0)).toInt
      math.min(planes - 1, math.max(4, wanted))
    }
    val mask = (1L << bits) - 1L
    def banded(f: DataFrame) = f.withColumn("__band",
      rhpSignature(col(vecCol), planes).bitwiseAND(lit(mask)))
    bitextMine(banded(src), banded(tgt), idCol, vecCol, "__band",
      k, marginX1000)
  }

  /** Farthest-point (k-center greedy) coreset selection over an embedding
    * column — the diversity-maximizing counterpart of
    * [[graft.pipeline.Sampling]]'s rate samplers (active-learning seed
    * sets, dataset-distillation coresets, k-center/k-means++ style
    * initialization): starting from the minimum-id row, each round adds
    * the point FARTHEST from the selected set (max over rows of min over
    * centers), the classical 2-approximation to the k-center cover.
    *
    * Returns k driver-built rows (sel_rank, id, dist_sq) where dist_sq is
    * the squared quantized distance from the selected point to the
    * prior set at selection time — a non-increasing sequence that IS the
    * coreset's coverage-radius curve (read it to choose k). The seed row
    * carries NULL.
    *
    * Exactness: vectors are quantized once to `floor(x·2^20)` longs (the
    * [[rhpSignature]] fixed-point — exact on float-cast-to-double
    * inputs), so every distance is an INTEGER sum of squares (≤ 2^48 at
    * 64 dims — no overflow, no ulp), argmax ties break on minimum id,
    * and an external engine unrolling the same k rounds reproduces the
    * selection bit-for-bit. A duplicate of a selected center has
    * dist 0 and is never re-selected.
    *
    * Scale shape: ONE materialization of the 2-column (id, q) projection
    * (localCheckpoint — the perceptron docFeats discipline), then k
    * stateless scans: round r evaluates `least` over r broadcast-literal
    * center distances (no per-round re-materialization, no growing
    * lineage) and takes the argmax as `orderBy(...).limit(1)` =
    * TakeOrderedAndProject — per-partition top-1, a 1-row driver merge.
    * k corpus scans is the ALGORITHM's shape (greedy k-center is
    * inherently sequential); keep k modest (≤ ~64) or block the corpus
    * first. */
  def farthestPointSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(idCol).cast("long").as("id"),
        transform(transform(col(vecCol), _.cast("double")),
          x => floor(x * lit(1048576.0d)).cast("long")).as("q"))
      .localCheckpoint()
    val seed = q.orderBy(col("id")).limit(1).collect().head
    def distTo(c: Array[Long]): Column = aggregate(
      zip_with(col("q"), typedlit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    var centers = Vector(seed.getSeq[Long](1).toArray)
    val out = Seq.newBuilder[(Long, Long, Option[Long])]
    out += ((1L, seed.getLong(0), None))
    for (r <- 2 to k) {
      val dmin = centers.map(distTo).reduce(least(_, _))
      val next = q.withColumn("dmin", dmin)
        .orderBy(col("dmin").desc, col("id")).limit(1)
        .collect().head
      out += ((r.toLong, next.getLong(0), Some(next.getLong(2))))
      centers :+= next.getSeq[Long](1).toArray
    }
    out.result().toDF("sel_rank", "id", "dist_sq")
  }
}
