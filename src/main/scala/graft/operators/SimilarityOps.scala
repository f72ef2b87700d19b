package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`embeddings(vec_id,
 * embedding: array<float>, label)`).
 *
 *  - [[bruteForceTopK]]: exact cosine top-k of the corpus against a SMALL
 *    broadcast query set — the correctness baseline. O(corpus × queries) dot
 *    products, all inside codegen (`zip_with`/`aggregate`), one window.
 *  - [[annTopK]]: hyperplane-LSH bucketed approximate variant — the scale
 *    path. Corpus is bucketed once (16-byte rows shuffle, not vectors);
 *    queries probe only their own bucket, so cost per query is
 *    corpus/2^planes. Recall is tunable via `planes`.
 */
object SimilarityOps {

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed; public so
    * oracle SQL can inline the exact same plane literals for DuckDB). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit bucket id of `v` under `nPlanes` fixed hyperplanes — native
    * expression (graft.functions.HyperplaneBucket): the Catalyst-HOF
    * composition creates an nPlanes×dim literal tree with seconds of janino
    * compile time per plan. */
  def hyperplaneBucket(v: Column, nPlanes: Int = 8, dim: Int = 64): Column =
    graft.functions.HyperplaneBucket(v,
      planes(nPlanes, dim).map(_.toArray).toArray)

  /** Exact cosine between two vector columns. */
  def cosine(a: Column, b: Column): Column = DedupOps.cosine(a, b)

  /**
   * Exact top-k: every (query, corpus) cosine, ranked per query.
   * `queries(query_id, qvec)` must be small — it is broadcast; the corpus is
   * scanned once, never shuffled (the only exchange is the per-query window,
   * partitioned by query_id — #queries × k rows).
   */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Query-side multiprobe expansion: home bucket + every 1-bit flip. */
  private def probedQueries(queries: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val probes = (0 until nPlanes).map(i => col("bucket0").bitwiseXOR(lit(1L << i)))
    queries
      .withColumn("bucket0", hyperplaneBucket(col("qvec"), nPlanes, dim))
      .withColumn("bucket", explode(array(col("bucket0") +: probes: _*)))
      .drop("bucket0")
  }

  /** Exact cosine re-rank of probed candidates → top-k per query.
    *
    * No (query_id, vec_id) dedup: every caller's candidate set is unique by
    * construction — a corpus vector lives in exactly ONE bucket/list and a
    * query's probe set is distinct values (bucket0 plus distinct 1-bit
    * flips; CentroidIds returns distinct ids; the ADC shortlist is a
    * row_number cut), so at most one probe row matches each vector. The
    * dropDuplicates this replaces was a full extra shuffle of the scored
    * candidate set on every ANN query (the single-exchange plan assertion
    * in PipelineSpec pins its absence; the oracles pin the results). */
  private def rerank(candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * ANN top-k: corpus bucketed by hyperplane LSH; each query MULTI-PROBES its
   * own bucket plus every 1-bit-flip neighbor (the standard recall lever —
   * points near a hyperplane land on either side), then exact re-rank.
   * In-memory formulation: the corpus is scanned once, probes join broadcast.
   */
  def annTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
              nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val corpus = embeddings.withColumn("bucket", hyperplaneBucket(col("embedding"), nPlanes, dim))
    rerank(corpus.join(broadcast(probedQueries(queries, nPlanes, dim)), "bucket"), k)
  }

  /**
   * The 100 TB storage path: corpus written ONCE partitioned by bucket (the
   * Iceberg `bucket`-partition layout), probes become STATIC partition
   * filters on the read — the scan itself prunes to probes/2^planes of the
   * data instead of filtering after a full scan. Plan-asserted in tests
   * (PartitionFilters on the probe scan).
   */
  def writeBucketed(embeddings: DataFrame, path: String,
                    nPlanes: Int = 6, dim: Int = 64): Unit =
    embeddings
      .withColumn("bucket", hyperplaneBucket(col("embedding"), nPlanes, dim))
      // key-aligned shuffle before the partitioned write: without it every
      // input partition writes a file into every bucket dir it touches
      // (parallelism × 2^planes tiny files); with it each bucket's rows sit
      // in one task ⇒ one file per bucket (CompactionProbe's appendIvfPq
      // finding, applied to every partitionBy writer)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  // ------------------------------------------------------------------------
  // IVF (inverted-file) variant: k-means coarse quantizer instead of random
  // hyperplanes — data-adaptive lists, the standard trade when the corpus is
  // clustered rather than isotropic.
  // ------------------------------------------------------------------------

  /** Broadcastable IVF index: the trained coarse-quantizer centroids. */
  final case class IvfIndex(centroids: Array[Array[Double]]) extends Serializable

  /**
   * Train the coarse quantizer with MLlib k-means (seeded → deterministic for
   * a fixed input). Ontology-of-lists sizing: nLists ≈ √corpus is the usual
   * heuristic. The training set is CAPPED at `maxTrainRows` via a
   * deterministic hash-sample — the quantizer needs distribution SHAPE, not
   * every row, and k-means over 10^10 corpus vectors would dominate the whole
   * build. Hash-sampling (not `limit`) keeps the sample uniform in vec_id and
   * independent of storage order — a `limit` would train only on the first
   * partitions, which under clustered/bucketed layouts is one region of the
   * space.
   */
  /** Deterministic hash-capped training sample, shared by [[trainIvf]] and
    * [[trainPq]]. CEILING divisor: floor(n/max) is 1 for max < n < 2*max
    * (cap becomes a no-op) and overshoots by up to ~2x in general; ceil
    * keeps the expected sample size <= maxTrainRows for every n. Uniform in
    * vec_id and independent of storage order — a `limit` would train only
    * on the first partitions. */
  private def hashCappedSample(embeddings: DataFrame, maxTrainRows: Long,
                               seed: Long): DataFrame = {
    val n = embeddings.count()
    if (n <= maxTrainRows) embeddings
    else embeddings.filter(
      pmod(xxhash64(col("vec_id"), lit(seed)),
        lit((n + maxTrainRows - 1) / maxTrainRows)) === 0)
  }

  def trainIvf(embeddings: DataFrame, nLists: Int = 16, maxIter: Int = 10,
               seed: Long = 42L, maxTrainRows: Long = 100000L): IvfIndex = {
    // The maxTrainRows cap makes the training set driver-sized BY DESIGN
    // (the quantizer needs distribution shape, not every row) — so training
    // collects the capped sample ONCE and runs seeded k-means++ + Lloyd on
    // the driver. Round-7 measurement: the previous MLlib KMeans path paid
    // ~15 scheduler round-trips (k-means|| init + one whole Spark job per
    // Lloyd iteration) to cluster a sample that is a few MB — 28 of
    // q_ann_ivf's 31 jobs were training. Sorting by vec_id makes the result
    // independent of partitioning/collect order (same reason the sample is
    // hash-derived, not a limit).
    val narrow = embeddings
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
    // bounded probe first (the fetchDocsByIds pattern): when the corpus fits
    // the cap the probe IS the whole set — one collect job instead of
    // count + hash-filter + collect; only a genuinely over-cap corpus pays
    // the exact count the hash sample divisor needs
    val lim = math.min(maxTrainRows, Int.MaxValue - 1L).toInt
    val probe = narrow.limit(lim + 1).collect()
    val rows =
      if (probe.length <= lim) probe
      else {
        val n = embeddings.count()
        narrow.filter(
          pmod(xxhash64(col("vec_id"), lit(seed)),
            lit((n + maxTrainRows - 1) / maxTrainRows)) === 0).collect()
      }
    val data = rows.sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    IvfIndex(driverKMeans(data, nLists, maxIter, seed))
  }

  /**
   * Seeded k-means++ init + Lloyd iterations on the driver, over the
   * hash-capped training sample. Deterministic for a fixed (data order,
   * seed); empty clusters keep their previous centroid (the MLlib
   * convention); stops early when no assignment changes. The assignment
   * step — the O(n·k·dim) part — runs data-parallel over points (writes are
   * per-index, result independent of scheduling); the O(n·dim) accumulation
   * stays serial so centroid sums are reproducible left-to-right doubles.
   */
  private[operators] def driverKMeans(data: Array[Array[Double]], k: Int,
                                      maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(data.nonEmpty, "trainIvf: empty training sample — nothing to cluster")
    require(k > 0, s"trainIvf: nLists must be positive, got $k")
    val n = data.length
    val dim = data(0).length
    val rng = new scala.util.Random(seed)
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ D² seeding (duplicate points are fine: a fully-covered
    // sample reseeds uniformly, mirroring data with fewer distinct rows
    // than lists)
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = data(rng.nextInt(n)).clone()
    val d2 = new Array[Double](n)
    var i = 0
    while (i < n) { d2(i) = dist2(data(i), centers(0)); i += 1 }
    var c = 1
    while (c < k) {
      var total = 0.0
      i = 0
      while (i < n) { total += d2(i); i += 1 }
      val next =
        if (total <= 0) data(rng.nextInt(n))
        else {
          var target = rng.nextDouble() * total
          var j = 0
          while (j < n - 1 && target > d2(j)) { target -= d2(j); j += 1 }
          data(j)
        }
      centers(c) = next.clone()
      i = 0
      while (i < n) { val d = dist2(data(i), next); if (d < d2(i)) d2(i) = d; i += 1 }
      c += 1
    }
    // Lloyd
    val assign = Array.fill(n)(-1)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val anyMoved = new java.util.concurrent.atomic.AtomicBoolean(false)
      java.util.stream.IntStream.range(0, n).parallel().forEach { p =>
        var best = 0; var bd = Double.MaxValue
        var j = 0
        while (j < k) { val d = dist2(data(p), centers(j)); if (d < bd) { bd = d; best = j }; j += 1 }
        if (assign(p) != best) { assign(p) = best; anyMoved.set(true) }
      }
      moved = anyMoved.get()
      if (moved) {
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Long](k)
        i = 0
        while (i < n) {
          val s = sums(assign(i)); val row = data(i)
          var t = 0
          while (t < dim) { s(t) += row(t); t += 1 }
          counts(assign(i)) += 1
          i += 1
        }
        var j = 0
        while (j < k) {
          if (counts(j) > 0) {
            var t = 0
            while (t < dim) { centers(j)(t) = sums(j)(t) / counts(j); t += 1 }
          }
          j += 1
        }
      }
      iter += 1
    }
    centers
  }

  /** Nearest-centroid list assignment (native expression, nprobe=1). */
  def ivfListId(v: Column, index: IvfIndex): Column =
    element_at(graft.functions.CentroidIds(v, index.centroids, 1), 1)

  /**
   * IVF ANN top-k: corpus assigned to its nearest list once (narrow
   * (vec_id, list_id) rows; at scale written `partitionBy(list_id)` exactly
   * like [[writeBucketed]]); queries probe their `nprobe` nearest lists and
   * re-rank exactly inside them. Probes × queries stays broadcast-small.
   */
  def annTopKIvf(embeddings: DataFrame, queries: DataFrame, index: IvfIndex,
                 k: Int = 5, nprobe: Int = 4): DataFrame = {
    val corpus = embeddings.withColumn("list_id", ivfListId(col("embedding"), index))
    val qs = queries.withColumn("list_id",
      explode(graft.functions.CentroidIds(col("qvec"), index.centroids, nprobe)))
    rerank(corpus.join(broadcast(qs), "list_id"), k)
  }

  /** ANN top-k over [[writeBucketed]] storage with partition-pruned probes.
    * Queries are broadcast-small by contract, so their probe set collects to
    * the driver and prunes statically (no full-scan + post-filter). */
  def annTopKBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int = 5,
                      nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val qs = probedQueries(queries, nPlanes, dim)
    val probeBuckets = qs.select("bucket").distinct().collect().map(_.getLong(0))
    val corpus = spark.read.parquet(path)
      .filter(col("bucket").isin(probeBuckets: _*))
    rerank(corpus.join(broadcast(qs), "bucket"), k)
  }

  /** IVF storage path, the list-partitioned twin of [[writeBucketed]]: corpus
    * written ONCE partitioned by nearest-centroid list, so probe reads prune
    * at the scan. */
  def writeIvf(embeddings: DataFrame, index: IvfIndex, path: String): Unit =
    embeddings.withColumn("list_id", ivfListId(col("embedding"), index))
      .repartition(col("list_id")) // one file per list, not per task×list
      .write.mode("overwrite").partitionBy("list_id").parquet(path)

  /** IVF ANN over [[writeIvf]] storage: each query's `nprobe` nearest lists
    * become STATIC partition filters (queries are broadcast-small by
    * contract), so the scan touches ~nprobe/nLists of the corpus. */
  def annTopKIvfStored(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, index: IvfIndex,
                       k: Int = 5, nprobe: Int = 4): DataFrame = {
    val qs = queries.withColumn("list_id",
      explode(graft.functions.CentroidIds(col("qvec"), index.centroids, nprobe)))
    val probeLists = qs.select("list_id").distinct().collect().map(_.getInt(0))
    val corpus = spark.read.parquet(path)
      .filter(col("list_id").isin(probeLists: _*))
    rerank(corpus.join(broadcast(qs), "list_id"), k)
  }

  // ------------------------------------------------------------------------
  // int8 scalar quantization: the embedding STORAGE story at 100 TB — 4×
  // fewer bytes through scans, caches and shuffles, at a recall cost the
  // tests measure. Symmetric per-vector scaling (q = x * 127 / max|x|),
  // rounding via floor(x + 0.5): round() half-way semantics differ between
  // engines, floor is unambiguous everywhere — so the DuckDB oracle
  // recomputes the quantized vectors and their cosines EXACTLY.
  // ------------------------------------------------------------------------

  /** (vec_id, scale: double, qvec: array<tinyint>) — `scale` is max|x|;
    * dequantized component = qvec[i] * scale / 127. Zero vectors keep
    * scale 0 (qvec all zeros; cosine against them is NaN-guarded by
    * [[dequantized]]'s consumers exactly as for raw zero vectors). */
  def quantizeInt8(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", aggregate(col("v"), lit(0.0d), (acc, x) => greatest(acc, abs(x))))
      .select(col("vec_id"), col("scale"),
        transform(col("v"), x =>
          when(col("scale") === 0.0d, lit(0))
            .otherwise(floor(x * 127.0d / col("scale") + 0.5d).cast("int")))
          .cast("array<tinyint>").as("qvec"))

  /** Dequantized double vector from (scale, qvec). */
  def dequantized(scale: Column, qvec: Column): Column =
    transform(qvec.cast("array<double>"), q => q * scale / 127.0d)

  /**
   * Exact top-k over the QUANTIZED corpus: same shape as [[bruteForceTopK]]
   * (queries broadcast, corpus never shuffled) but the scan reads 1/4 the
   * vector bytes; cosine runs on the dequantized values. Recall vs the
   * full-precision top-k is measured in tests (≥ ~0.9 at int8 on the
   * driver-provided embeddings); the decision to trade it for 4× IO is the
   * caller's dial.
   */
  def bruteForceTopKQuantized(quantized: DataFrame, queries: DataFrame,
                              k: Int = 5): DataFrame = {
    // zero vectors score the SENTINEL -2.0 (below any cosine) instead of
    // 0/0 = NaN: Spark ranks NaN FIRST under DESC while DuckDB's
    // list_cosine_similarity returns -1 for zero vectors — an undefined
    // cosine must sort LAST identically on both sides or a zero vector in a
    // refreshed fixture would flip the oracle from pass to fail
    val qs = queries.select(col("query_id"), col("qvec"),
      aggregate(col("qvec").cast("array<double>"), lit(0.0d),
        (acc, x) => greatest(acc, abs(x))).as("qmax"))
    val scored = quantized.withColumnRenamed("qvec", "q8") // queries carry "qvec"
      .crossJoin(broadcast(qs))
      .select(col("query_id"), col("vec_id"),
        when(col("scale") === 0.0d || col("qmax") === 0.0d, lit(-2.0d))
          .otherwise(round(cosine(dequantized(col("scale"), col("q8")), col("qvec")), 6))
          .as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Scale-folded int8 top-k — the production scorer for the quantized path:
   * the per-vector scale CANCELS out of the cosine
   * (`cos(q8·s/127, q) = Σ q8ᵢqᵢ / (|q8|·|q|)`), so per (row × query) pair
   * the kernel is one integer-valued dot product — no dequantization, no
   * per-pair multiply by scale — and the corpus-side norm |q8| is staged
   * ONCE per row before the cross join (the same stage-before-join rule as
   * [[adcTopKPq]]'s norm table). Mathematically identical ranking to
   * [[bruteForceTopKQuantized]]; floating-point summation order differs, so
   * rounded cosines may drift in the last digit — the equivalence test
   * bounds it.
   */
  def bruteForceTopKQuantizedFolded(quantized: DataFrame, queries: DataFrame,
                                    k: Int = 5): DataFrame = {
    // zero vectors (scale 0 ⇒ |q8| = 0, or a zero query) score the sentinel
    // -2.0, same convention as [[bruteForceTopKQuantized]] — never NaN
    // (Spark ranks NaN first under DESC; DuckDB returns -1: both wrong ways)
    val corpus = quantized
      .select(col("vec_id"), col("qvec").cast("array<double>").as("q8"))
      .withColumn("n8",
        sqrt(aggregate(transform(col("q8"), x => x * x), lit(0.0d), (acc, x) => acc + x)))
    val qs = queries
      .select(col("query_id"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("qnorm",
        sqrt(aggregate(transform(col("qv"), x => x * x), lit(0.0d), (acc, x) => acc + x)))
    val dot = aggregate(zip_with(col("q8"), col("qv"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val scored = corpus.crossJoin(broadcast(qs))
      .select(col("query_id"), col("vec_id"),
        when(col("n8") === 0.0d || col("qnorm") === 0.0d, lit(-2.0d))
          .otherwise(round(dot / (col("n8") * col("qnorm")), 6)).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------------
  // Product quantization (PQ): codebook compression — m sub-spaces, k
  // centroids each, one byte code per sub-space (m bytes per vector vs
  // 4·dim; PQ4×8 on dim-64 floats is 64×). The per-subspace assignment
  // reuses the native CentroidIds kernel, so its exact dim-order double
  // arithmetic and first-min tie rule are what the oracle mirrors.
  // ------------------------------------------------------------------------

  /** Deterministic pseudo-random codebooks — the ORACLE configuration (the
    * SQL side inlines exactly these literals; production uses [[trainPq]]). */
  def pqCodebooks(m: Int = 4, k: Int = 8, subDim: Int = 16,
                  seed: Long = 7L): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(m)(Array.fill(k)(Array.fill(subDim)(rng.nextGaussian())))
  }

  /** Production codebooks: per-subspace k-means on the (hash-capped, like
    * [[trainIvf]]) corpus slices. */
  def trainPq(embeddings: DataFrame, m: Int = 4, k: Int = 8, dim: Int = 64,
              seed: Long = 42L, maxTrainRows: Long = 100000L): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(k >= 1 && k <= 127, s"k must fit a byte code: $k (tinyint codes, sign reserved)")
    val subDim = dim / m
    // ONE projection of all m subvector slices, persisted: the m sequential
    // k-means fits would otherwise each re-scan (and re-filter) the corpus
    val sliced = hashCappedSample(embeddings, maxTrainRows, seed)
      .select((0 until m).map(s => array_to_vector(
        slice(col("embedding").cast("array<double>"), s * subDim + 1, subDim)).as(s"f$s")): _*)
      .persist()
    try {
      (0 until m).toArray.map { s =>
        new KMeans().setK(k).setMaxIter(10).setSeed(seed + s)
          .setFeaturesCol(s"f$s").fit(sliced).clusterCenters.map(_.toArray)
      }
    } finally sliced.unpersist(blocking = false)
  }

  /** (vec_id, codes: array<tinyint> of length m) — m bytes per vector.
    * Codebook shape is validated here: centroid counts beyond 127 would wrap
    * the tinyint cast SILENTLY (ids 128.. become negative bytes, and the
    * +1-indexed reconstruction lookup would then index from the array END
    * instead of erroring). The embedding dim must equal m·subDim — enforced
    * PER ROW (a longer embedding would silently encode only its first dims,
    * and the reconstruction/cosine downstream would null out against the
    * full-length query vector; a mis-dialed caller must fail loudly). */
  def pqEncode(embeddings: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame =
    withPqCodes(embeddings, codebooks).select("vec_id", "codes")

  /** [[pqEncode]] keeping every input column (the composed IVF+PQ index build
    * derives list_id and codes from ONE corpus scan). */
  def withPqCodes(embeddings: DataFrame,
                  codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(b => b.nonEmpty && b.length <= 127),
      "each PQ codebook needs 1..127 centroids (codes are signed bytes)")
    val subDim = codebooks(0)(0).length
    require(codebooks.forall(_.forall(_.length == subDim)),
      "PQ codebooks must share one subvector dimension")
    val m = codebooks.length
    val dim = m * subDim
    // dim check staged through its own projection so the raise_error branch
    // exists ONCE in the plan, not inlined into each of the m slices
    // (CollapseProject leaves multi-referenced non-cheap aliases staged)
    val checked = embeddings.withColumn("embedding",
      when(size(col("embedding")) === dim, col("embedding"))
        .otherwise(raise_error(format_string(
          s"pqEncode: embedding size %s != m*subDim = $dim",
          size(col("embedding")).cast("string")))))
    checked.withColumn("codes",
      array(codebooks.indices.map { s =>
        element_at(graft.functions.CentroidIds(
          slice(col("embedding"), s * subDim + 1, subDim), codebooks(s), 1), 1)
      }: _*).cast("array<tinyint>"))
  }

  /** Reconstructed double vector from PQ codes (codebook lookup per subspace). */
  def pqReconstructed(codes: Column, codebooks: Array[Array[Array[Double]]]): Column =
    concat(codebooks.indices.map { s =>
      element_at(typedLit(codebooks(s).map(_.toSeq).toSeq),
        element_at(codes, s + 1).cast("int") + 1)
    }: _*)

  /** REFERENCE implementation: top-k over full PQ reconstructions. Each
    * corpus row rebuilds a dim-length double vector before the cosine — at
    * 100 TB that negates most of the 64× byte win in compute and memory, so
    * production scoring is [[adcTopKPq]] (same ranking, m table lookups per
    * row); this path remains the semantics anchor the ADC equivalence test
    * compares against. */
  def bruteForceTopKPq(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
                       queries: DataFrame, k: Int = 5): DataFrame = {
    // reconstruction staged ONCE per corpus row, before the broadcast cross
    // join — inlined it would re-run per (row × query) pair
    val recon = codes.select(col("vec_id"),
      pqReconstructed(col("codes"), codebooks).as("dv"))
    val scored = recon.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("dv"), col("qvec")), 6).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------------
  // PQ ADC (asymmetric distance computation) — the production PQ scorer:
  // cos(recon(codes), q) decomposes over subspaces,
  //   dot   = Σ_s dot(codebook_s[code_s], q_slice_s)   → per-QUERY lookup table
  //   |recon|² = Σ_s |codebook_s[code_s]|²             → query-INDEPENDENT table
  // so scoring a corpus row costs 2m table lookups + one divide — the codes
  // are never expanded back to dim-length vectors (the round-4 verdict's
  // scale defect in the reconstruction path).
  // ------------------------------------------------------------------------

  /** Per-subspace squared centroid norms, driver-computed in SEQUENTIAL dim
    * order (the q_ann_pq_adc oracle inlines exactly these double literals —
    * a different summation order could flip a round(·,6) digit). */
  def pqNorm2(codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebooks.map(_.map(_.foldLeft(0.0d)((acc, x) => acc + x * x)))

  /**
   * ADC top-k over PQ codes: per query, one m×kc lookup table of subspace
   * dot products (built once on the broadcast-small query side); per corpus
   * row, m dot lookups + m norm² lookups (the norm table is staged BEFORE
   * the cross join — it is query-independent). The scan reads m bytes of
   * codes per vector and nothing is reconstructed. Ranking is provably equal
   * to [[bruteForceTopKPq]] up to floating-point summation order (asserted
   * by the equivalence test; both paths round to 6 digits before ranking).
   */
  def adcTopKPq(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
                queries: DataFrame, k: Int = 5): DataFrame = {
    val scored = adcScored(codes, codebooks, queries)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** (query_id, vec_id, cos) for every (corpus row × query) via ADC. */
  private def adcScored(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
                        queries: DataFrame): DataFrame =
    withAdcLuts(codes, codebooks)
      .crossJoin(broadcast(adcQueries(queries, codebooks)))
      .select(col("query_id"), col("vec_id"), adcCos(codebooks.length).as("cos"))

  /** Corpus side: stage the per-row reconstruction norm² (m lookups in the
    * query-independent table) before any join. Keeps all input columns. */
  private def withAdcLuts(codes: DataFrame,
                          codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val norm2 = pqNorm2(codebooks)
    codes.withColumn("n2",
      codebooks.indices.map(s =>
        element_at(typedLit(norm2(s).toSeq),
          element_at(col("codes"), s + 1).cast("int") + 1)).reduce(_ + _))
  }

  /** Query side: slices staged first (HOF rule — a slice inside the transform
    * lambda would re-slice per centroid), then one dot-product LUT per
    * subspace plus the query norm. Broadcast-small by contract. */
  private def adcQueries(queries: DataFrame,
                         codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val sliced = queries
      .select(col("query_id"), col("qvec").cast("array<double>").as("qv"))
      .select(col("query_id") +: col("qv") +:
        (0 until m).map(s => slice(col("qv"), s * subDim + 1, subDim).as(s"qs$s")): _*)
    sliced.select(
      col("query_id") +:
        sqrt(aggregate(transform(col("qv"), x => x * x),
          lit(0.0d), (acc, x) => acc + x)).as("qnorm") +:
        (0 until m).map { s =>
          transform(typedLit(codebooks(s).map(_.toSeq).toSeq),
            cen => aggregate(zip_with(cen, col(s"qs$s"), (x, y) => x * y),
              lit(0.0d), (acc, x) => acc + x)).as(s"lut$s")
        }: _*)
  }

  /** ADC cosine from staged columns: m dot lookups, left-assoc sums — the
    * exact arithmetic the oracle mirrors. */
  private def adcCos(m: Int): Column = {
    val dot = (0 until m).map(s =>
      element_at(col(s"lut$s"), element_at(col("codes"), s + 1).cast("int") + 1))
      .reduce(_ + _)
    round(dot / (sqrt(col("n2")) * col("qnorm")), 6)
  }

  // ------------------------------------------------------------------------
  // Composed production ANN: IVF probe → PQ-ADC shortlist → exact re-rank.
  // The deployment shape at 100 TB: the scan prunes to nprobe/nLists of the
  // corpus (list-partitioned storage), ADC ranks the pruned lists reading m
  // bytes/vector, and only queries×shortlist full vectors are ever fetched
  // for the exact pass.
  // ------------------------------------------------------------------------

  /**
   * IVF+PQ+exact composed top-k.
   *  1. corpus index rows (vec_id, list_id, codes) from ONE scan — at scale
   *     written once `partitionBy(list_id)` exactly like [[writeIvf]];
   *  2. each query probes its `nprobe` nearest lists; candidates are ADC-
   *     scored (2m lookups/row) and cut to `shortlist` per query;
   *  3. the shortlist's FULL vectors are fetched (broadcast-small id set →
   *     point lookups at scale) and exactly re-ranked to top-k.
   * With nprobe = nLists and shortlist ≥ corpus this is provably exact brute
   * force — the q_ann_ivf_pq oracle configuration; partial-dial recall is
   * measured on clustered data in tests and at 50k scale in SketchDialsProbe.
   */
  def annTopKIvfPqExact(embeddings: DataFrame, queries: DataFrame, index: IvfIndex,
                        codebooks: Array[Array[Array[Double]]], k: Int = 5,
                        nprobe: Int = 4, shortlist: Int = 64): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val indexRows = withPqCodes(embeddings, codebooks)
      .withColumn("list_id", ivfListId(col("embedding"), index))
      .select("vec_id", "list_id", "codes")
    composedTier(indexRows, embeddings.select(col("vec_id"), col("embedding")),
      queries, index, codebooks, k, nprobe, shortlist)
  }

  /** Shared ADC-shortlist → exact-re-rank tail of the composed tier. */
  private def composedTier(indexRows: DataFrame, vectors: DataFrame,
                           queries: DataFrame, index: IvfIndex,
                           codebooks: Array[Array[Array[Double]]], k: Int,
                           nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    // query side: ADC LUTs + exploded nprobe probes, broadcast once
    val qs = adcQueries(queries, codebooks)
      .join(queries.select(col("query_id"),
        explode(graft.functions.CentroidIds(
          col("qvec").cast("array<double>"), index.centroids, nprobe)).as("list_id")),
        "query_id")
    val adc = withAdcLuts(indexRows, codebooks)
      .join(broadcast(qs), "list_id")
      .select(col("query_id"), col("vec_id"), adcCos(codebooks.length).as("adc_cos"))
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("adc_cos").desc, col("vec_id").asc)
    val short = adc.withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "vec_id")
    // exact re-rank of the shortlist only: vectors ride no exchange — the
    // corpus scan is filtered by the broadcast shortlist id set
    val fetched = vectors
      .join(broadcast(short), "vec_id")
      .join(broadcast(queries), "query_id")
    rerank(fetched, k)
  }

  // ------------------------------------------------------------------------
  // Stored-index METADATA: the trained coarse centroids + PQ codebooks are
  // part of the index — without them, [[writeIvfPq]] storage is queryable
  // only by the session that trained them (a fresh session would have to
  // RETRAIN, and retrained quantizers do not reproduce the stored codes).
  // They persist as a parquet sidecar under `path/_index_meta` (leading
  // underscore → invisible to the data scan, exactly like `_metadata`),
  // versioned by a content hash so an ingest under the WRONG quantizers —
  // whose codes would silently mis-rank against the stored ones — fails
  // loudly instead.
  // ------------------------------------------------------------------------

  /** Assignment-distance stats over a (sampled) vector set: the index's
    * fit to a distribution, comparable across batches ([[ivfDrift]]). */
  final case class AssignStats(meanDist: Double, p95Dist: Double, n: Long)

  /** A stored index's quantizers, loaded back via [[readIndexMeta]];
    * `trainStats` = [[assignStats]] of the training corpus at build time
    * (None only for indexes written before drift detection existed). */
  final case class IvfPqMeta(index: IvfIndex,
                             codebooks: Array[Array[Array[Double]]],
                             version: String,
                             trainStats: Option[AssignStats] = None)

  /** Content-derived index version: md5 over the exact centroid/codebook
    * double BITS in canonical order — same quantizers ⇒ same version in any
    * session/process; any retrain ⇒ a different one. */
  def indexVersion(index: IvfIndex,
                   codebooks: Array[Array[Array[Double]]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(8)
    def put(d: Double): Unit = {
      buf.clear(); buf.putLong(java.lang.Double.doubleToLongBits(d))
      md.update(buf.array())
    }
    md.update(s"ivf:${index.centroids.length}:".getBytes("UTF-8"))
    index.centroids.foreach { c => md.update(s"${c.length};".getBytes("UTF-8")); c.foreach(put) }
    md.update(s"pq:${codebooks.length}:".getBytes("UTF-8"))
    codebooks.foreach { b =>
      md.update(s"${b.length};".getBytes("UTF-8"))
      b.foreach { c => md.update(s"${c.length};".getBytes("UTF-8")); c.foreach(put) }
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  private def metaDir(path: String) = s"$path/_index_meta"

  // ------------------------------------------------------------------------
  // Index DRIFT detection — "retrain only when drift warrants a rebuild" as
  // an executable signal, not prose: the sidecar records the training
  // corpus's assignment-distance stats, and each ingest batch compares its
  // own stats against them. One narrow scan over a hash-capped sample per
  // check — O(sample), never corpus-sized.
  // ------------------------------------------------------------------------

  /** Deterministic pseudo-random coarse centroids — the ORACLE configuration
    * for [[assignDistances]] (the q_ann_drift SQL inlines exactly these
    * literals; production centroids come from [[trainIvf]]). */
  def ivfCentroidsOracle(nLists: Int = 8, dim: Int = 64,
                         seed: Long = 11L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nLists)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** `(vec_id, list_id, dist)`: nearest-centroid assignment plus the exact
    * squared-L2 distance to it, rounded to 6. The distance arithmetic
    * mirrors the [[graft.functions.CentroidIds]] kernel exactly (sequential
    * dim-order accumulation, first-min ties), so the oracle can recompute
    * every row: zip_with/aggregate fold left like the kernel's `while` sum,
    * and `0.0 + x₁ = x₁` exactly in IEEE. Embedding and centroid are staged
    * through projections BEFORE the lambdas (the HOF-CSE rule). */
  def assignDistances(embeddings: DataFrame, index: IvfIndex): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        ivfListId(col("embedding"), index).as("list_id"))
      .withColumn("cen",
        element_at(typedLit(index.centroids.map(_.toSeq).toSeq), col("list_id") + 1))
      .select(col("vec_id"), col("list_id"),
        round(aggregate(zip_with(col("v"), col("cen"), (a, b) => (a - b) * (a - b)),
          lit(0.0d), (acc, x) => acc + x), 6).as("dist"))

  /** Mean + p95 assignment distance over a hash-capped sample (the
    * [[trainIvf]] sampling rule: distribution SHAPE, uniform in vec_id). */
  def assignStats(embeddings: DataFrame, index: IvfIndex,
                  maxRows: Long = 100000L, seed: Long = 42L): AssignStats = {
    val row = assignDistances(hashCappedSample(embeddings, maxRows, seed), index)
      .agg(avg(col("dist")), expr("percentile(dist, 0.95)"), count(lit(1)))
      .collect().head
    require(row.getLong(2) > 0, "assignStats over an empty vector set")
    AssignStats(row.getDouble(0), row.getDouble(1), row.getLong(2))
  }

  /** Batch-vs-training drift: ratios of the batch's assignment-distance
    * stats to the training-time stats recorded in the index sidecar.
    * `rebuildRecommended` when either ratio clears its dial — a batch the
    * coarse quantizer fits as well as the training corpus keeps appending
    * codes that rank comparably; one it fits much worse is the signal that
    * appended codes are degrading (mean = whole-distribution shift, p95 =
    * a drifted subpopulation the mean would dilute). */
  final case class DriftReport(batch: AssignStats, train: AssignStats,
                               meanRatio: Double, p95Ratio: Double,
                               rebuildRecommended: Boolean)

  def ivfDrift(newVectors: DataFrame, meta: IvfPqMeta,
               meanRatioMax: Double = 1.25, p95RatioMax: Double = 1.5): DriftReport = {
    val train = meta.trainStats.getOrElse(throw new IllegalStateException(
      "index metadata carries no training assignment stats " +
        "(pre-drift-detection index) — rebuild with writeIvfPq to enable ivfDrift"))
    val batch = assignStats(newVectors, meta.index)
    // degenerate training distributions (every training vector ON its
    // centroid → meanDist/p95Dist = 0) must not produce NaN ratios that
    // silently compare false against the thresholds: 0/0 = "no movement"
    // (ratio 1), x/0 = unbounded drift (ratio ∞ ⇒ rebuild) — errs loud
    def ratio(b: Double, t: Double): Double =
      if (t > 0) b / t else if (b == 0) 1.0 else Double.PositiveInfinity
    val mr = ratio(batch.meanDist, train.meanDist)
    val pr = ratio(batch.p95Dist, train.p95Dist)
    DriftReport(batch, train, mr, pr, mr > meanRatioMax || pr > p95RatioMax)
  }

  /** Persist the quantizers next to the index (parquet keeps the doubles
    * bit-exact; JSON text round-trips are where reconstruction drift comes
    * from). One sidecar per index version — written by [[writeIvfPq]]. */
  def writeIndexMeta(spark: org.apache.spark.sql.SparkSession, path: String,
                     index: IvfIndex,
                     codebooks: Array[Array[Array[Double]]],
                     trainStats: Option[AssignStats] = None): Unit = {
    import spark.implicits._
    val ver = indexVersion(index, codebooks)
    val rows: Seq[(String, Int, Int, Seq[Double])] =
      index.centroids.zipWithIndex.toSeq.map { case (c, i) => ("centroid", i, -1, c.toSeq) } ++
        codebooks.zipWithIndex.toSeq.flatMap { case (b, s) =>
          b.zipWithIndex.toSeq.map { case (c, j) => ("codebook", s, j, c.toSeq) }
        } ++
        // auxiliary, NOT part of the version hash: stats describe the
        // training corpus, the version identifies the quantizers
        trainStats.toSeq.map(st =>
          ("stat", 0, -1, Seq(st.meanDist, st.p95Dist, st.n.toDouble)))
    rows.toDF("kind", "s", "c", "values")
      .withColumn("version", lit(ver))
      .coalesce(1).write.mode("overwrite").parquet(metaDir(path))
  }

  /** Load a stored index's quantizers — what makes [[writeIvfPq]] storage
    * queryable from a FRESH session (no retraining; retrained quantizers
    * would not reproduce the stored codes). Verifies the recorded version
    * against a recomputation over the loaded values, so sidecar corruption
    * surfaces here, not as silently wrong neighbors. */
  def readIndexMeta(spark: org.apache.spark.sql.SparkSession,
                    path: String): IvfPqMeta = {
    val p = new org.apache.hadoop.fs.Path(metaDir(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) throw new IllegalStateException(
      s"no index metadata at ${metaDir(path)} — not writeIvfPq storage " +
        "(or written by a pre-metadata version; rebuild with writeIvfPq)")
    val rows = spark.read.parquet(p.toString).collect()
    val version = rows.head.getAs[String]("version")
    def vec(r: org.apache.spark.sql.Row): Array[Double] =
      r.getAs[scala.collection.Seq[Double]]("values").toArray
    val centroids = rows.filter(_.getAs[String]("kind") == "centroid")
      .sortBy(_.getAs[Int]("s")).map(vec)
    val codebooks = rows.filter(_.getAs[String]("kind") == "codebook")
      .groupBy(_.getAs[Int]("s")).toArray.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getAs[Int]("c")).map(vec) }
    val trainStats = rows.find(_.getAs[String]("kind") == "stat").map(vec)
      .map(v => AssignStats(v(0), v(1), v(2).toLong))
    val meta = IvfPqMeta(IvfIndex(centroids), codebooks, version, trainStats)
    val recomputed = indexVersion(meta.index, meta.codebooks)
    require(recomputed == version,
      s"index metadata at $path is corrupt: recorded version $version, content hashes to $recomputed")
    meta
  }

  /** Composed-tier STORAGE path: corpus written ONCE (as ingest batch 0)
    * partitioned by IVF list with the PQ codes AND the full vector in-file.
    * Columnar projection makes both tier reads cheap: ADC touches only the
    * (vec_id, codes) columns of probed partitions; the exact re-rank
    * re-reads only (vec_id, embedding) of the broadcast-small shortlist id
    * set. Layout: `path/batch_id=N/list_id=L/` — the batch level makes
    * incremental ingest ([[appendIvfPq]]) idempotent; list_id remains a
    * partition column, so probe pruning is unaffected. A FULL REBUILD:
    * clears any existing index first (prior batches were coded under a
    * possibly-different quantizer version and would silently mis-rank),
    * then persists the quantizers as the versioned `_index_meta` sidecar
    * ([[writeIndexMeta]]) so a fresh session can query and append without
    * retraining. */
  def writeIvfPq(embeddings: DataFrame, index: IvfIndex,
                 codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    val spark = embeddings.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    // training-time assignment stats ride along so every later ingest batch
    // can run [[ivfDrift]] against them
    writeIndexMeta(spark, path, index, codebooks,
      trainStats = Some(assignStats(embeddings, index)))
    appendIvfPq(embeddings, index, codebooks, path, batchId = 0L)
  }

  /** Incremental index INGEST: a new batch of vectors lands in existing
    * [[writeIvfPq]] storage — list assignment + PQ codes are computed for
    * the BATCH only; the historical index is never rewritten (the
    * daily-increment shape; retrain the coarse/PQ quantizers only when
    * drift warrants a rebuild — which is [[writeIvfPq]], a new version).
    * ASSERTS the caller's quantizers match the stored index version: an
    * append under retrained quantizers would interleave incomparable codes
    * and silently corrupt every subsequent top-k. IDEMPOTENT: each batch
    * OVERWRITES its own `batch_id=N` subtree, so a retried/replayed ingest
    * job rewrites instead of appending duplicate index rows (duplicate
    * vec_ids would silently crowd genuine neighbors out of stored top-k
    * results — the re-rank has no dedup because candidates are unique by
    * construction). */
  def appendIvfPq(newVectors: DataFrame, index: IvfIndex,
                  codebooks: Array[Array[Array[Double]]], path: String,
                  batchId: Long): Unit = {
    val stored = readIndexMeta(newVectors.sparkSession, path)
    val caller = indexVersion(index, codebooks)
    require(stored.version == caller,
      s"appendIvfPq under WRONG quantizers: index at $path is version " +
        s"${stored.version}, caller supplied $caller — load them with " +
        "readIndexMeta, or rebuild with writeIvfPq")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(newVectors.sparkSession.sessionState.newHadoopConf())
    val w = compactedThrough(fs, path)
    require(batchId > w,
      s"appendIvfPq batch_id=$batchId is already folded into this index by " +
        s"compaction (compacted through $w) — the per-batch overwrite that made " +
        "replays idempotent no longer covers it, so re-ingesting would DUPLICATE " +
        "rows; replay under a fresh batch id or rebuild with writeIvfPq")
    // one task per list before the partitioned write: without this each of
    // the batch's input partitions writes a file into EVERY list dir it
    // touches (parallelism × nLists tiny files per batch — measured 6k+
    // files after 12 daily appends in CompactionProbe); with it a batch
    // adds ~1 file per list
    withPqCodes(newVectors, codebooks)
      .withColumn("list_id", ivfListId(col("embedding"), index))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$path/batch_id=$batchId")
  }

  // ------------------------------------------------------------------------
  // Index COMPACTION — the steady-state small-files dial. After D daily
  // appendIvfPq drops every probed list holds >= D file sets, and probe
  // cost becomes files-opened, not bytes. Compaction folds all batches
  // into one subtree with ~1 file per list.
  // ------------------------------------------------------------------------

  /** Highest batch id folded into the index by compaction (-1 = none).
    * [[appendIvfPq]] refuses batch ids at or below it. */
  def compactedThrough(fs: org.apache.hadoop.fs.FileSystem, path: String): Long =
    graft.icelite.FoldSwap.compactedThrough(fs, path)

  /** Steady-state index MAINTENANCE: fold every `batch_id=N` subtree into a
    * single `batch_id=<maxId>` with ~one file per list, then advance the
    * `_compacted_through` watermark so [[appendIvfPq]] fails LOUDLY on a
    * replay of a folded batch (its per-batch-overwrite idempotence no
    * longer covers it — a silent re-ingest would duplicate rows and crowd
    * genuine neighbors out of every stored top-k). Appends with ids above
    * the watermark are untouched, including ones racing the compaction.
    * Crash safety (staging, commit-point watermark, rerun recovery) is
    * [[graft.icelite.FoldSwap]]'s contract. `failAt` is its TEST-ONLY
    * failpoint. Returns the watermark. */
  def compactIvfPq(spark: org.apache.spark.sql.SparkSession, path: String,
                   failAt: Option[String] = None): Long = {
    // fold only COMMITTED batches (the dir's _SUCCESS marker — appendIvfPq
    // is a single overwrite write): an append interrupted mid-write is
    // recovered by REPLAYING its batch id, and folding its partial rows
    // would bake them in while the watermark refuses exactly that replay.
    // Maximal committed prefix keeps the fold set downward-closed.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    graft.icelite.FoldSwap.compact(spark, path, "batch_id=",
      selectFoldable = ids => ids.sorted.takeWhile(id =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/batch_id=$id/_SUCCESS"))),
      stage = (tmp, _, target) => {
        // key-aligned shuffle ⇒ each list's rows in one task ⇒ one file
        // per list after the fold
        spark.read.parquet(path)
          .filter(col("batch_id") <= target).drop("batch_id")
          .repartition(col("list_id"))
          .write.partitionBy("list_id").parquet(tmp)
      },
      failAt = failAt)
  }

  /** Composed tier over [[writeIvfPq]] storage: each query's `nprobe` lists
    * become STATIC partition filters (queries broadcast-small by contract),
    * so the ADC scan touches ~nprobe/nLists of the corpus — the twin of
    * [[annTopKIvfStored]] with the PQ shortlist in between. */
  def annTopKIvfPqStored(spark: org.apache.spark.sql.SparkSession, path: String,
                         queries: DataFrame, index: IvfIndex,
                         codebooks: Array[Array[Array[Double]]], k: Int = 5,
                         nprobe: Int = 4, shortlist: Int = 64): DataFrame = {
    // heal an interrupted-but-committed compaction before partition
    // discovery — otherwise a crash inside the fold's swap window would
    // serve a top-k silently missing every folded batch until the next
    // maintenance compactIvfPq
    graft.icelite.FoldSwap.ensureRecovered(spark, path, "batch_id=")
    val probeQs = queries.select(
      explode(graft.functions.CentroidIds(
        col("qvec").cast("array<double>"), index.centroids, nprobe)).as("list_id"))
    val probeLists = probeQs.distinct().collect().map(_.getInt(0))
    val stored = spark.read.parquet(path).filter(col("list_id").isin(probeLists: _*))
    composedTier(stored.select("vec_id", "list_id", "codes"),
      stored.select("vec_id", "embedding"), queries, index, codebooks,
      k, nprobe, shortlist)
  }
}
