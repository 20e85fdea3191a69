package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (extension surface,
  * SURVEY.md §2.12): brute-force cosine top-k as the exact baseline, and
  * a sign-LSH bucketed variant as the scale path.
  *
  * Vectors are `array<float>`; all arithmetic is widened to double and
  * folded in index order so the DuckDB oracle reproduces scores
  * bit-for-bit. Pure higher-order-function expressions — no UDFs.
  */
object Similarity {

  /** Dot product: sequential left fold over zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity; 0.0 for zero vectors. Lowered to the native
    * codegen expression [[graft.functions.CosineSimilarity]] — one fused
    * loop inside whole-stage codegen instead of three higher-order-
    * function folds. Bit-identical to [[cosineHof]] (asserted in
    * FunctionsSpec) and to the DuckDB oracle. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** The higher-order-function form of [[cosine]] — the executable
    * specification the native expression is tested against. Works on any
    * numeric array type (the native form is array<float> only). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    *
    * Scale shape: the query set is broadcast (it is the small side by
    * construction); the corpus is scanned once with no shuffle of raw
    * vectors, and the only shuffle carries (query, candidate, score)
    * rows for the per-query top-k window. For corpus-×-corpus jobs use
    * [[lshTopK]] instead.
    *
    * `excludeSelf` (default true) drops candidates whose id EQUALS the
    * query id — right when queries are drawn from the corpus. Pass false
    * when the two frames are different tables whose id spaces merely
    * coincide numerically, or legitimate matches vanish. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus
      .select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * first md5 hex nibble of "p_d" mapped to [-7.5, 7.5]. Computed
    * driver-side and embedded as a literal — the oracle computes the
    * identical md5 nibble in SQL, and the previous in-plan form cost
    * planes×dim md5 evaluations PER ROW for what is a constant. */
  private def planeWeight(plane: Int, d: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$d".getBytes("UTF-8"))
    ((digest(0) >> 4) & 0xf).toDouble - 7.5
  }

  /** Sign-LSH bucket id: one bit per hyperplane = sign of the projection
    * of the vector on a deterministic pseudo-random plane. The plane
    * weights are literal arrays (constants), so a row costs exactly
    * planes×dim fused multiply-adds inside codegen.
    *
    * `planeOffset` selects an independent plane set (table t uses offset
    * t·planes) — the multi-table LSH recall lever: each table's buckets
    * are drawn from disjoint hyperplanes, so a near pair split by one
    * table's cuts has an independent chance to collide in another. */
  def lshBucket(vec: Column, planes: Int, dim: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val weights = array((0 until dim).map(d => lit(planeWeight(p + planeOffset, d))): _*)
      val proj = aggregate(
        zip_with(vec, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    // fail fast on a dim mismatch: zip_with pads the short side with
    // NULLs, NULL poisons the projection sum, and when(NULL >= 0)
    // otherwise(0) would silently drop EVERY vector into bucket 0 —
    // zero recall (capped paths) or one quadratic bucket (uncapped).
    // A NULL vector gets its own branch: size(NULL) is NULL, so the
    // dim-mismatch message would misleadingly read "got null" — raise a
    // distinct, attributable error instead (callers filter null
    // embeddings before bucketing; silently propagating NULL would park
    // them all in one NULL bucket downstream).
    when(vec.isNull, raise_error(lit(
        "lshBucket: null embedding vector (filter null vectors before bucketing)")))
      .when(size(vec) === dim, bits.reduce(_ + _))
      .otherwise(raise_error(concat(
        lit(s"lshBucket: expected $dim-dim vector, got "), size(vec).cast("string"))))
  }

  /** A built IVF index: the persisted per-vector centroid ranking that
    * assignment and probe both consume. Hold the handle to control the
    * cache — [[unpersist]] releases the blocks when the index is no
    * longer queried (a long-lived session that rebuilds indexes without
    * releasing them accumulates cached blocks until eviction pressure). */
  final case class IvfIndex private[ext] (ranked: DataFrame, nprobe: Int) {
    def unpersist(blocking: Boolean = false): Unit = {
      ranked.unpersist(blocking); ()
    }
  }

  /** Deterministic centroid stand-in: the corpus rows with
    * `id < nCentroids`. Oracle-reproducible (no training job), which is
    * why the verified query surface uses it; production swaps in
    * [[kmeansCentroids]] with every downstream stage unchanged. */
  def standinCentroids(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      nCentroids: Int): DataFrame =
    corpus.filter(col(corpusId) < nCentroids)
      .select(col(corpusId).cast("long").as("cid"), col(corpusVec).as("center"))

  /** Trained centroids via MLlib k-means (fixed seed): the production
    * centroid source for [[ivfTopK]]. The fit is one distributed job over
    * the corpus (`array_to_vector` keeps the conversion in codegen); the
    * k centers come back to the driver — k·dim floats, tiny — and ship
    * as a broadcastable two-column frame matching [[standinCentroids]]'s
    * shape. Not oracle-expressible (iterative training), so the verified
    * query keeps the stand-in; recall vs brute force is spec-asserted. */
  def kmeansCentroids(
      corpus: DataFrame, vecField: String, k: Int,
      maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(array_to_vector(col(vecField)).as("features"))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").fit(feats)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat)) }
      .toDF("cid", "center")
  }

  /** Per-dimension embedding health profile — the probe to read BEFORE
    * committing a PQ codebook, a Matryoshka cut, or a [[pcaBasis]]
    * budget: per dim `n, mean, variance, min_val, max_val, zero_frac`.
    * Dead dims (variance ≈ 0, zero_frac ≈ 1) waste PQ bits; exploding
    * dims dominate unnormalized distance; a nonzero mean says cosine
    * and euclidean will disagree. Determinism: values quantize to
    * `1/scale` (default 1e-7 — well beyond float32's mantissa at unit
    * magnitude) and the sufficient statistics Σq, Σq² sum as
    * decimal(38,0)/HUGEINT — order-independent, the money doctrine —
    * with mean/variance a fixed IEEE dag over them; min/max are exact
    * picks. One posexplode + one |dims|-key hash-agg. */
  def embeddingProfile(vecField: String, scale: Long = 10000000L)(
      df: DataFrame): DataFrame = {
    require(scale >= 1L, s"scale must be >= 1, got $scale")
    val sd = scale.toDouble
    df.select(posexplode(col(vecField)).as(Seq("dim", "__xf")))
      .select(col("dim"), col("__xf").cast("double").as("__x"))
      .withColumn("__q", round(col("__x") * sd, 0).cast("long"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("__q").cast("decimal(38,0)")).as("__sq"),
        sum((col("__q").cast("decimal(19,0)") *
          col("__q").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("__sq2"),
        min(col("__x")).as("min_val"), max(col("__x")).as("max_val"),
        count(when(col("__q") === 0L, 1)).as("__z"))
      .select(col("dim"), col("n"),
        (col("__sq").cast("double") / (col("n").cast("double") * sd))
          .as("mean"),
        ((col("n").cast("double") * col("__sq2").cast("double") -
          col("__sq").cast("double") * col("__sq").cast("double")) /
          (col("n").cast("double") * col("n").cast("double") * sd * sd))
          .as("variance"),
        col("min_val"), col("max_val"),
        (col("__z").cast("double") / col("n")).as("zero_frac"))
      .orderBy("dim")
  }

  /** PCA basis learned from the corpus — the variance-ranked ROTATION
    * that completes the ANN preprocessing family: [[matryoshkaTopK]]
    * truncates leading dims and [[graft.functions.FwhtRotate]] spreads
    * energy uniformly; PCA makes the leading dims the RIGHT ones for
    * arbitrary embeddings, so prefix truncation (Matryoshka on models
    * that were never Matryoshka-trained) and per-subspace PQ codebooks
    * spend their budget on real variance. Training-side by the
    * [[kmeansCentroids]] precedent: the covariance reduction runs
    * distributed inside Spark ML's PCA, and only the dim×k basis plus a
    * dim-sized mean land on the driver (bounded model artifacts, the
    * ModelStore class of driver action). Output is a self-contained
    * k-row frame `(comp_id, component float[dim], explained_variance
    * proportion, mu float[dim])` — µ rides along because Spark ML's own
    * transform skips mean-centering (a documented quirk);
    * [[pcaProject]] corrects that. */
  def pcaBasis(corpus: DataFrame, vecField: String, k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    require(k >= 1, s"k must be >= 1, got $k")
    val feats = corpus
      .select(array_to_vector(col(vecField)).as("features"))
    val model = new PCA().setK(k).setInputCol("features")
      .setOutputCol("__p").fit(feats)
    // per-dim mean via ONE dim-keyed hash-agg; the collect is dim-sized
    val mu = corpus
      .select(posexplode(col(vecField)).as(Seq("__d", "__x")))
      .groupBy("__d").agg(avg(col("__x")).as("__m"))
      .orderBy("__d").collect().map(_.getDouble(1).toFloat)
    val pc = model.pc
    val ev = model.explainedVariance
    val spark = corpus.sparkSession
    import spark.implicits._
    (0 until k).map { j =>
      (j.toLong, Array.tabulate(pc.numRows)(i => pc(i, j).toFloat),
        ev(j), mu)
    }.toDF("comp_id", "component", "explained_variance", "mu")
  }

  /** Project vectors onto a [[pcaBasis]]: `out[j] = (v − µ) · c_j`,
    * j in comp_id order. The basis folds to ONE broadcast row (the
    * [[centroidAssign]] shape) and the projection is a per-row HOF
    * loop — zero shuffle of the vector column, k·dim multiply-adds per
    * row. Mean-centering included (full PCA semantics, unlike Spark
    * ML's transform). Output column is `array<float>`, ready for the
    * downstream rungs (prefix truncation, PQ encode, sign sketches). */
  def pcaProject(vecField: String, basis: DataFrame,
      outField: String = "pca")(df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.bind
    val basisArr = basis.agg(
      array_sort(collect_list(struct(col("comp_id"),
        transform(col("component"), _.cast("double")).as("c"))))
        .as("__comps"),
      first(transform(col("mu"), _.cast("double"))).as("__mu"))
    val proj = bind(transform(col(vecField), _.cast("double"))) { v =>
      bind(zip_with(v, col("__mu"), (x, m) => x - m)) { cv =>
        transform(col("__comps"), comp =>
          aggregate(zip_with(cv, comp.getField("c"), (x, c) => x * c),
            lit(0.0), (a, b) => a + b).cast("float"))
      }
    }
    df.crossJoin(broadcast(basisArr))
      .withColumn(outField, proj)
      .drop("__comps", "__mu")
  }

  /** Build an IVF index: one pass over the corpus against the broadcast
    * centroids ranks each vector's centroids by cosine (deterministic
    * tie-break) — rank 1 is the cell assignment and ranks ≤ nprobe the
    * probed cells, so a single window over one shuffle serves both
    * roles. The ranking persists (MEMORY_AND_DISK): a real IVF index is
    * built once, not recomputed per consumer. persist, not
    * localCheckpoint — lazy, and lineage stays intact so lost executors
    * recompute their blocks instead of failing the query.
    *
    * `centroids` is any (cid, center) frame: [[standinCentroids]] or
    * [[kmeansCentroids]]. Release the cache via [[IvfIndex.unpersist]]. */
  def ivfBuild(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: DataFrame, nprobe: Int): IvfIndex = {
    import org.apache.spark.sql.expressions.Window
    val base = corpus.select(col(corpusId).as("__id"), col(corpusVec).as("__v"))
    val cents = broadcast(centroids.select(
      col(centroids.columns(0)).as("__cid"),
      col(centroids.columns(1)).as("__cv")))
    val ranked = base.crossJoin(cents)
      .withColumn("__cs", cosine(col("__v"), col("__cv")))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("__id").orderBy(col("__cs").desc, col("__cid").asc)))
      .filter(col("__pr") <= math.max(nprobe, 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // clamp here too: a raw nprobe <= 0 would make ivfQuery's
    // __pr <= nprobe filter silently empty after paying the build cost
    IvfIndex(ranked, math.max(nprobe, 1))
  }

  /** Persist a built IVF index through the store layer: the ranked
    * centroid table ([[ivfBuild]]'s one crossJoin+window output —
    * assignments at rank 1, probe cells at rank ≤ nprobe, per-centroid
    * cosines included) lands as `<name>_ranked` and the probe width as
    * a one-row `<name>_meta` object. A real IVF index is built once
    * and OUTLIVES the session — at 100 TB the index is a stored table
    * exactly like the MinHash signature index
    * ([[Dedup.minhashIndexRows]]), not a cache entry: [[ivfLoad]]
    * answers queries with zero recompute (no centroid scoring, no
    * crossJoin — spec-pinned), and a cluster restart costs one parquet
    * scan, not a rebuild. Any [[graft.sources.DataStore]] backend
    * works; parquet gives the ranked table columnar scans + pruning. */
  def ivfSave(
      index: IvfIndex, store: graft.sources.DataStore,
      name: String, replace: Boolean = false): Unit = {
    store.create(s"${name}_ranked", index.ranked, replace)
    val spark = store.spark
    import spark.implicits._
    store.create(s"${name}_meta", Seq(index.nprobe).toDF("nprobe"), replace)
  }

  /** Load a persisted IVF index ([[ivfSave]]): the ranked table comes
    * back as a parquet scan (persisted MEMORY_AND_DISK like a fresh
    * build — release via [[IvfIndex.unpersist]]); no retraining, no
    * re-ranking. [[ivfQuery]] on the loaded index answers identically
    * to the index that was saved (round-trip spec-pinned). */
  def ivfLoad(store: graft.sources.DataStore, name: String): IvfIndex = {
    val meta = store.getObject(s"${name}_meta").head()
    val ranked = store.getObject(s"${name}_ranked")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfIndex(ranked, meta.getInt(0))
  }

  /** Query an IVF index: probe joins cell-to-cell against the assignment
    * — an equi-join on the cell id, never all-pairs — and exact cosine
    * re-ranks within candidates. */
  def ivfQuery(index: IvfIndex, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assign = index.ranked.filter(col("__pr") === 1)
      .select(col("__cid"), col("__id"), col("__v"))
    val probe = index.ranked.filter(col("__pr") <= index.nprobe)
      .select(col("__id").as("query_id"), col("__v").as("__qv"), col("__cid"))
    probe.join(assign, "__cid")
      .filter(col("query_id") =!= col("__id"))
      .withColumn("cosine", cosine(col("__qv"), col("__v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("__id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__id").as("item_id"), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to [[lshTopK]]: partition the corpus into coarse cells
    * around centroids ([[ivfBuild]]), then search only the `nprobe` cells
    * closest to each query ([[ivfQuery]]).
    *
    * Cost at scale: corpus-linear index build, then per-query work
    * bounded by the population of `nprobe` cells. Recall is tunable via
    * nCentroids/nprobe exactly like any IVF index.
    *
    * Convenience one-shot: the index it builds stays persisted for the
    * session (the result is lazy, so it cannot be released here). Callers
    * managing a long-lived session should use [[ivfBuild]]/[[ivfQuery]]
    * directly and [[IvfIndex.unpersist]] after the last query. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, nCentroids: Int = 8, nprobe: Int = 2,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(
      standinCentroids(corpus, corpusId, corpusVec, nCentroids))
    ivfQuery(ivfBuild(corpus, corpusId, corpusVec, cents, nprobe), k)
  }

  /** IVF operating-point evaluation — recall@k per `nprobe` against the
    * exact brute-force ranking, the tuning table an IVF deployment reads
    * before committing a probe width (the ANN sibling of
    * [[graft.ext.Dedup.lshRecallEval]]). The index is built ONCE at
    * `max(nprobes)` (an [[ivfBuild]] ranking stores every probe depth up
    * to its cap), each narrower width is a rank filter on the same
    * persisted frame, and the brute-force truth over the bounded query
    * set is computed once (the broadcast-queries shape every rerank rung
    * uses — this is an EVAL on a query SAMPLE, like every recall
    * harness). Output per nprobe: `truth_rows` (= |queries|·k when the
    * corpus suffices), `ivf_rows` (pairs the probe width actually
    * returned — short cells return fewer), `hit_rows` (overlap with
    * truth) and `recall` — exact counts, one IEEE division. */
  def ivfRecallEval(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nCentroids: Int, nprobes: Seq[Int],
      centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1), "nprobes >= 1")
    require(nprobes.distinct.length == nprobes.length, "duplicate nprobes")
    val cents = centroids.getOrElse(
      standinCentroids(corpus, corpusId, corpusVec, nCentroids))
    val index = ivfBuild(corpus, corpusId, corpusVec, cents, nprobes.max)
    val qIds = broadcast(
      queries.select(col(queryId).as("query_id")).distinct())
    val assign = index.ranked.filter(col("__pr") === 1)
      .select(col("__cid"), col("__id"), col("__v"))
    def ivfAt(np: Int): DataFrame =
      index.ranked.filter(col("__pr") <= np)
        .join(qIds, index.ranked("__id") === qIds("query_id"))
        .select(col("query_id"), col("__v").as("__qv"), col("__cid"))
        .join(assign, "__cid")
        .filter(col("query_id") =!= col("__id"))
        .withColumn("__cos", cosine(col("__qv"), col("__v")))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("__cos").desc, col("__id").asc)))
        .filter(col("__rk") <= k)
        .select(col("query_id"), col("__id").as("item_id"))
    val brute = bruteForceTopK(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k)
      .select("query_id", "item_id")
      .localCheckpoint() // |queries|·k rows, reused per probe width
    val truth = brute.agg(count(lit(1)).as("truth_rows"))
    val tagged = nprobes.map(np =>
      ivfAt(np).withColumn("nprobe", lit(np))).reduce(_.unionByName(_))
    val spine = tagged.groupBy("nprobe")
      .agg(count(lit(1)).as("ivf_rows"))
    val hits = tagged.join(brute, Seq("query_id", "item_id"))
      .groupBy("nprobe").agg(count(lit(1)).as("__h"))
    spine.join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(truth))
      .select(col("nprobe"), col("truth_rows"), col("ivf_rows"),
        coalesce(col("__h"), lit(0L)).as("hit_rows"),
        when(col("truth_rows") === 0, lit(null).cast("double"))
          .otherwise(coalesce(col("__h"), lit(0L)).cast("double") /
            col("truth_rows")).as("recall"))
      .orderBy("nprobe")
  }

  /** Approximate top-k: candidates share a sign-LSH bucket, then exact
    * cosine re-ranks within buckets. With p planes each table shards the
    * corpus into 2^p buckets; the join key is (table, bucket), so cost is
    * corpus-linear with bucket-local pair generation instead of
    * all-pairs. Recall is tunable two ways: fewer planes = bigger buckets
    * = higher recall per table, and `tables` > 1 unions independent plane
    * sets (disjoint hyperplanes via [[lshBucket]]'s planeOffset) —
    * candidate pairs are deduplicated before the exact-cosine rerank, so
    * extra tables buy recall without re-scoring duplicates. One scan of
    * the corpus computes every table's bucket (posexplode), not one scan
    * per table — the join's two branches share one exchange at runtime
    * (AQE ReusedExchange; verified on the executed plan).
    *
    * Skew: unlike the near-dup pair paths, the bucket join carries no
    * maxBucket cap — dropping a bucket here would drop CANDIDATES (wrong
    * for top-k, which owes every query its k best from the buckets it
    * landed in). A degenerate bucket therefore costs O(|bucket|²)
    * candidate rows; AQE's skew-join split spreads them across tasks
    * rather than one reducer. If the corpus carries masses of identical/
    * zero vectors, dedup them first ([[Dedup.exact]] on the vector) —
    * identical vectors add no top-k information. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      k: Int, planes: Int = 6, dim: Int = 64, tables: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tables >= 1, "tables must be >= 1")
    val buckets = array((0 until tables).map(t =>
      lshBucket(col("__v"), planes, dim, t * planes)): _*)
    val bucketed = corpus
      .select(col(corpusId).as("__id"), col(corpusVec).as("__v"))
      .select(col("__id"), col("__v"), posexplode(buckets))
      .withColumnRenamed("pos", "__t").withColumnRenamed("col", "__bucket")
    val a = bucketed.select(col("__t"), col("__bucket"),
      col("__id").as("query_id"), col("__v").as("__qv"))
    val b = bucketed.select(col("__t"), col("__bucket"),
      col("__id").as("item_id"), col("__v").as("__cv"))
    val joined = a.join(b, Seq("__t", "__bucket"))
      .filter(col("query_id") =!= col("item_id"))
    // multi-table: the same pair can collide in several tables — dedup
    // BEFORE the exact-cosine verify so each candidate is scored once
    // (vectors ride along; every copy of a pair carries identical ones)
    val cands =
      if (tables == 1) joined else joined.dropDuplicates("query_id", "item_id")
    cands
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** Symmetric int8 scalar quantization of an embedding — the standard
    * 4× storage/IO compression for vector search at scale: codes_i =
    * round-half-up(x_i · 127 / max|x|), so codes span [-127, 127] with
    * the per-vector scale implied by the max-magnitude element. The
    * scale itself is NOT materialized because [[quantizedCosine]] never
    * needs it — per-vector scales cancel out of the cosine ratio, which
    * is why quantized cosine is pure integer arithmetic plus one IEEE
    * division (exact cross-engine, no float-fold ordering anywhere).
    * Zero vectors quantize to all-zero codes. floor(x + 0.5) is the
    * shared round-half-up both engines compute identically (their
    * native `round` functions disagree on halves). */
  def quantizeInt8(vec: Column): Column = {
    import graft.functions.GraftFunctions.bind
    // bind: amax referenced once per ELEMENT inside the transform lambda
    // would otherwise recompute the max per element (no CSE across HOFs)
    bind(array_max(transform(vec, x => abs(x.cast("double"))))) { amax =>
      when(amax === 0.0, transform(vec, _ => lit(0)))
        .otherwise(transform(vec, x =>
          floor(x.cast("double") * 127 / amax + 0.5).cast("int")))
    }
  }

  /** Cosine over int8 code arrays ([[quantizeInt8]]): integer dot and
    * norms (exact — addition order free), one double division at the
    * end. 0.0 when either norm is zero. The per-vector quantization
    * scales cancel, so this equals the cosine of the DEQUANTIZED
    * vectors exactly. */
  def quantizedCosine(a: Column, b: Column): Column = {
    import graft.functions.GraftFunctions.bind
    def sq(v: Column): Column =
      aggregate(v, lit(0L), (acc, x) => acc + (x * x).cast("long"))
    val d = aggregate(zip_with(a, b, (x, y) => x * y), lit(0L),
      (acc, x) => acc + x.cast("long"))
    bind(sq(a)) { na =>
      bind(sq(b)) { nb =>
        when(na === 0L || nb === 0L, lit(0.0))
          .otherwise(d.cast("double")
            / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
      }
    }
  }

  /** [[bruteForceTopK]] over int8-quantized codes — the memory-bound
    * form: the corpus scan carries 1-byte codes instead of 4-byte
    * floats (4× less IO, integer dot products), at a small, deterministic
    * ranking perturbation from the rounding (spec measures recall vs the
    * full-precision top-k). Same broadcast-queries / per-query-window
    * shape as the exact form; quantization happens in the scan
    * projection, so nothing full-precision shuffles. */
  def bruteForceTopKQuantized(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    corpus
      .select(col(corpusId).as("item_id"),
        quantizeInt8(col(corpusVec)).as("__cq"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"),
          quantizeInt8(col(queryVec)).as("__qq"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("cosine", quantizedCosine(col("__qq"), col("__cq")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** 64-bit sign sketch of an embedding: bit d set iff `vec[d] >= 0`
    * (IEEE: -0.0 counts positive, NaN never sets a bit) —
    * the 1-bit-per-dimension binarization that compresses a float32
    * vector 32× (one BIGINT per vector). Hamming distance between
    * sketches approximates angular distance (each agreeing sign bit is
    * one agreeing half-space), which makes the sketch table the
    * coarse-ranking structure of [[hammingTopK]]. Pure integer bit
    * arithmetic — exact cross-engine. Dims past 64 are ignored
    * (`dim` ≤ 64); the multi-word generalization is a long-array of
    * these. Lowered to the native codegen kernel
    * ([[graft.functions.SignSketch64]]) — the HOF fold is a
    * CodegenFallback `ArrayAggregate` that pays per-element lambda
    * dispatch on every corpus row; [[signSketchHof]] is the executable
    * spec the kernel is tested bit-identical against. */
  def signSketch(vec: Column, dim: Int = 64): Column =
    graft.functions.GraftFunctions.signSketch64(vec, dim)

  /** Higher-order-function form of [[signSketch]] — the executable
    * specification the native kernel is tested against. The sign test
    * is IEEE `>= 0` (NaN sets no bit, -0.0 does) — NOT Spark SQL's
    * total-order `>=`, which ranks NaN above everything and -0.0 below
    * 0.0; the spec spells the IEEE semantics out via the explicit
    * isnan / equals-zero branches (Spark's `===` treats -0.0 = 0.0).
    * Dimensions past the array length contribute 0 (out-of-range
    * `try_element_at` is NULL — ANSI `element_at` would throw — and
    * NULL falls through to the 0 branch). */
  def signSketchHof(vec: Column, dim: Int = 64): Column = {
    require(dim >= 1 && dim <= 64, s"sketch packs 1..64 dims, got $dim")
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (acc, d) =>
      acc.bitwiseOR(
        when(graft.functions.GraftFunctions.bind(try_element_at(vec, d + 1)) {
            x => !isnan(x) && (x >= lit(0f) || x === lit(0f)) },
          call_function("shiftleft", lit(1L), d)).otherwise(lit(0L))))
  }

  /** Two-stage ANN: coarse-rank every candidate by Hamming distance
    * between 64-bit [[signSketch]]es (popcount of XOR — integer-exact),
    * keep the best `rerank × k` per query, then rerank ONLY those by
    * exact cosine over the original vectors. The memory-bound ladder's
    * bottom rung: the corpus-wide pass touches 8 BYTES per vector
    * (32× less IO than float32, 4× less than int8 codes), and full
    * vectors are read for just the candidate sliver.
    *
    * Scale shape: query sketches broadcast; the sketch scan shuffles
    * only (query, item, hamming) survivors of the per-query window
    * (WindowGroupLimit prunes losers map-side); the rerank joins the
    * TINY candidate set (broadcast) against the corpus, so original
    * vectors never shuffle. Ties: coarse stage (hamming asc, item asc),
    * final (cosine desc, item asc) — both deterministic. */
  def hammingTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, rerank: Int = 10, dim: Int = 64,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus
      .select(col(corpusId).as("item_id"),
        signSketch(col(corpusVec), dim).as("__cs"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"),
          signSketch(col(queryVec), dim).as("__qs"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("hamming",
        call_function("bit_count", col("__cs").bitwiseXOR(col("__qs")))
          .cast("int"))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("hamming").asc, col("item_id").asc)))
      .filter(col("__r") <= k * rerank)
      .select("query_id", "item_id", "hamming")
    corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cand), "item_id")
      .join(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))),
        "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "hamming", "cosine", "rank")
  }

  /** Multi-word sign sketch — the dim > 64 generalization of
    * [[signSketch]]: an `array<bigint>` of ⌈dim/64⌉ words, word w's
    * bit j = sign of element w·64 + j (same IEEE semantics: -0.0
    * positive, NaN never sets a bit). This is the form real text
    * embeddings need — 256-4096 dims compress to 4-64 longs, keeping
    * the 32× IO win of the Hamming coarse pass at production
    * dimensionality. For dim ≤ 64 the single word equals
    * [[signSketch]] bit-for-bit (spec-pinned). Lowered to the native
    * kernel [[graft.functions.SignSketchWide]]; [[signSketchWideHof]]
    * is the executable spec. */
  def signSketchWide(vec: Column, dim: Int): Column =
    graft.functions.GraftFunctions.signSketchWide(vec, dim)

  /** Higher-order-function form of [[signSketchWide]] — the
    * executable specification the native kernel is tested against:
    * one [[signSketchHof]]-style fold per 64-dim word slice, with the
    * in-word bit position rebased to `d - w·64`. Same explicit IEEE
    * sign test (NaN sets no bit, -0.0 does; out-of-range
    * `try_element_at` is NULL → 0 bit). */
  def signSketchWideHof(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val nWords = (dim + 63) / 64
    array((0 until nWords).map { w =>
      val lo = w * 64
      val hi = math.min(dim, lo + 64)
      aggregate(sequence(lit(lo), lit(hi - 1)), lit(0L), (acc, d) =>
        acc.bitwiseOR(
          when(graft.functions.GraftFunctions.bind(try_element_at(vec, d + 1)) {
              x => !isnan(x) && (x >= lit(0f) || x === lit(0f)) },
            call_function("shiftleft", lit(1L), d - lit(lo))).otherwise(lit(0L))))
    }: _*)
  }

  /** Summed-popcount Hamming distance between two multi-word sketches
    * — the dim > 64 generalization of `bit_count(a ^ b)`, lowered to
    * the native kernel [[graft.functions.HammingWords]] (this runs
    * once per (query, candidate) pair — the hottest loop of the
    * ladder). [[hammingWordsHof]] is the executable spec. */
  def hammingWords(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.hammingWords(a, b)

  /** Higher-order-function form of [[hammingWords]] — zip the word
    * arrays, popcount each XOR, sum. (The HOF form silently zips to
    * the SHORTER array on a length mismatch, where the kernel throws
    * — matched lengths are the caller's contract; equal-length parity
    * is what the spec pins.) */
  def hammingWordsHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        call_function("bit_count", x.bitwiseXOR(y)).cast("int")),
      lit(0), (acc, h) => acc + h)

  /** [[hammingTopK]] for dim > 64 — identical two-stage shape (coarse
    * Hamming rank over sketches, exact-cosine rerank over the
    * candidate sliver) with multi-word sketches: the corpus-wide pass
    * touches ⌈dim/64⌉ longs per vector (8 B per 64 dims — still 32×
    * less IO than float32 at ANY dimensionality), full vectors are
    * read for just the `rerank × k` survivors per query, and original
    * vectors never shuffle (the candidate set broadcasts). Same
    * deterministic ties as [[hammingTopK]]. */
  def hammingTopKWide(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, dim: Int, rerank: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = corpus
      .select(col(corpusId).as("item_id"),
        signSketchWide(col(corpusVec), dim).as("__cs"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"),
          signSketchWide(col(queryVec), dim).as("__qs"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("hamming", hammingWords(col("__cs"), col("__qs")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("hamming").asc, col("item_id").asc)))
      .filter(col("__r") <= k * rerank)
      .select("query_id", "item_id", "hamming")
    corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cand), "item_id")
      .join(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))),
        "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "hamming", "cosine", "rank")
  }

  /** Mean-pool embeddings per group — the "chunk → embed → pool" step
    * of document/multimodal pipelines (a document's vector as the mean
    * of its chunk vectors; a class centroid as the mean of its members).
    * Returns (group, dim, mean_val): one row per vector DIMENSION,
    * deliberately exploded so the result is scalar-typed and
    * hash-comparable — reassemble with collect_list over dim downstream
    * if an array is needed.
    *
    * Float summation is not associative, so a naive per-dimension
    * `sum()` would expose partial-aggregation order. The fold is
    * deterministic by construction: vectors collect per group, sort by
    * id, cast to double, and fold left pairwise (`zip_with(_ + _)`)
    * starting FROM THE FIRST VECTOR — and the oracle folds the
    * identically-ordered list with `list_reduce`, pinning the same IEEE
    * addition sequence, so means hash-match bit-for-bit.
    *
    * Scale shape: one hash aggregation; per-group memory is the group's
    * vectors (chunks of one doc / members of one class — bounded by the
    * caller's grouping). All vectors in a group must share a dimension
    * (zip_with nulls on mismatch — surfaces immediately). */
  def meanPool(
      idField: String, vecField: String, groupField: String)(
      df: DataFrame): DataFrame = {
    val grouped = df.groupBy(col(groupField).as("__g"))
      .agg(count(lit(1)).cast("double").as("__n"),
        array_sort(collect_list(struct(col(idField).as("__id"),
          transform(col(vecField), _.cast("double")).as("__v"))))
          .as("__vs"))
    grouped
      .select(col("__g"), col("__n"),
        aggregate(
          slice(col("__vs"), lit(2), size(col("__vs")) - 1),
          element_at(col("__vs"), 1).getField("__v"),
          (acc, x) => zip_with(acc, x.getField("__v"), _ + _)).as("__sum"))
      .select(col("__g").as(groupField),
        posexplode(transform(col("__sum"), v => v / col("__n")))
          .as(Seq("dim", "mean_val")))
      .select(col(groupField), col("dim").cast("long").as("dim"),
        col("mean_val"))
  }

  /** Max-pool companion to [[meanPool]]: per group, the element-wise
    * MAXIMUM over member vectors, one (group, dim, max_val) row per
    * dimension. Unlike the mean, max is exactly order-independent for
    * floats, so no sorted fold is needed — the op is ONE hash
    * aggregation over the exploded (group, dim) stream with map-side
    * partials, no collect_list, no per-group memory proportional to
    * group size. The cheaper default for embarrassing scale; use
    * [[meanPool]] when averaging semantics matter. */
  def maxPool(vecField: String, groupField: String)(df: DataFrame): DataFrame =
    df.select(col(groupField).as("__g"),
        posexplode(col(vecField)).as(Seq("__d", "__v")))
      .groupBy(col("__g"), col("__d"))
      .agg(max(col("__v")).as("__m"))
      .select(col("__g").as(groupField), col("__d").cast("long").as("dim"),
        col("__m").cast("double").as("max_val"))

  /** L2-normalize an embedding to the unit sphere — the pre-ingest
    * step that turns every dot product downstream into cosine (and
    * makes int8 quantization ranges comparable across vectors): each
    * element divides by √(Σx²). The squared-sum fold runs in ARRAY
    * order (a sequential HOF fold, not an aggregation), so the float
    * norm — and therefore every normalized element — is bit-exact
    * cross-engine; elements promote to double for the fold and the
    * division, then round back to float once. Zero (or all-zero)
    * vectors pass through unchanged (no direction to keep); NULL in,
    * NULL out. Pure zero-shuffle projection. */
  def l2Normalize(vec: Column): Column =
    graft.functions.GraftFunctions.bind(vec) { v =>
      val norm = sqrt(aggregate(v, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      when(norm === 0.0, v)
        .otherwise(transform(v, x =>
          (x.cast("double") / norm).cast("float")))
    }

  /** Majority-vote labeling over a precomputed neighbor table — the
    * second half of kNN classification, factored out so ANY top-k
    * engine feeds it: [[bruteForceTopK]] for exactness, [[lshTopK]] /
    * [[ivfTopK]] at corpus scale (the neighbor table is the expensive
    * part; the vote is one hash aggregation over k rows per query).
    *
    * `neighbors` must carry `query_id` and `item_id`; `labels` maps
    * `labelId` → `labelField`. The winner per query is the label with
    * the most neighbor votes, ties broken toward the SMALLEST label
    * (deterministic): one min_by hash-agg over `(-votes, label)` —
    * votes is a count (never null/NaN), so the bare negation is safe.
    * Neighbors without a label row vote for nothing (inner join —
    * matches the "labeled reference set" semantics), and NULL labels
    * are dropped up front: "unlabeled" must not be a candidate a tie
    * election can return (a NULL label would sort FIRST in the min_by
    * struct and beat every real label). */
  def labelVote(
      neighbors: DataFrame, labels: DataFrame,
      labelId: String, labelField: String): DataFrame = {
    val voted = neighbors
      .join(labels.filter(col(labelField).isNotNull)
        .select(col(labelId).as("item_id"),
          col(labelField).as("label")), "item_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    voted
      .groupBy("query_id")
      .agg(min_by(struct(col("label"), col("votes")),
        struct(negate(col("votes")), col("label"))).as("__w"))
      .select(col("query_id"), col("__w.label").as("predicted_label"),
        col("__w.votes").as("votes"))
  }

  /** kNN classification: label each query vector by the majority label
    * of its k nearest corpus neighbors ([[bruteForceTopK]] +
    * [[labelVote]]) — the standard embedding-space labeler for data
    * curation (propagate a small hand-labeled set over a corpus:
    * quality tiers, topics, contamination flags).
    *
    * This convenience form is exact and broadcast-bounded (query side
    * small by construction). At corpus scale, compute neighbors with
    * [[lshTopK]]/[[ivfTopK]] and call [[labelVote]] directly. */
  def knnClassify(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      labelField: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame =
    labelVote(
      bruteForceTopK(corpus, corpusId, corpusVec,
        queries, queryId, queryVec, k),
      corpus, corpusId, labelField)

  /** Per-class mean-embedding centroids as ARRAYS — [[meanPool]]'s
    * deterministic fold (bit-exact cross-engine), reassembled from its
    * exploded (group, dim, mean_val) form. One extra tiny shuffle of
    * |classes| × dim scalar rows — nothing at corpus scale. */
  def classCentroids(
      idField: String, vecField: String, labelField: String)(
      df: DataFrame): DataFrame =
    meanPool(idField, vecField, labelField)(df)
      .groupBy(labelField)
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean_val")))),
        s => s.getField("mean_val")).as("centroid"))

  /** Nearest-centroid assignment: route every vector to the centroid
    * with the highest cosine — topic/cluster assignment for mixing and
    * analysis, and exactly IVF's routing step ([[ivfBuild]]) surfaced
    * as a standalone operator.
    *
    * Scale shape: the centroid set collapses to ONE broadcast row (an
    * id-sorted array of (cid, vector) structs — |classes| entries,
    * provably tiny), so the assignment is a pure per-row argmax fold
    * over that array: the corpus is scanned once with NO shuffle at
    * all — routing a 100 TB corpus is one embarrassingly-parallel
    * projection pass. The join-then-aggregate alternative would shuffle
    * every corpus row just to group it back by id. Per-row cost is
    * O(|centroids| × dim); for centroid sets past ~10k use [[ivfTopK]]
    * with k=1 instead.
    *
    * The fold keeps strictly-better candidates, so ties break toward
    * the seed / earlier array position — the SMALLEST centroid id
    * (id-sorted array) — and the equal-cosine smaller-id rule is
    * applied explicitly for exactness. Cosine is never null/NaN (zero
    * norms score 0.0); centroids must be non-empty. Returns every
    * input column plus (`centroid_label`, `centroid_cos`). */
  def centroidAssign(
      vecField: String,
      centroids: DataFrame, centroidId: String, centroidVec: String)(
      df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.bind
    val centArr = centroids.agg(
      array_sort(collect_list(struct(
        col(centroidId).as("cid"),
        transform(col(centroidVec), _.cast("double")).as("cv"))))
        .as("__cents"))
    val best =
      bind(transform(col(vecField), _.cast("double"))) { v =>
        bind(col("__cents")) { cents =>
          val first = element_at(cents, 1)
          val seed = struct(
            cosineHof(v, first.getField("cv")).as("cos"),
            first.getField("cid").as("cid"))
          aggregate(slice(cents, lit(2), size(cents) - 1), seed, (acc, c) =>
            bind(cosineHof(v, c.getField("cv"))) { cc =>
              when(cc > acc.getField("cos"),
                struct(cc.as("cos"), c.getField("cid").as("cid")))
                .otherwise(acc)
            })
        }
      }
    df.crossJoin(broadcast(centArr))
      .withColumn("__w", best)
      .select(df.columns.map(col) :+
        col("__w.cid").as("centroid_label") :+
        col("__w.cos").as("centroid_cos"): _*)
  }

  /** The id-sorted one-row centroid array shared by the PQ operators —
    * same collapse as [[centroidAssign]]'s: |centroids| (cid, vector)
    * structs in ONE broadcast row, so every PQ stage is a pure
    * projection against it (zero corpus shuffle). */
  private def centroidArray(
      centroids: DataFrame, centroidId: String, centroidVec: String) =
    centroids.agg(
      array_sort(collect_list(struct(
        col(centroidId).as("cid"),
        transform(col(centroidVec), _.cast("double")).as("cv"))))
        .as("__cents"))

  /** Squared-L2 distance between subspace `s` of `v` and of `cv`
    * (`sub` dims each): zip the slices, square differences, fold left
    * from 0.0. Squares are never -0.0, so the fold is bit-identical to
    * the oracle's `list_reduce(list_prepend(0.0, …))`. */
  private def subL2(v: Column, cv: Column, s: Column, sub: Column): Column =
    aggregate(
      zip_with(slice(v, s * sub + 1, sub), slice(cv, s * sub + 1, sub),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Product-quantization codes: the fourth rung of the precision
    * ladder (float32 → int8 → sign sketch → PQ). The vector splits
    * into `m` contiguous subspaces and each records the id-sorted
    * POSITION (0-based) of its nearest sub-centroid — squared-L2
    * argmin, ties to the earlier position, i.e. the smaller cid. With
    * 256 centroids a code is ONE BYTE per subspace: a 1024-dim float32
    * vector (4 KiB) compresses to m = 64 bytes — a 64× scan-IO
    * reduction, the memory-bound regime past int8's 4× and the
    * sketch's 32×, while keeping graded (not just Hamming) distances.
    *
    * `centroids` is any (cid, center) frame ([[standinCentroids]] for
    * the oracle-reproducible surface, [[kmeansCentroids]] in
    * production — same seam as [[ivfBuild]]); sub-centroid c for
    * subspace s is SLICE s of center c, so one centroid frame serves
    * all subspaces. `m` must divide the dimension (slices truncate
    * otherwise — caller's contract, same as [[signSketchWide]]'s dim).
    *
    * Scale shape: one broadcast row of centroids, one projection pass
    * — codes are computed AT INGEST and stored (exactly like
    * [[quantizeInt8]] codes and [[signSketch]] words); per-row cost is
    * O(|centroids| · dim), lowered to the native
    * [[graft.functions.PqEncode]] kernel (whole-stage codegen; the
    * HOF spec form [[pqEncodeHof]] is pinned bit-identical). Appends
    * `outField` (array<int>, length m). */
  def pqEncode(
      vecField: String,
      centroids: DataFrame, centroidId: String, centroidVec: String,
      m: Int, outField: String = "pq_codes")(df: DataFrame): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val centArr = centroidArray(centroids, centroidId, centroidVec)
    df.crossJoin(broadcast(centArr))
      .withColumn(outField, graft.functions.GraftFunctions.pqEncode(
        col(vecField), transform(col("__cents"), _.getField("cv")), m))
      .drop("__cents")
  }

  /** The higher-order-function form of the [[pqEncode]] kernel — the
    * executable specification [[graft.functions.PqEncode]] is tested
    * against (bit-parity asserted in HashExpressionsSpec). `cents` is
    * the id-sorted array<array<double>> of full-dimension centroid
    * vectors. */
  def pqEncodeHof(vec: Column, cents: Column, m: Int): Column = {
    import graft.functions.GraftFunctions.bind
    require(m >= 1, s"m must be >= 1, got $m")
    bind(transform(vec, _.cast("double"))) { v =>
      bind(size(v) / m) { sub =>
        bind(cents) { ca =>
          transform(sequence(lit(0), lit(m - 1)), s =>
            aggregate(sequence(lit(1), size(ca)),
              struct(lit(-1).cast("int").as("p"),
                lit(Double.PositiveInfinity).as("d")),
              (acc, i) =>
                bind(subL2(v, element_at(ca, i), s, sub)) { di =>
                  when(di < acc.getField("d"),
                    struct((i - 1).cast("int").as("p"), di.as("d")))
                    .otherwise(acc)
                }).getField("p"))
        }
      }
    }
  }

  /** Per-subspace PQ codebooks — the REAL product-quantization
    * formulation: `m` INDEPENDENT k-means fits, one per contiguous
    * subspace slice, so each subspace's codebook adapts to ITS marginal
    * distribution instead of inheriting whatever slice a full-dimension
    * centroid happens to carry. This is where most of PQ's recall at a
    * given byte budget comes from: k full-dim centroids can represent
    * only k joint patterns, while m independent codebooks of k entries
    * span k^m reconstructions at the same stored-code cost.
    *
    * Returns the same (cid, center) frame shape every PQ operator
    * already takes — codebook entry c of subspace s is stored as SLICE
    * s of full-dim row c. That concatenation is lossless because
    * [[pqEncode]]'s argmin (and [[pqTopK]]'s LUT) operate on each
    * subspace slice INDEPENDENTLY: slicing these rows recovers exactly
    * the per-subspace codebooks, so the trained form drops into
    * `pqEncode`/`pqTopK`/[[ivfPqTopK]] with zero kernel changes.
    *
    * Each fit is one distributed job over the corpus slice projection
    * (`array_to_vector` keeps the slicing in codegen); the k·dim floats
    * come back to the driver and ship as one broadcastable frame —
    * identical cost shape to [[kmeansCentroids]], m jobs instead of
    * one. Seeded per subspace (seed + s) so the m fits are independent
    * draws. Not oracle-expressible (iterative training — same exemption
    * as [[kmeansCentroids]]); the distortion win over sliced full-dim
    * centroids at equal (m, k) is spec-asserted in ExtSpec. */
  def pqCodebooks(
      corpus: DataFrame, vecField: String, m: Int, k: Int,
      maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(m >= 1, s"m must be >= 1, got $m")
    require(k >= 1, s"k must be >= 1, got $k")
    val dim = corpus.select(size(col(vecField))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide the dimension $dim")
    val sub = dim / m
    val books: Seq[Array[Array[Float]]] = (0 until m).map { s =>
      val feats = corpus.select(array_to_vector(
        slice(col(vecField), s * sub + 1, sub)).as("features"))
      val model = new KMeans().setK(k).setMaxIter(maxIter)
        .setSeed(seed + s).setFeaturesCol("features").fit(feats)
      val centers = model.clusterCenters.map(_.toArray.map(_.toFloat))
      // a DEGENERATE subspace (constant slice — zero-padded dims, a
      // dead feature) has fewer distinct points than k and KMeans
      // returns fewer centers; pad by repeating the first so every cid
      // exists in every codebook (the argmin still picks a real center,
      // duplicates merely waste codes the subspace had no use for)
      if (centers.length >= k) centers
      else Array.tabulate(k)(c =>
        if (c < centers.length) centers(c) else centers(0))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    (0 until k).map { c =>
      (c.toLong, books.flatMap(b => b(c).toSeq))
    }.toDF("cid", "center")
  }

  /** The per-query ADC lookup table: for each subspace s, the dot
    * product of query slice s with every codebook entry's slice s —
    * m × |centroids| doubles, built once per query on the broadcast
    * side. Expects the one-row `__cents` array ([[centroidArray]]) in
    * scope. Folds in index order from 0.0 — bit-identical
    * cross-engine. */
  private def pqLut(queryVec: Column, m: Int): Column = {
    import graft.functions.GraftFunctions.bind
    bind(transform(queryVec, _.cast("double"))) { q =>
      bind(size(q) / m) { sub =>
        bind(col("__cents")) { cents =>
          transform(sequence(lit(0), lit(m - 1)), s =>
            transform(cents, c =>
              aggregate(
                zip_with(slice(q, s * sub + 1, sub),
                  slice(c.getField("cv"), s * sub + 1, sub),
                  (x, y) => x * y),
                lit(0.0), (acc, p) => acc + p)))
        }
      }
    }
  }

  /** Two-stage ANN for Matryoshka-style embeddings (MRL: models
    * trained so the LEADING dimensions carry a usable coarse
    * representation): rank every candidate by exact cosine over the
    * first `coarseDims` dimensions only — the coarse pass reads
    * coarseDims/dim of the float payload (a 1024-dim corpus probed at
    * 64 dims scans 16× less) — keep the best `rerank × k` per query,
    * then rerank ONLY that sliver by full-dimension cosine. The same
    * candidate discipline as [[hammingTopK]]/[[pqTopK]]: query slices
    * broadcast, survivors pruned map-side (WindowGroupLimit), the
    * candidate set broadcasts back, full vectors never shuffle. At
    * 100 TB the prefix lives as its OWN stored column (projected at
    * ingest like codes/sketches) so the coarse scan IO win is
    * physical, not just compute. Unlike the sketch/PQ rungs the
    * coarse score here is a true cosine of a trained sub-embedding —
    * on MRL embeddings its candidate order is far better per byte
    * than a random projection at the same width. `coarseDims` = full
    * dimension with a pool covering the corpus reproduces
    * [[bruteForceTopK]] exactly (spec-pinned). Ties: coarse
    * (coarse_cos desc, item asc), final (cosine desc, item asc). */
  def matryoshkaTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, coarseDims: Int, rerank: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && rerank >= 1, "k and rerank must be >= 1")
    require(coarseDims >= 1, s"coarseDims must be >= 1, got $coarseDims")
    val cand = corpus
      .select(col(corpusId).as("item_id"),
        slice(col(corpusVec), 1, coarseDims).as("__cs"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"),
          slice(col(queryVec), 1, coarseDims).as("__qs"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("coarse_cos", cosine(col("__qs"), col("__cs")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("coarse_cos").desc, col("item_id").asc)))
      .filter(col("__r") <= k * rerank)
      .select("query_id", "item_id", "coarse_cos")
    corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cand), "item_id")
      .join(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))),
        "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "coarse_cos", "cosine", "rank")
  }

  /** The stored rows of a flat PQ index: `(id, codes)` — the
    * [[pqEncode]] byte codes alone, the PQ analog of
    * [[Dedup.embeddingIndexRows]] (m bytes/vector at 256 centroids vs
    * int8's dim bytes). Persist through any store and feed to
    * [[pqTopK]]'s `codes` parameter so the coarse ADC pass scans only
    * this column; for the cell-pruned composition use
    * [[ivfPqIndexRows]] instead. */
  def pqIndexRows(
      corpusId: String, corpusVec: String,
      centroids: DataFrame, centroidId: String, centroidVec: String,
      m: Int)(corpus: DataFrame): DataFrame =
    pqEncode(corpusVec, centroids, centroidId, centroidVec, m, "codes")(
      corpus.select(col(corpusId).as("id"), col(corpusVec)))
      .select(col("id"), col("codes"))

  /** PQ top-k via asymmetric distance computation (ADC): corpus rows
    * are scored from their [[pqEncode]] codes ALONE — per query, a
    * lookup table of sub-centroid dot products (m × |centroids|
    * doubles, built once on the broadcast query side) turns each
    * corpus row into m table lookups and adds; the approximate inner
    * product ranks a candidate pool of `k · rerank`, and exact cosine
    * over the original vectors reranks only that sliver (the
    * [[hammingTopK]] discipline: candidates broadcast back, the
    * corpus's float vectors never shuffle).
    *
    * At 100 TB the coarse pass reads ONLY the stored code column —
    * with m = 64 over 1024 dims that is 64 B/vector against 4 KiB, and
    * unlike the sign sketch the ADC score is graded, so the pool needs
    * less over-fetch for the same recall. Approximation error comes
    * solely from snapping corpus vectors to sub-centroids; queries
    * stay exact (the A in ADC). Scores fold in subspace order from
    * 0.0 — bit-identical cross-engine. */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: DataFrame, centroidId: String, centroidVec: String,
      m: Int, k: Int, rerank: Int = 10,
      excludeSelf: Boolean = true,
      codes: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && rerank >= 1, s"k and rerank must be >= 1")
    val centArr = centroidArray(centroids, centroidId, centroidVec)
    // `codes`: a precomputed (id, codes) frame — the stored-index mode
    // (pqEncode at ingest, persisted; the coarse pass then reads ONLY
    // the m-byte code column). Default recomputes inline so the oracle
    // row is self-contained. Parity spec-pinned.
    val codesDf = codes match {
      case Some(c) => c.select(col(c.columns(0)).as("item_id"),
        col(c.columns(1)).as("__codes"))
      case None => pqEncode(corpusVec, centroids, centroidId, centroidVec,
        m, "__codes")(
        corpus.select(col(corpusId).as("item_id"), col(corpusVec)))
        .select(col("item_id"), col("__codes"))
    }
    val queryLuts = queries
      .select(col(queryId).as("query_id"), col(queryVec))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), pqLut(col(queryVec), m).as("__lut"))
    val cand = codesDf
      .crossJoin(broadcast(queryLuts))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("adc_score", graft.functions.GraftFunctions.pqAdcScore(
        col("__codes"), col("__lut")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc_score").desc, col("item_id").asc)))
      .filter(col("__r") <= k * rerank)
      .select("query_id", "item_id", "adc_score")
    corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cand), "item_id")
      .join(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))),
        "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "adc_score", "cosine", "rank")
  }

  /** The stored rows of an IVF×PQ index: `(item_id, cell, codes)` —
    * each corpus vector's coarse-cell assignment (argmax cosine against
    * the coarse centroids, ties to the smaller cid — the
    * [[centroidAssign]] fold, so the corpus is scanned ONCE with zero
    * shuffle) plus its [[pqEncode]] byte codes. This frame IS the
    * 100 TB index: computed at ingest, persisted through any
    * [[graft.sources.DataStore]] (ideally partitioned by `cell` so a
    * probe prunes files), and consumed by [[ivfPqTopK]] via its `index`
    * parameter — query time then never touches corpus floats except
    * for the candidate sliver's exact rerank.
    *
    * `coarseCentroids` and `pqCentroids` are any (cid, center) frames
    * — stand-ins for the oracle surface, [[kmeansCentroids]] /
    * [[pqCodebooks]] in production; both broadcast as one-row arrays.
    *
    * `residual = true` is the canonical IVF-PQ refinement: encode
    * `v − center(cell)` instead of `v`, so the codebook's bits spend
    * entirely on the WITHIN-CELL offset — residual norms are a
    * fraction of vector norms on clustered data, so quantization
    * error drops at the same byte budget (spec-asserted). Train
    * `pqCentroids` on the residuals ([[pqCodebooks]] over
    * `v − center` rows) for the full win; scoring decomposes exactly
    * as `q·v ≈ q·center + q·r̂` (see [[ivfPqTopK]]). */
  def ivfPqIndexRows(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      coarseCentroids: DataFrame,
      pqCentroids: DataFrame, m: Int,
      residual: Boolean = false): DataFrame = {
    val assigned = centroidAssign(corpusVec, coarseCentroids,
      coarseCentroids.columns(0), coarseCentroids.columns(1))(
      corpus.select(col(corpusId).as("item_id"), col(corpusVec)))
    val toEncode =
      if (!residual) assigned
      else assigned
        .join(broadcast(coarseCentroids.select(
          col(coarseCentroids.columns(0)).as("centroid_label"),
          col(coarseCentroids.columns(1)).as("__cc"))), "centroid_label")
        .withColumn(corpusVec, zip_with(col(corpusVec), col("__cc"),
          (x, c) => x.cast("double") - c.cast("double")))
    pqEncode(corpusVec, pqCentroids,
      pqCentroids.columns(0), pqCentroids.columns(1), m, "codes")(toEncode)
      .select(col("item_id"), col("centroid_label").as("cell"), col("codes"))
  }

  /** Persist an IVF×PQ index ([[ivfPqIndexRows]]) through the store
    * layer, CELL-PARTITIONED when the backend supports a partitioned
    * layout (parquet: `<name>.parquet/cell=<c>/…`): a probe that
    * reaches only `nprobe` cells then prunes every other cell's FILES
    * from the scan — the directory layout is the physical realization
    * of "read only the probed cells' code columns". Other stores fall
    * back to a plain object write (correct, no pruning). */
  def ivfPqSave(
      index: DataFrame, store: graft.sources.DataStore,
      name: String, replace: Boolean = false): Unit = store match {
    case p: graft.sources.ParquetStore =>
      p.createPartitioned(name, index, Seq("cell"), replace)
    case s => s.create(name, index, replace)
  }

  /** Append a NEW vector batch to a persisted IVF×PQ index: assign +
    * encode just the batch ([[ivfPqIndexRows]] — history untouched,
    * zero re-reads) and append its rows under their cell partitions.
    * The growing-corpus ANN flow: each crawl's fresh vectors join the
    * index with one batch-sized job, and a later query probes old and
    * new rows alike (append-equals-rebuild spec-pinned). Compact the
    * layout periodically ([[graft.sources.ParquetStore.compact]] with
    * `partitionCols = Seq("cell")`) — every append adds task-count
    * files per touched cell. Centroids must be the ones the index was
    * built with: coarse cells and codebooks are FROZEN at build time
    * (retraining them would orphan every stored code — the standard
    * IVF-PQ operational contract). */
  def ivfPqAppend(
      store: graft.sources.DataStore, name: String,
      batch: DataFrame, batchId: String, batchVec: String,
      coarseCentroids: DataFrame, pqCentroids: DataFrame, m: Int,
      residual: Boolean = false): Unit = {
    val rows = ivfPqIndexRows(batch, batchId, batchVec,
      coarseCentroids, pqCentroids, m, residual)
    store match {
      case p: graft.sources.ParquetStore =>
        p.appendPartitioned(name, rows, Seq("cell"))
      case s => s.appendInto(name, rows)
    }
  }

  /** Load a persisted IVF×PQ index ([[ivfPqSave]]). The `cell`
    * partition column comes back via partition-directory inference;
    * it is cast back to its written BIGINT type so the probe join and
    * a saved/unsaved index answer identically (round-trip
    * spec-pinned). */
  def ivfPqLoad(store: graft.sources.DataStore, name: String): DataFrame = {
    val df = store.getObject(name)
    df.withColumn("cell", col("cell").cast("long"))
      .select("item_id", "cell", "codes")
  }

  /** IVF-ADC — the canonical 100 TB ANN read path, composing the two
    * rungs that existed separately: [[ivfTopK]] prunes WHICH rows are
    * scored but reranks with full vectors, [[pqTopK]] scores from codes
    * but scans ALL of them. Here a query batch reads ONLY the probed
    * cells' CODE column: probe the `nprobe` coarse cells nearest each
    * query, ADC-score just those cells' members from their stored
    * [[pqEncode]] codes (m byte-lookups + adds per candidate, native
    * kernel), pool the top `k · rerank`, and exact-cosine rerank that
    * sliver. With 1024 cells, nprobe 8 and m = 64 over 1024 dims, the
    * per-batch read is (8/1024 of the corpus) × 64 B/vector — against
    * a full-corpus × 4 KiB brute scan.
    *
    * Scale shape: coarse centroids and PQ codebooks broadcast (one-row
    * arrays); the query batch is small by construction, so probes and
    * per-query LUTs broadcast too; candidate generation is a BROADCAST
    * HASH join of the stored index on `cell` — an equi-join, never a
    * crossJoin of codes × queries (the [[pqTopK]] shape this replaces)
    * — and corpus float vectors never shuffle (candidates broadcast
    * back for the rerank). The only corpus-wide shuffle carries
    * (query, item, adc) survivor rows into the per-query window
    * (WindowGroupLimit prunes losers map-side).
    *
    * Pass a precomputed `index` ([[ivfPqIndexRows]], persisted) to skip
    * the in-query encode — the production mode; the default recomputes
    * it inline so the oracle row is self-contained. Ties: ADC pool
    * (score desc, item asc), final (cosine desc, item asc). Recall
    * loss vs [[pqTopK]] is exactly the probe miss rate: with
    * nprobe = |cells| the output is IDENTICAL to `pqTopK` at equal
    * (m, k, rerank) — spec-pinned.
    *
    * `residual = true` scores the canonical IVF-PQ decomposition
    * `q·v ≈ q·center(cell) + q·r̂`: the exact `q·center` term rides
    * each (query, probed cell) probe row (one double), and the SAME
    * per-query LUT scores the residual codes — queries stay exact,
    * cells pay one extra add per candidate. Index rows must then be
    * residual-encoded (`ivfPqIndexRows(residual = true)`, same flag
    * here when the index is inline).
    *
    * `pruneIndexPartitions = true` additionally pushes the probed
    * cell set into the index scan as a LITERAL `cell IN (…)` filter:
    * against a cell-partitioned stored index ([[ivfPqSave]]) the
    * unprobed cells' files are pruned from the scan itself
    * (`PartitionFilters`, spec-pinned) — the physical "read 8 of 1024
    * cells" guarantee. Costs one bounded driver action
    * (≤ |queries| × nprobe cell ids — a query batch is small by
    * construction). */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      coarseCentroids: DataFrame, nprobe: Int,
      pqCentroids: DataFrame, m: Int, k: Int, rerank: Int = 10,
      excludeSelf: Boolean = true,
      index: Option[DataFrame] = None,
      residual: Boolean = false,
      pruneIndexPartitions: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && rerank >= 1, "k and rerank must be >= 1")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val coded = index.getOrElse(ivfPqIndexRows(
      corpus, corpusId, corpusVec, coarseCentroids, pqCentroids, m, residual))
    val probes = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .crossJoin(broadcast(coarseCentroids.select(
        col(coarseCentroids.columns(0)).as("cell"),
        col(coarseCentroids.columns(1)).as("__ccv"))))
      .withColumn("__cs", cosine(col("__qv"), col("__ccv")))
      // residual mode: q·center_c, the exact half of the decomposed
      // inner product — rides the probe rows (one double per
      // (query, probed cell))
      .withColumn("__qc",
        if (residual) dot(col("__qv"), col("__ccv")) else lit(0.0))
      .withColumn("__pr", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("__cs").desc, col("cell").asc)))
      .filter(col("__pr") <= nprobe)
      .select("query_id", "cell", "__qc")
    val centArr = centroidArray(pqCentroids,
      pqCentroids.columns(0), pqCentroids.columns(1))
    val luts = queries
      .select(col(queryId).as("query_id"), col(queryVec))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), pqLut(col(queryVec), m).as("__lut"))
    val codedPruned =
      if (!pruneIndexPartitions) coded
      else coded.filter(col("cell").isInCollection(
        probes.select("cell").distinct().collect().map(_.get(0)).toSeq))
    val cand = codedPruned
      .join(broadcast(probes), "cell")
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .join(broadcast(luts), "query_id")
      .withColumn("adc_score", {
        val adc = graft.functions.GraftFunctions.pqAdcScore(
          col("codes"), col("__lut"))
        // kept branch-explicit: 0.0 + adc would flip a -0.0 sum's sign
        // bit and break bit-exact oracle parity in the plain mode
        if (residual) col("__qc") + adc else adc
      })
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc_score").desc, col("item_id").asc)))
      .filter(col("__r") <= k * rerank)
      .select("query_id", "item_id", "adc_score")
    corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cand), "item_id")
      .join(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))),
        "query_id")
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "adc_score", "cosine", "rank")
  }

  /** MMR-diversified re-rank of an ANN pool (Carbonell & Goldstein's
    * maximal marginal relevance): from each query's pool of M scored
    * candidates, greedily select k maximizing
    * `λ·cosine − (1−λ)·max(0, maxSim(candidate, selected))` — the
    * diversity pass between retrieval and use that stops a cosine
    * top-k from returning five paraphrases of one document.
    *
    * `pool` is ANY rung's output — (query_id, item_id, cosine, rank)
    * from [[bruteForceTopK]], [[ivfPqTopK]], [[matryoshkaTopK]], … —
    * with `rank` the per-query pool order (cosine desc, item_id asc),
    * which pins the kernel's earliest-index tie discipline. `vectors`
    * supplies candidate embeddings by id (usually the corpus frame).
    *
    * Scale shape: the pool (|queries|·M rows) is broadcast into ONE
    * corpus scan to fetch candidate vectors — the corpus is never
    * shuffled; the per-query group then carries M vectors through a
    * |queries|-row aggregation into the native [[graft.functions
    * .MmrSelect]] kernel (O(k·M·dim) per ROW — incremental running
    * maxSim against the newest selection only, bit-identical to the
    * full re-scan — embarrassingly parallel). MMR never sees the corpus — the pool bounds
    * everything. Output: (query_id, rank, item_id, cosine, mmr) in
    * selection order, min(k, M) rows per query. */
  def mmrRerank(
      pool: DataFrame,
      vectors: DataFrame, vecId: String, vecCol: String,
      k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    val p = pool.select(
      col("query_id"), col("item_id"), col("cosine"), col("rank"))
    val withVec = vectors
      .select(col(vecId).as("item_id"),
        col(vecCol).cast("array<float>").as("__vec"))
      .join(broadcast(p), Seq("item_id"))
    // array_sort's natural struct order = (rank asc): the declared pool
    // order travels as data, immune to shuffle nondeterminism
    val pooled = withVec
      .groupBy("query_id")
      .agg(array_sort(collect_list(struct(
        col("rank").as("__r"), col("item_id"),
        col("cosine"), col("__vec")))).as("__p"))
    val sel = graft.functions.GraftFunctions.mmrSelect(
      transform(col("__p"), x => x.getField("item_id")),
      transform(col("__p"), x => x.getField("cosine")),
      transform(col("__p"), x => x.getField("__vec")),
      k, lambda)
    pooled
      .select(col("query_id"), posexplode(sel))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.item_id").as("item_id"), col("col.cosine").as("cosine"),
        col("col.mmr").as("mmr"))
  }

  /** Deterministic structured rotation `H·D/√d` (the FAISS-style PQ
    * preprocessing — see [[graft.functions.FwhtRotate]] for the full
    * contract): orthogonal, so norms/cosines survive to float rounding
    * while correlated-dimension energy spreads across subspaces,
    * which is what per-subspace PQ codebooks need. Rotate corpus AND
    * queries with the same seed; every downstream rung is unchanged. */
  def fwhtRotate(vec: Column, dim: Int, seed: Int = 0): Column =
    graft.functions.GraftFunctions.fwhtRotate(vec, dim, seed)

  /** Retrieval-quality evaluation IN the engine — the measurement leg
    * the ANN ladder needs before anyone turns a knob: given a rung's
    * `result` and a gold `truth` (both any-rung outputs carrying
    * (query_id, item_id, rank)), per query the relevant-set size,
    * hit count, recall = hits / n_relevant, the first hit's rank, and
    * the reciprocal rank (0.0 when nothing relevant surfaced — the MRR
    * convention). Deliberately the RATIONAL metric set: recall and RR
    * are one exact-integer division each, where NDCG's log2 discount
    * would break cross-engine bit parity (the library's no-libm-in-
    * scores doctrine).
    *
    * Queries come from `truth` (a query with no gold neighbors has no
    * recall to report; a rung that MISSES a query still shows up as
    * recall 0 via the left join). Both inputs filter to rank ≤ k, so
    * "recall@k vs gold-k" is the measured contract.
    *
    * Scale shape: one equi-join on (query, item) between two
    * |queries|·k-row frames + two keys-only hash-aggs — the corpora
    * behind the rungs are never touched. */
  def rankingMetrics(result: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = truth.filter(col("rank") <= k).select("query_id", "item_id")
    val nRel = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_relevant"))
    val matched = result.filter(col("rank") <= k)
      .select("query_id", "item_id", "rank")
      .join(rel, Seq("query_id", "item_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"),
        min("rank").as("first_hit_rank"))
    nRel.join(matched, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall"),
        col("first_hit_rank"),
        when(col("first_hit_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_hit_rank").cast("double"))
          .as("reciprocal_rank"))
  }

  /** Reciprocal-rank fusion — the HYBRID-retrieval combiner
    * (Cormack–Clarke–Buettcher): two rankers' top-k lists merge by
    * `rrf = Σ 1/(k₀ + rank_i)`, the rank-only fusion that needs no
    * score calibration between rankers whose scores live on different
    * scales (BM25 vs cosine, dense vs lexical, full-precision vs
    * quantized). Inputs are ANY two rung outputs carrying
    * `(query_id, item_id, rank)` — the [[rankingMetrics]] interface,
    * so every retriever in this library fuses with every other by
    * construction. An item missing from one list contributes only its
    * present term (the standard convention: absence is rank ∞).
    *
    * Exactness: each term is one exact integer-denominator division
    * and the fusion is ONE addition of two doubles — no float
    * accumulation, oracle bit-for-bit (the rational-metrics doctrine
    * of [[rankingMetrics]]). Ties (same (r_a, r_b) multiset) break on
    * item_id ascending — pinned.
    *
    * Scale shape: one full-outer equi-join between two |queries|·k
    * frames + one per-query window — the corpora behind the rankers
    * are never touched. */
  def rrfFuse(
      a: DataFrame, b: DataFrame,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ra = a.select(col("query_id"), col("item_id"),
      col("rank").cast("long").as("__ra"))
    val rb = b.select(col("query_id"), col("item_id"),
      col("rank").cast("long").as("__rb"))
    ra.join(rb, Seq("query_id", "item_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(k0.toLong) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toLong) + col("__rb")), lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_score").desc, col("item_id").asc)))
      .filter(col("rank") <= topK)
      .select("query_id", "item_id", "rrf_score", "rank")
  }

  /** ColBERT-style late-interaction (MaxSim) score between two
    * MULTI-VECTOR representations (`array<array<float>>` of per-token
    * embeddings): `Σ over query tokens of max over doc tokens of
    * cosine(q_i, d_j)` — fine-grained term matching a single pooled
    * vector cannot express (each query token finds ITS best doc
    * token). The outer sum folds in query-token index order (the
    * oracle-exact discipline); the inner max is order-free; empty
    * token lists on either side score 0.0 (nothing to match ≠ an
    * error). Pure HOF — O(|q|·|d|·dim) per pair inside codegen. */
  def lateInteractionScore(queryVecs: Column, docVecs: Column): Column =
    when(size(queryVecs) === 0 || size(docVecs) === 0, lit(0.0))
      .otherwise(aggregate(queryVecs, lit(0.0), (acc, q) =>
        acc + array_max(transform(docVecs, d => cosineHof(q, d)))))

  /** Brute-force late-interaction top-k: [[bruteForceTopK]]'s shape
    * (broadcast query side, one corpus scan, per-query
    * WindowGroupLimit) with [[lateInteractionScore]] as the scorer —
    * the multi-vector retrieval rung. At corpus scale, front it with a
    * single-vector ANN rung over pooled embeddings ([[meanPool]]) and
    * late-interact only the pool (the standard ColBERT two-stage).
    * Output: `query_id, item_id, maxsim, rank`. */
  def lateInteractionTopK(
      corpus: DataFrame, corpusId: String, corpusVecs: String,
      queries: DataFrame, queryId: String, queryVecs: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    corpus
      .select(col(corpusId).as("item_id"), col(corpusVecs).as("__dv"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVecs).as("__qv"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("maxsim", lateInteractionScore(col("__qv"), col("__dv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("maxsim").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "maxsim", "rank")
  }

  /** Hard-negative mining for contrastive/embedding training — the
    * data-prep leg next to dedup (positives), ANN (candidates), MMR
    * (diversity), and rankingMetrics (eval): per query, the top-k MOST
    * similar candidates whose cosine is still ≤ `maxSim` — similar
    * enough to be hard, not so similar they are unlabeled POSITIVES
    * (the near-dup band that poisons InfoNCE training as false
    * negatives; set `maxSim` at or below the dedup threshold). The
    * band filter applies BEFORE the per-query top-k window, so the k
    * slots go to in-band candidates only.
    *
    * Same scale shape as [[bruteForceTopK]] (broadcast query side, one
    * corpus scan, per-query WindowGroupLimit); swap the scored-pair
    * source for an ANN rung at corpus scale — the band+rank stage is
    * source-agnostic. Output: `query_id, item_id, cosine, rank`. */
  def hardNegatives(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, maxSim: Double, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxSim > -1.0 && maxSim <= 1.0,
      s"maxSim must be in (-1, 1], got $maxSim")
    corpus
      .select(col(corpusId).as("item_id"), col(corpusVec).as("__cv"))
      .crossJoin(broadcast(queries
        .select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .filter(!lit(excludeSelf) || col("query_id") =!= col("item_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .filter(col("cosine") <= maxSim)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("item_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "cosine", "rank")
  }

  /** [[mmrRerank]] over a [[bruteForceTopK]] pool of `poolSize` — the
    * convenience exact form; swap the pool builder for any ANN rung at
    * scale (the rerank stage is pool-shape-agnostic). */
  def mmrTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, poolSize: Int, lambda: Double,
      excludeSelf: Boolean = true): DataFrame =
    mmrRerank(
      bruteForceTopK(corpus, corpusId, corpusVec,
        queries, queryId, queryVec, poolSize, excludeSelf),
      corpus, corpusId, corpusVec, k, lambda)
}
