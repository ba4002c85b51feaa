package graft.functions

import graft.ops.Ckpt._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vector similarity search over an embedding column (ARRAY<FLOAT>) —
 * the Spark-native counterpart of the reference's vector index
 * (db.index.vector.queryNodes, community/procedure/.../builtin/
 * VectorIndexProcedures.java:144; Lucene HNSW backing,
 * LuceneKnnVectorFormatV2.java:26-43).
 *
 * Two paths, as the reference has two (brute scan vs HNSW):
 *  - bruteForceTopK: exact — broadcast the (small) query set, one codegen'd
 *    map over the corpus, per-query top-k via window. Baseline + verifier.
 *  - lshTopK: scale path — random-hyperplane LSH buckets (deterministic
 *    seed), candidates only within matching buckets (+ multiprobe),
 *    so the 100 TB corpus is shuffled once by bucket key instead of
 *    crossed with every query.
 *
 * All vector math is double-precision `aggregate`/`zip_with` higher-order
 * functions: codegen'd, no UDF, no Python.
 */
object Similarity {

  /** Dot product of two ARRAY<DOUBLE> columns — the fused native
    * expression (expressions/VectorDot); bit-identical to the
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF spelling it replaced,
    * which evaluated interpreted (HOFs are CodegenFallback) and allocated
    * a products array per row. */
  def dot(a: Column, b: Column): Column = {
    graft.functions.expressions.VectorDot.ensureRegistered(
      org.apache.spark.sql.SparkSession.active)
    call_function("vector_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast ARRAY<FLOAT> to ARRAY<DOUBLE> so all accumulation is fp64 (stable
    * across platforms and matches a float64 oracle). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /**
   * Exact top-k cosine neighbors for each query vector.
   * @param corpus  (id LONG, vec ARRAY<FLOAT>)
   * @param queries (qid LONG, qvec ARRAY<FLOAT>) — small; broadcast
   * @return (qid, id, sim, rank) rank 1..k, self-match excluded
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      metric: String = "COSINE",
      // self-exclusion is for kNN over one table (query ids ARE corpus
      // ids); index queries pass false — their synthetic qid must not
      // shadow a real corpus id
      excludeSelf: Boolean = true): DataFrame = {
    // EUCLIDEAN score = 1 / (1 + d²), the reference's Lucene similarity
    // mapping (VectorSimilarityFunction.EUCLIDEAN) — both metrics land in
    // (0, 1], higher = closer
    def score(v: Column, qv: Column): Column = metric.toUpperCase match {
      case "COSINE" => cosine(v, qv)
      case "EUCLIDEAN" => {
        // fused codegen kernel (expressions/VectorSqDist) — the last
        // aggregate(zip_with(...)) on a numeric hot path, same null/fold
        // semantics as the HOF spelling it replaces
        graft.functions.expressions.VectorSqDist.ensureRegistered(
          org.apache.spark.sql.SparkSession.active)
        lit(1.0) / (lit(1.0) + call_function("vector_sqdist", v, qv))
      }
      case other => throw new IllegalArgumentException(
        s"unknown vector similarity function $other")
    }
    val scored = corpus.select(col("id"), asDouble(col("vec")).as("v"))
      .join(broadcast(queries.select(col("qid"), asDouble(col("qvec")).as("qv"))),
        if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .select(col("qid"), col("id"), score(col("v"), col("qv")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Hard-negative mining (the contrastive-training companion of
   * [[graft.functions.Curation.negativeSamples]]): per query, the top-k
   * most similar corpus items carrying a DIFFERENT label — the negatives
   * that actually move a contrastive loss, vs. the uniform random ones.
   * Same broadcast-queries / codegen-dot-product shape as
   * [[bruteForceTopK]]; the label disagreement lands in the join
   * condition, so excluded rows never reach the scorer. For 100 TB corpora
   * the candidate stage swaps in the LSH/IVF shortlist and this exact
   * ranking runs over the shortlist.
   *
   * @param corpus  (id, vec, label)
   * @param queries (qid, qvec, qlabel)
   * @return (qid, id, sim 4dp, rank 1..k)
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.select(col("id"), asDouble(col("vec")).as("v"),
        col("label"))
      .join(broadcast(queries.select(col("qid"), asDouble(col("qvec")).as("qv"),
        col("qlabel"))),
        col("id") =!= col("qid") && col("label") =!= col("qlabel"))
      .select(col("qid"), col("id"),
        round(cosine(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component h[j][d] derived from
    * xxhash64(j, d) — identical on every executor without shipping state.
    * Vector dimension is taken from the array itself (size(vec)), so no
    * driver-side probe of the data is ever needed to build the plan. */
  private def hyperplaneBit(vec: Column, j: Int): Column = {
    // sum_d vec[d] * u(j,d), u in [-1,1) from a hash — sign bit is the bucket bit
    val contrib = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, d) => x * (pmod(xxhash64(lit(j), d), lit(1000003L)).cast("double") / 500001.5 - 1.0)),
      lit(0.0), (acc, v) => acc + v)
    when(contrib >= 0, lit(1L << j)).otherwise(0L)
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits) per vector. */
  def lshBucket(vec: Column, nBits: Int = 12): Column =
    (0 until nBits).map(j => hyperplaneBit(vec, j)).reduce(_.bitwiseOR(_))

  /** PORTABLE hyperplane bits: weights from an md5-derived hash and ALL
    * arithmetic in exact i64 (components floor(v[d]·10⁶), weights in
    * [-500001, 501]·10³ range) — the sign replays bit-for-bit in any
    * engine with md5 (the DuckDB oracle recomputes the same buckets),
    * unlike the float-summed xxhash64 default whose near-zero signs are
    * accumulation-order sensitive. |Σ| ≤ dims·5·10¹⁴ stays far from i64
    * overflow for every practical embedding width. */
  /** All nBits portable sign bits in ONE fused codegen'd loop per row
    * (expressions/PortableLshBucket): each element quantizes once and
    * feeds every bit's exact-i64 dot product — replaces nBits interpreted
    * zip_with/aggregate passes (the q_cosine_near_dup r12 cost; an
    * HOF-level nBits-wide accumulator was measured 2× slower still —
    * per-dimension array-copy allocations). Bit-identical to the DuckDB
    * oracle replay. */
  def lshBucketPortable(vec: Column, nBits: Int): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.expressions.PortableLshBucket.ensureRegistered(spark)
    call_function("portable_lsh_bucket", vec.cast("array<double>"), lit(nBits))
  }

  /**
   * Approximate top-k with multiprobe: each query probes its own bucket plus
   * every bucket at hamming distance 1 (nBits+1 probes total), which is the
   * standard recall fix for sign-LSH — near neighbors most often differ in
   * exactly one marginal sign bit. The probe explosion happens on the
   * (small, broadcast) query side only; the corpus is still hashed and
   * shuffled once by bucket key, so the 100 TB side does no extra work.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 12,
      portable: Boolean = false): DataFrame = {
    def bkt(v: Column) =
      if (portable) lshBucketPortable(v, nBits) else lshBucket(v, nBits)
    val c = corpus.select(col("id"), asDouble(col("vec")).as("v"))
      .withColumn("bucket", bkt(col("v")))
    val probes = (0 until nBits).map(j => col("bucket0").bitwiseXOR(lit(1L << j)))
    val q = queries.select(col("qid"), asDouble(col("qvec")).as("qv"))
      .withColumn("bucket0", bkt(col("qv")))
      .withColumn("bucket", explode(array((col("bucket0") +: probes): _*)))
      .drop("bucket0")
    val scored = c.join(broadcast(q), Seq("bucket")).filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("v"), col("qv")).as("sim"))
      .dropDuplicates("qid", "id")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF-flat ANN (FAISS-style inverted file; the alternative scale
   * architecture to sign-LSH): k-means the corpus into nList Voronoi
   * cells, search only each query's nProbe nearest cells with exact
   * cosine rerank.
   *
   * Scale shape: centroids are TINY (nList × dim doubles) and ship as a
   * broadcast one-row relation, so corpus-side cell assignment is a
   * map-side argmax (`aggregate` over the broadcast centroid array) — NO
   * shuffle, no window, no plan-embedded literals. Each k-means
   * iteration costs one posexplode + mean shuffle (inherent). At cluster
   * scale the assigned corpus persists partitioned by cell id; queries
   * probe nProbe cells so the big side is joined on the cell key only.
   * Deterministic init (id-hash order) — results are reproducible, but
   * float mean accumulation order keeps this a recall-tested (not
   * oracle-hashed) operator, like lshTopK.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nList: Int = 64, nProbe: Int = 8, kmeansIters: Int = 2,
      portable: Boolean = false): DataFrame = {
    val c = corpus.select(col("id"), asDouble(col("vec")).as("v"))
      .localCheckpoint(false)
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, centsDf) =
      if (portable) portableIvf(c, nList, kmeansIters)
      else {
        val unitCents = trainUnitCentroids(c, nList, kmeansIters)
        (assignCells(c, unitCents), // persisted form: saveIvfIndex
          unitCents.map { case (cid, v) => (cid, v.toSeq) }.toSeq
            .toDF("cid", "cv"))
      }
    val q = queries.select(col("qid"), asDouble(col("qvec")).as("qv"))
    val wq = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid").asc)
    // cosine, not dot: identical ranking for the default path's UNIT
    // centroids (|qv| is constant per query) and required for the
    // portable path's raw MEAN centroids
    val probes = q.crossJoin(broadcast(centsDf))
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select("qid", "qv", "cid")
    // a corpus row lives in exactly one cell → no (qid, id) duplicates
    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("v"), col("qv")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** PORTABLE IVF training: the engine-replayable alternative to the
    * sampled driver k-means — full-corpus deterministic Lloyd
    * ([[kmeansAssign]]: init = nList lowest-id vectors, cosine argmax
    * with lowest-cid ties, per-(cell, dim) fp64 mean updates) plus a
    * final per-cell MEAN centroid, all of which a DuckDB oracle replays
    * exactly (the q_kmeans precedent). Costs kmeansIters full assignment
    * passes instead of one bounded sample collect — the auditable mode;
    * the default stays the FAISS-style sampled trainer.
    * @return (assigned (id, v, cid), centroids (cid, cv)) */
  private def portableIvf(c: DataFrame, nList: Int,
      kmeansIters: Int): (DataFrame, DataFrame) = {
    val ka = kmeansAssign(c.select(col("id"), col("v").as("vec")),
      nList, kmeansIters)
    val member = c.join(ka.withColumnRenamed("cluster", "cid"), Seq("id"))
      .select(col("id"), col("v"), col("cid").cast("int").as("cid"))
      .localCheckpoint(false)
    val cents = member.select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos").agg(avg(col("col")).as("m"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x("m")).as("cv"))
    (member, cents)
  }

  /** Sample-trained k-means centroids, unit-normalized. Centroids train on
    * a deterministic SAMPLE (id-hash order), bounded at nList*32 rows
    * REGARDLESS of corpus size — standard IVF practice (FAISS trains on a
    * bounded sample). Because the sample is bounded, the k-means loop runs
    * on the DRIVER: one collect of ≤nList*32 vectors, then plain-array
    * iterations, instead of kmeansIters Spark jobs of two shuffles each.
    * UNIT centroids ship downstream: cell ranking by cosine is identical
    * to ranking by dot against the unit vector, and dot is one array pass
    * instead of three. */
  private def trainUnitCentroids(c: DataFrame, nList: Int,
      kmeansIters: Int): Array[(Int, Array[Double])] = {
    val train: Array[Array[Double]] = c
      .withColumn("__h", xxhash64(col("id")))
      .orderBy("__h").limit(math.max(nList * 32, 1024))
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    def unitOf(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      if (n == 0.0) v else v.map(_ / n)
    }
    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var cents: Array[Array[Double]] = train.take(nList)
    val dim = if (train.nonEmpty) train(0).length else 0
    var it = 0
    while (it < kmeansIters && cents.nonEmpty) {
      // cosine assignment == dot against unit centroids (norm(v) is
      // constant per row, so it never changes the argmax)
      val u = cents.map(unitOf)
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      train.foreach { v =>
        var best = 0; var bs = Double.MinValue; var i = 0
        while (i < u.length) {
          val s = dotArr(v, u(i)); if (s > bs) { bs = s; best = i }; i += 1
        }
        counts(best) += 1
        var d = 0; while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) // empty cell keeps its centroid
        else sums(i).map(_ / counts(i))
      }.toArray
      it += 1
    }
    cents.map(unitOf).zipWithIndex.map { case (v, i) => (i, v) }
  }

  /**
   * Persist an IVF layout: train centroids, assign every corpus row, write
   * the cells as parquet PARTITIONED BY cid with the unit centroids
   * alongside. This is the durable form of FAISS's inverted lists: a
   * query touches nProbe cell partitions and parquet partition pruning
   * skips every other file — at 100 TB the scan cost is
   * corpus × nProbe / nList, not the corpus.
   */
  def saveIvfIndex(corpus: DataFrame, dir: String, nList: Int = 64,
      kmeansIters: Int = 2, portable: Boolean = false): Unit = {
    val c = corpus.select(col("id"), asDouble(col("vec")).as("v"))
      .localCheckpoint(false)
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, centsDf) =
      if (portable) portableIvf(c, nList, kmeansIters)
      else {
        val unitCents = trainUnitCentroids(c, nList, kmeansIters)
        (assignCells(c, unitCents),
          unitCents.map { case (cid, v) => (cid, v.toSeq) }.toSeq
            .toDF("cid", "cv"))
      }
    // cluster by the partition column before partitionBy so each cell
    // lands in few files, not one per write task (the saveMinhashStore /
    // saveTextIndex convention — at scale, tasks × nList small files is a
    // listing-cost problem)
    assigned.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/cells")
    centsDf.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Append vectors to a persisted IVF index WITHOUT retraining: new rows
    * assign to the STORED centroids map-side and append into their cell
    * partitions — the maintenance path an ANN store needs at 100 TB, where
    * re-running saveIvfIndex on every ingest batch would rewrite the
    * corpus (the reference's Lucene HNSW likewise grows by segment, not by
    * rebuild). Queries see appended vectors immediately (cells are read
    * per query); recall degrades only as the data distribution drifts from
    * the trained centroids — retrain with saveIvfIndex when it does. */
  def ivfIndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
      newVectors: DataFrame): Unit = {
    // unitize the stored centroids: a no-op for the default (unit) index,
    // and makes assignCells' dot-argmax a cosine-argmax for a portable
    // index's raw MEAN centroids
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
      .map { case (cid, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (cid, if (n == 0.0) v else v.map(_ / n))
      }
    val c = newVectors.select(col("id"), asDouble(col("vec")).as("v"))
    assignCells(c, cents).write.mode("append")
      .partitionBy("cid").parquet(s"$dir/cells")
  }

  /** Query a persisted IVF index (saveIvfIndex): rank cells by the stored
    * unit centroids, then scan ONLY the probed cell partitions — the cid
    * filter is a static partition filter, so pruning is file-level. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nProbe: Int = 8): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val q = queries.select(col("qid"), asDouble(col("qvec")).as("qv"))
    val wq = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid").asc)
    // cosine ranks identically to dot for unit centroids and is required
    // for a portable index's raw MEAN centroids
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select("qid", "qv", "cid")
      .freshCkpt() // tiny: |queries| × nProbe rows
    val probeCids = probes.select("cid").distinct().collect()
      .map(_.get(0)).toSeq
    val cells = spark.read.parquet(s"$dir/cells")
      .filter(col("cid").isin(probeCids: _*))
    val scored = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("v"), col("qv")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Map-side nearest-centroid assignment: argmax via `aggregate` over the
    * centroid array, which ships as BROADCAST DATA (a one-row relation
    * holding all centroids), not as plan-embedded literals. Literal
    * centroids serialize nList×dim doubles into every task binary and blow
    * past codegen/task-size limits at realistic nList (≥4096); a broadcast
    * one-row crossJoin ships them once per executor and keeps the
    * assignment a pure map (no shuffle, no window). Centroids must be
    * UNIT vectors: argmax of dot(v, unit(c)) equals argmax of
    * cosine(v, c) (norm(v) is constant per row), and dot is one array
    * pass per centroid instead of three. The array is sorted by cid so
    * tie-breaks ("first strictly greater wins") are deterministic. */
  private def assignCells(c: DataFrame,
      unitCents: Array[(Int, Array[Double])]): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val centsRow = unitCents.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cv")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("__cents"))
    // fused argmax kernel (expressions/VectorKernels.ArgmaxDot): the HOF
    // aggregate was CodegenFallback — every corpus row paid an interpreted
    // walk over nList centroid structs; this is one compiled loop with the
    // identical strictly-greater / (MinValue, -1) decision sequence
    graft.functions.expressions.ArgmaxDot.ensureRegistered(spark)
    c.crossJoin(broadcast(centsRow))
      .select(col("id"), col("v"),
        call_function("argmax_dot", col("v"), col("__cents")).as("cid"))
  }

  /**
   * Distributed spherical k-means (Lloyd) over an embedding column — the
   * clustering stage of semantic dedup, topic-stratified sampling, and
   * diversity-aware mixing. Deterministic and engine-replayable end to
   * end: init = the k lowest-id vectors as centroids (cid in id order),
   * assignment = map-side argmax of dot against UNIT centroids shipped as
   * the broadcast one-row relation ([[Similarity]]'s assignCells — never
   * plan literals), update = per-(cluster, dim) mean via posexplode
   * partial aggregation (k·dim driver scalars per iteration — the only
   * driver state), re-unitized for the next round. Empty clusters keep
   * their previous centroid. At 100 TB each iteration is one map pass +
   * one k·dim-bounded aggregate; the corpus is never collected.
   *
   * @param vecs (id LONG, vec ARRAY<FLOAT|DOUBLE>)
   * @return (id, cluster INT) — assignment after `iters` rounds
   */
  def kmeansAssign(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"bad kmeans config: k=$k iters=$iters")
    def unitOf(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val c = vecs.select(col("id"), asDouble(col("vec")).as("v"))
      .localCheckpoint(false)
    var cents: Array[(Int, Array[Double])] = c.orderBy("id").limit(k)
      .collect().zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](1).toArray) }
    var assigned: DataFrame = null
    var it = 0
    while (it < iters) {
      it += 1
      assigned = assignCells(c, cents.map { case (cid, v) => (cid, unitOf(v)) })
      if (it < iters) {
        val stats = assigned.select(col("cid"), posexplode(col("v")))
          .groupBy("cid", "pos")
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .collect().map(r => (r.getInt(0), r.getInt(1),
            r.getDouble(2) / r.getLong(3)))
        val byCid = stats.groupBy(_._1)
        cents = cents.map { case (cid, prev) =>
          byCid.get(cid) match {
            case Some(rows) =>
              val m = prev.clone()
              rows.foreach { case (_, pos, mean) => m(pos) = mean }
              (cid, m)
            case None => (cid, prev) // empty cluster: keep centroid
          }
        }
      }
    }
    assigned.select(col("id"), col("cid").cast("int").as("cluster"))
  }

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): cluster the embedding
   * space, then within each cluster drop every member whose cosine
   * similarity to a kept member reaches `tau`, keeping — per the paper —
   * the candidate with the LOWEST similarity to its cluster centroid
   * (rank = centroid-sim ascending, ties by id; a member is dropped iff
   * some lower-ranked member is within tau).
   *
   * Scale shape: clustering is the bounded-state spherical k-means above
   * (k·dim driver scalars); the final per-cluster mean centroid is one
   * posexplode aggregate reassembled as an array column (no collect); the
   * quadratic pair check is confined WITHIN clusters — k is chosen so
   * |cluster| ≈ corpus/k stays small (the paper runs 50k clusters for
   * LAION-440M), so the self-join shuffles on cluster id and never goes
   * corpus-quadratic. Cosine is scale-invariant, so the mean centroid
   * needs no re-normalization for ranking.
   *
   * @return (id LONG, cluster INT, keep BOOLEAN) — one row per input vector
   */
  def semanticDedup(vecs: DataFrame, k: Int, iters: Int, tau: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vecs.select(col("id"), asDouble(col("vec")).as("v"))
    val member = v.join(kmeansAssign(v.select(col("id"), col("v").as("vec")), k, iters), Seq("id"))
    // final per-cluster MEAN centroid over the raw vectors (matches the
    // oracle replay; cosine ranking is invariant to centroid scale)
    val cent = member.select(col("cluster"), posexplode(col("v")))
      .groupBy("cluster", "pos").agg(avg(col("col")).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x("m")).as("cv"))
    // unit-normalize each vector ONCE so the quadratic pair stage needs a
    // single fused dot per pair instead of dot + two norms
    val ranked = member.join(cent, Seq("cluster"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(cosine(col("v"), col("cv")).asc, col("id").asc)))
      .withColumn("nrm", norm(col("v")))
      .withColumn("u", when(col("nrm") === 0, col("v"))
        .otherwise(transform(col("v"), x => x / col("nrm"))))
      .select("id", "cluster", "rk", "u")
      .localCheckpoint(false) // reused by both pair sides + the output join
    val a = ranked.select(col("cluster"), col("rk").as("rkA"), col("u").as("uA"))
    val b = ranked.select(col("cluster"), col("rk").as("rkB"),
      col("id").as("idB"), col("u").as("uB"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("rkA") < col("rkB") && dot(col("uA"), col("uB")) >= tau)
      .select(col("idB").as("id")).distinct().withColumn("dropped", lit(true))
    ranked.join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("dropped").isNull.as("keep"))
  }

  /**
   * Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
   * for Nearest Neighbor Search", TPAMI 2011) — the memory-scale path for
   * ANN over a 100 TB corpus: each unit-normalized vector compresses to m
   * one-byte codes (64 fp32 dims → 8 bytes here, 32×), and queries scan
   * the CODES with per-subspace lookup tables (asymmetric distance, ADC)
   * instead of touching raw vectors.
   *
   * Train: per-subspace k-means (2^nBits centroids) on the same bounded
   * deterministic sample as IVF — driver arrays, zero Spark jobs beyond
   * one bounded collect. Codebooks ship as a broadcast one-row relation
   * (assignCells precedent — never plan literals). Encode: one map-side
   * pass, argmax dot per subspace. Query: per (query, subspace) a
   * 2^nBits-entry LUT of dot(q_j, c_{j,i}); score = Σ_j LUT[j][code_j]
   * ≈ dot(q, x) = cosine on unit vectors.
   *
   * Quantization blurs ranks among near-ties, so the standard refine stage
   * follows (FAISS IVFPQ+refine): ADC produces a shortlist of rerank×k
   * candidates per query, and only THAT shortlist joins back to the raw
   * vectors for exact-cosine re-ranking — at 100 TB the exact math touches
   * |queries|×rerank×k rows, not the corpus. rerank = 0 disables (pure ADC).
   *
   * @param corpus  (id LONG, vec ARRAY<FLOAT|DOUBLE>), dim divisible by m
   * @param queries (qid LONG, qvec …) — small; broadcast
   * @return (qid, id, sim, rank) rank 1..k, self excluded
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      nBits: Int = 8, kmeansIters: Int = 4, rerank: Int = 4,
      portable: Boolean = false): DataFrame = {
    require(m >= 1 && nBits >= 2 && nBits <= 8, s"pq params out of range: m=$m nBits=$nBits")
    val spark = corpus.sparkSession
    import spark.implicits._
    // norm materializes as a column BEFORE the per-element divide: a lambda
    // referencing the norm subtree would re-evaluate it per element
    // (trees, not DAGs) — 64 norms per row instead of one
    def unitized(df: DataFrame, vCol: String): DataFrame = df
      .withColumn("__n", norm(col(vCol)))
      .withColumn(vCol, when(col("__n") === 0.0, col(vCol))
        .otherwise(transform(col(vCol), x => x / col("__n"))))
      .drop("__n")
    val c = unitized(
        corpus.select(col("id"), asDouble(col("vec")).as("v")), "v")
      .localCheckpoint(false)

    // bounded deterministic training sample (FAISS practice: PQ codebooks
    // train on a sample, not the corpus) — driver k-means per subspace.
    // PORTABLE mode seeds the codebooks from the nCents lowest-id UNIT
    // vectors with NO Lloyd rounds: every downstream step (encode, ADC,
    // rerank) is then engine-replayable — the DuckDB oracle recomputes
    // the codes and scores exactly; the refine stage keeps recall.
    val nCents = 1 << nBits
    val train: Array[Array[Double]] =
      if (portable)
        c.orderBy("id").limit(nCents)
          .select("v").collect().map(_.getSeq[Double](0).toArray)
      else c
        .withColumn("__h", xxhash64(col("id")))
        .orderBy("__h").limit(math.max(nCents * 16, 1024))
        .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(train.nonEmpty, "pqTopK: empty corpus")
    val dim = train(0).length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val books: Seq[(Int, Seq[(Int, Seq[Double])])] = (0 until m).map { j =>
      val slices = train.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      j -> (if (portable) slices.toSeq.zipWithIndex
              .map { case (cv, cid) => (cid, cv.toSeq) }
            else kmeansArrays(slices, nCents, kmeansIters).zipWithIndex
              .map { case (cv, cid) => (cid, cv.toSeq) }.toSeq)
    }
    // one-row broadcast relation: codebook[j][cid] = centroid vector,
    // both levels sorted so element_at indexing is positional
    val cbRow = books.flatMap { case (j, cents) =>
      cents.map { case (cid, cv) => (j, cid, cv) } }
      .toDF("j", "cid", "cv")
      .groupBy("j").agg(sort_array(collect_list(struct(col("cid"), col("cv")))).as("cents"))
      .agg(sort_array(collect_list(struct(col("j"), col("cents")))).as("__cb"))

    // encode: m argmax-dot scans over the broadcast codebook — map-side
    // only, in ONE fused codegen kernel (expressions/PqEncode): the
    // transform/aggregate HOF spelling interpreted m × nCents struct walks
    // (each allocating a slice) per corpus row
    graft.functions.expressions.PqEncode.ensureRegistered(spark)
    graft.functions.expressions.PqLut.ensureRegistered(spark)
    graft.functions.expressions.PqAdc.ensureRegistered(spark)
    val encoded = c.crossJoin(broadcast(cbRow))
      .withColumn("code",
        call_function("pq_encode", col("v"), col("__cb"), lit(sub)))
      .select("id", "code")
      .localCheckpoint(false)

    // per-query ADC lookup tables over the same broadcast codebook (fused:
    // expressions/PqLut — same m × nCents slice-dot table, one compiled pass)
    val luts = unitized(
        queries.select(col("qid"), asDouble(col("qvec")).as("qv")), "qv")
      .crossJoin(broadcast(cbRow))
      .withColumn("lut",
        call_function("pq_lut", col("qv"), col("__cb"), lit(sub)))
      .select("qid", "lut")
    // score codes: m table lookups per (corpus row, query) — no vector
    // math; expressions/PqAdc fuses the zip_with+element_at+fold HOF chain
    val scored = encoded.join(broadcast(luts), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        call_function("pq_adc", col("code"), col("lut")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("id").asc)
    if (rerank <= 0)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    else {
      val shortlist = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k * rerank)
        .select("qid", "id")
      val qv = unitized(
        queries.select(col("qid"), asDouble(col("qvec")).as("qv")), "qv")
      shortlist
        .join(c, Seq("id"))
        .join(broadcast(qv), Seq("qid"))
        .select(col("qid"), col("id"), dot(col("v"), col("qv")).as("sim"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
  }

  /** Plain-array k-means on the driver (bounded inputs only): deterministic
    * init from the first kC points, L2 assignment, empty clusters keep
    * their previous centroid. */
  private def kmeansArrays(train: Array[Array[Double]], kC: Int,
      iters: Int): Array[Array[Double]] = {
    val dim = train(0).length
    var cents = train.take(kC).map(_.clone())
    if (cents.length < kC) cents = cents ++ Array.fill(kC - cents.length)(new Array[Double](dim))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kC)(new Array[Double](dim))
      val cnt = new Array[Long](kC)
      train.foreach { v =>
        var best = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < kC) { val dd = d2(v, cents(ci)); if (dd < bd) { bd = dd; best = ci }; ci += 1 }
        cnt(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map { ci =>
        if (cnt(ci) == 0) cents(ci)
        else sums(ci).map(_ / cnt(ci))
      }.toArray
      it += 1
    }
    cents
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, blocked by LSH
    * bucket so the pair join never goes quadratic in the corpus. Buckets are
    * capped at `maxBucket` rows (same skew guard as Dedup.minhashCandidates):
    * a pathological bucket of 10^6 vectors would otherwise emit 10^12 pairs. */
  def cosineNearDup(corpus: DataFrame, threshold: Double, nBits: Int = 8,
      maxBucket: Int = 1024, portable: Boolean = false): DataFrame = {
    val c = corpus.select(col("id"), asDouble(col("vec")).as("v"))
      .withColumn("bucket",
        if (portable) lshBucketPortable(col("v"), nBits)
        else lshBucket(col("v"), nBits))
    val capped = c.withColumn("rn",
        row_number().over(Window.partitionBy("bucket").orderBy("id")))
      .filter(col("rn") <= maxBucket).drop("rn")
    val a = capped.select(col("bucket"), col("id").as("idA"), col("v").as("vA"))
    val b = capped.select(col("bucket"), col("id").as("idB"), col("v").as("vB"))
    a.join(b, Seq("bucket")).filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), cosine(col("vA"), col("vB")).as("sim"))
      .filter(col("sim") >= threshold)
      .dropDuplicates("idA", "idB")
  }
}
