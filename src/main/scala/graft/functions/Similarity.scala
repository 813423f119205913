package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — exact, O(Q·N), correct at any
  * scale when the query set is broadcastable. Scale path: random-
  * hyperplane LSH bucketing so candidate generation is a bucket-equijoin
  * instead of a cross product.
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions with
  * element-wise cast to double — stays in Catalyst (no UDF), exact float →
  * double promotion.
  */
object Similarity {

  /** Sum of element-wise products in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine via the codegen'd Catalyst expression (one fused loop/row);
    * `cosineHof` keeps the declarative higher-order-function formulation —
    * both produce bit-identical doubles (asserted in tests).
    */
  def cosine(a: Column, b: Column): Column = CosineSim.cosine_sim(a, b)

  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact top-k cosine neighbors for the given query ids. The query side
    * is tiny → broadcast; the corpus side streams once through a
    * BroadcastNestedLoopJoin, then a per-query top-k window. At 1000
    * executors this is one corpus scan regardless of |queries|≤O(1000).
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col(vecCol)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Random-hyperplane signature: bit j = sign(v · r_j). Hyperplanes are
    * derived from a fixed seed so buckets are reproducible across runs
    * (and across the oracle re-run).
    */
  private def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits, dim)(rng.nextGaussian())
  }

  /** Add an LSH bucket column. Same-bucket vectors are cosine-close with
    * high probability; use `probes > 0` to also emit single-bit-flipped
    * buckets (multi-probe) for recall.
    */
  def withLshBucket(emb: DataFrame, vecCol: String, bits: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val sigUdf = udf { (v: Seq[Float]) =>
      var sig = 0L
      var j = 0
      while (j < planes.length) {
        var s = 0.0
        var i = 0
        val p = planes(j)
        while (i < p.length && i < v.length) { s += p(i) * v(i); i += 1 }
        if (s > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    emb.withColumn("lsh_bucket", sigUdf(col(vecCol)))
  }

  /** IVF (inverted-file) ANN index: the scale path for top-k search over a
    * corpus too large for brute force. Build: sample `nCells` centroids from
    * the corpus (seeded — reproducible), broadcast them, assign every vector
    * to its nearest centroid ("cell") in one distributed pass. Search: per
    * query, rank cells by centroid cosine, probe the `nProbe` best via a
    * broadcast-join on the cell id, exact cosine inside the probed cells.
    *
    * Scale posture: the corpus is scanned once at build and never again; a
    * search touches ~nProbe/nCells of the data via the cell equi-join (the
    * cell column would be the partition/bucket key of a persisted index at
    * 100 TB). Centroids are O(nCells·dim) — e.g. 65k cells × 64 dims ≈ 33 MB
    * — safely broadcastable; nothing else reaches the driver. With
    * nProbe = nCells the result equals brute force exactly.
    */
  /** Ceiling on the input size (plan-statistics bytes) above which
    * [[ivfAssign]]'s `sampleFraction = 0.0` convenience default refuses to
    * run — the default sizes the centroid sample with a full `count()`
    * scan, fine for small corpora but a silent extra pass over a 100 TB
    * input. Above this, callers must pass an explicit fraction.
    */
  val SizingScanMaxBytes: Long = 8L << 30 // 8 GiB

  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L,
      sampleFraction: Double = 0.0): (DataFrame, Array[(Int, Array[Float])]) = {
    // Seeded uniform sample of centroid vectors, small by construction.
    // Pass sampleFraction explicitly at scale; the 0.0 default sizes it
    // with a count() — one extra scan, convenient for small corpora only,
    // and gated: plan statistics (file-size estimates, no scan) refuse the
    // sizing count() on a large input instead of documenting the footgun.
    val fraction =
      if (sampleFraction > 0) sampleFraction
      else {
        val bytes = emb.queryExecution.optimizedPlan.stats.sizeInBytes
        // sizeInBytes == defaultSizeInBytes means the plan has NO
        // computable statistics (RDD-backed LogicalRDD, some views /
        // streaming frames) — the sentinel is Long.MaxValue-ish, not a
        // measurement, so treat it as UNKNOWN and allow the count()
        // rather than spuriously refusing a tiny in-memory frame. The
        // guard exists to refuse KNOWN-large scans; a genuinely huge
        // stats-less input is on the caller (pass sampleFraction).
        val unknown =
          bytes == emb.sparkSession.sessionState.conf.defaultSizeInBytes
        require(unknown || bytes <= SizingScanMaxBytes,
          s"ivfAssign(sampleFraction = 0.0) would run a full count() scan " +
            s"to size the centroid sample, but the input is ~$bytes bytes " +
            s"(> $SizingScanMaxBytes); pass an explicit sampleFraction at scale")
        math.min(1.0, nCells * 20.0 / math.max(emb.count(), 1L))
      }
    val centroids = emb.select(col(vecCol)).na.drop()
      .sample(withReplacement = false, fraction, seed)
      .limit(nCells).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap)
    val bc = emb.sparkSession.sparkContext.broadcast(centroids)
    (emb.withColumn("ivf_cell", nearestCentroidUdf(bc)(col(vecCol))), centroids)
  }

  /** Nearest-centroid assignment UDF shared by [[ivfAssign]] (build) and
    * [[ivfAppend]] (maintenance) — identical scoring (dot / ||c||), so an
    * appended vector lands exactly where the original build would put it.
    */
  private def nearestCentroidUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Float])]]) =
    udf { (v: Seq[Float]) =>
      if (v == null) -1
      else {
        var best = -1; var bestScore = Double.MinValue
        for ((cid, c) <- bc.value) {
          var s = 0.0; var i = 0
          while (i < c.length && i < v.length) { s += c(i) * v(i); i += 1 }
          var n = 0.0; i = 0
          while (i < c.length) { n += c(i) * c(i); i += 1 }
          val score = if (n == 0) 0.0 else s / math.sqrt(n)
          if (score > bestScore) { bestScore = score; best = cid }
        }
        best
      }
    }

  /** Approximate top-k neighbors for the given query ids through an IVF
    * index (see [[ivfAssign]]). Exact within the probed cells.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nCells: Int = 16, nProbe: Int = 4,
      seed: Long = 42L, sampleFraction: Double = 0.0): DataFrame = {
    val (indexed, centroids) =
      ivfAssign(emb, idCol, vecCol, nCells, seed, sampleFraction)
    // In a real deployment `indexed` is a persisted table partitioned by
    // ivf_cell — build once, search many. Here it is recomputed per call.
    val bc = emb.sparkSession.sparkContext.broadcast(centroids)
    val probeUdf = udf { (v: Seq[Float]) =>
      if (v == null) Array.empty[Int]
      else bc.value.map { case (cid, c) =>
        var s = 0.0; var n = 0.0; var i = 0
        while (i < c.length && i < v.length) { s += c(i) * v(i); n += c(i) * c(i); i += 1 }
        (cid, if (n == 0) 0.0 else s / math.sqrt(n))
      }.sortBy(-_._2).take(nProbe).map(_._1)
    }
    val q = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("ivf_cell", explode(probeUdf(col("q_vec"))))
    val scored = indexed.join(broadcast(q), Seq("ivf_cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col(vecCol)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Persist an IVF index: the cell-assigned corpus written as parquet
    * PARTITIONED BY ivf_cell (so a probe reads only its cells' files —
    * partition pruning, the disk analog of the bucket equi-join), plus the
    * centroids as a small side table. Build once / search many: at 100 TB
    * the build is the one full-corpus job, every search after it touches
    * ~nProbe/nCells of the files.
    */
  def ivfWrite(emb: DataFrame, idCol: String, vecCol: String, path: String,
      nCells: Int = 16, seed: Long = 42L,
      sampleFraction: Double = 0.0): Unit = {
    val (indexed, centroids) =
      ivfAssign(emb, idCol, vecCol, nCells, seed, sampleFraction)
    indexed.write.mode("overwrite")
      .partitionBy("ivf_cell").parquet(s"$path/corpus")
    val spark = emb.sparkSession
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Search a persisted IVF index ([[ivfWrite]]). Query vectors are given
    * directly (O(|queries|·dim) driver memory); probe cells are computed
    * against the loaded centroids, then the corpus scan carries a
    * `ivf_cell IN (...)` literal filter — static partition pruning, only
    * the probed directories are read.
    */
  def ivfSearch(spark: SparkSession, path: String,
      queries: Seq[(Long, Array[Float])], k: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def cellsFor(v: Array[Float]): Seq[Int] =
      centroids.map { case (cid, c) =>
        var s = 0.0; var n = 0.0; var i = 0
        val dim = math.min(c.length, v.length)
        while (i < dim) { s += c(i) * v(i); i += 1 }
        i = 0
        while (i < c.length) { n += c(i) * c(i); i += 1 }
        (cid, if (n == 0) 0.0 else s / math.sqrt(n))
      }.sortBy(-_._2).take(nProbe).map(_._1).toSeq
    import spark.implicits._
    val probes = queries.flatMap { case (qid, v) =>
      cellsFor(v).map(cell => (qid, v.toSeq, cell))
    }.toDF("query_id", "q_vec", "ivf_cell")
    val allCells = probes.select("ivf_cell").as[Int].collect().distinct.toSeq
    val corpus = spark.read.parquet(s"$path/corpus")
      .filter(col("ivf_cell").isin(allCells: _*))
    val scored = corpus.join(broadcast(probes), Seq("ivf_cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", cosine(col("q_vec"), col(vecCol)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Incrementally add vectors to a persisted IVF index ([[ivfWrite]]):
    * assign each to its nearest EXISTING centroid (the index's frozen side
    * table, broadcast) and APPEND to the matching ivf_cell parquet
    * partitions — only the touched cell directories gain files, the corpus
    * is never rewritten. Centroids never move (the standard IVF
    * maintenance contract: distribution drift degrades cell BALANCE, not
    * correctness — a full-probe search stays exactly brute force). Watch
    * [[ivfCellStats]] and rebuild with [[ivfWrite]] when skew crosses the
    * caller's threshold.
    */
  def ivfAppend(emb: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = emb.sparkSession
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    require(centroids.nonEmpty, s"no centroids at $path/centroids")
    val bc = spark.sparkContext.broadcast(centroids)
    emb.withColumn("ivf_cell", nearestCentroidUdf(bc)(col(vecCol)))
      .write.mode("append").partitionBy("ivf_cell").parquet(s"$path/corpus")
  }

  /** Rebuild a persisted IVF index with FRESH centroids sampled from the
    * index's current contents — the re-cluster a pipeline runs when
    * [[ivfCellStats]] shows append drift has skewed the cells. Reads the
    * persisted corpus once (the ivf_cell column is dropped and
    * re-derived), writes a complete new index at `newPath`; the caller
    * swaps the serving path atomically (symlink/rename/metastore repoint)
    * and deletes the old index — the old index stays fully searchable
    * until then (build-aside, zero downtime).
    *
    * Correctness invariant (same as append): cell assignment never affects
    * full-probe results — re-clustering changes BALANCE, not answers; a
    * post-swap full-probe search equals brute force (gated).
    */
  def ivfRecluster(spark: SparkSession, path: String, newPath: String,
      nCells: Int = 16, seed: Long = 42L, sampleFraction: Double = 0.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(newPath != path,
      "recluster writes build-aside: newPath must differ from path")
    val corpus = spark.read.parquet(s"$path/corpus").drop("ivf_cell")
    ivfWrite(corpus, idCol, vecCol, newPath, nCells, seed, sampleFraction)
  }

  /** Per-cell vector counts + skew ratio (cell / mean) of a persisted
    * index — the observable an IVF re-cluster trigger watches. One
    * column-pruned corpus scan; the one-row mean is broadcast back, never
    * a driver round-trip.
    */
  def ivfCellStats(spark: SparkSession, path: String): DataFrame = {
    val counts = spark.read.parquet(s"$path/corpus")
      .groupBy("ivf_cell").agg(count(lit(1)).as("n_vectors"))
    val mean = counts.agg(avg(col("n_vectors")).as("mean_n"))
    counts.crossJoin(broadcast(mean))
      .select(col("ivf_cell"), col("n_vectors"),
        round(col("n_vectors") / col("mean_n"), 4).as("skew"))
  }

  /** Approximate all-pairs near neighbors: equijoin on the LSH bucket,
    * exact cosine inside each bucket, keep pairs >= minCosine. The shuffle
    * key is the bucket (2^bits values) — the cross product never
    * materializes.
    */
  def lshNearPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bits: Int = 12, dim: Int = 64): DataFrame = {
    val b = withLshBucket(emb, vecCol, bits, dim)
    val l = b.select(col("lsh_bucket"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = b.select(col("lsh_bucket"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.join(r, Seq("lsh_bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space into IVF cells
    * ([[ivfAssign]] — sampled centroids, nearest-centroid assignment),
    * then compare pairs ONLY within a cell — the candidate structure of
    * the published algorithm, where semantic duplicates land in the same
    * cluster and cross-cluster pairs are never materialized. Exact cosine
    * verify >= `minCosine` inside each cell. Approximate like SemDeDup
    * itself: a near-dup pair straddling a cell boundary is missed —
    * [[lshNearPairs]] is the sibling with a different (hyperplane) notion
    * of "same region".
    *
    * Scale posture: the shuffle key is the cell id; the within-cell join
    * is the quadratic term, so size `nCells` to the corpus (SemDeDup uses
    * ~100k clusters at a 5B-doc scale, keeping E[cell] small); centroids
    * stay a broadcast (O(nCells·dim)). With `nCells = 1` the operator
    * degrades to the exact all-pairs join — useful only for oracles and
    * tiny corpora.
    *
    * Reproducibility caveat (nCells > 1): centroids come from
    * [[ivfAssign]]'s Bernoulli `sample`, which draws per PARTITION — the
    * centroid set (hence the cell partition, hence which near-boundary
    * pairs are compared) depends on the input partitioning, not just the
    * seed. For run-to-run stability, persist the cell-assigned index
    * ([[ivfWrite]]) and dedup against it, exactly as a production
    * SemDeDup pass clusters once and reuses the assignment.
    */
  def semanticNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nCells: Int = 16, seed: Long = 42L,
      sampleFraction: Double = 0.0): DataFrame = {
    val (indexed, _) =
      ivfAssign(emb, idCol, vecCol, nCells, seed, sampleFraction)
    val l = indexed.select(col("ivf_cell"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val r = indexed.select(col("ivf_cell"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    l.join(r, Seq("ivf_cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** [[semanticNearDupPairs]] against a PERSISTED [[ivfWrite]] index —
    * the production SemDeDup shape: cluster once, dedup many. Reading the
    * stored cell assignment removes the run-to-run variance of the
    * Bernoulli centroid sample (see the caveat above) and the cell
    * equi-join reads the `partitionBy(ivf_cell)` layout, so each join
    * task touches exactly its cell's files.
    */
  def semanticNearDupPairsIndexed(spark: SparkSession, path: String,
      minCosine: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val indexed = spark.read.parquet(s"$path/corpus")
    val l = indexed.select(col("ivf_cell"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val r = indexed.select(col("ivf_cell"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    l.join(r, Seq("ivf_cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** First-wins keep over a persisted index ([[semanticNearDupPairsIndexed]]
    * drop set, anti-joined against the stored corpus). Returns the kept
    * corpus rows as stored (id, vector, ivf_cell).
    */
  def semanticDedupKeepIndexed(spark: SparkSession, path: String,
      minCosine: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val drops = semanticNearDupPairsIndexed(spark, path, minCosine,
        idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    spark.read.parquet(s"$path/corpus").join(drops, Seq(idCol), "left_anti")
  }

  /** Semantic dedup of an embedding corpus: drop every vector that is the
    * HIGHER id of a [[semanticNearDupPairs]] pair, so the earliest member
    * of each semantic-duplicate group inside a cell survives — the same
    * first-wins policy as the text-side `Dedup.nearDupKeepCorpus` (and
    * `clustersFromPairs` is the transitive upgrade if group-level
    * representatives are needed). Returns the kept rows of `emb`.
    */
  def semanticDedupKeep(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nCells: Int = 16, seed: Long = 42L,
      sampleFraction: Double = 0.0): DataFrame = {
    val drops = semanticNearDupPairs(emb, idCol, vecCol, minCosine,
        nCells, seed, sampleFraction)
      .select(col("id_b").as(idCol)).distinct()
    emb.join(drops, Seq(idCol), "left_anti")
  }
}
