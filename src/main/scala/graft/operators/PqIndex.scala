package graft.operators

import graft.functions.VectorFunctions.signBucket
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Product-quantized ANN index (Jégou et al. 2011, the FAISS `IndexIVFPQ`
  * shape) — the compression tier beyond int8: the embedding splits into
  * `m` subvectors, each encoded as its nearest centroid index from a
  * per-subspace k-means codebook, so a 64-dim fp32 vector (256 bytes)
  * stores as `m` single-byte codes (8 bytes at m=8 — 32× smaller). At
  * 100 TB the assignments relation IS the index cost, and PQ is what makes
  * billion-vector ANN fit on disk at all.
  *
  * Pieces, all built from parts this engine already has:
  *  - codebooks: [[KMeans.fitCentroids]] per subspace (deterministic
  *    lowest-id init — the whole index build is reproducible; at real
  *    scale train on a sample, the codebook converges long before the
  *    corpus ends);
  *  - cells: the same sign-bucket coarse layer as the other variants, so
  *    probed queries prune partitions identically;
  *  - query: asymmetric distance (ADC) — the query precomputes its
  *    m × ksub dot-product table against the codebooks ONCE on the driver
  *    (a bounded parameter, broadcast in the scoring closure), each
  *    candidate code scores with m table lookups, and the top
  *    `k · refine` candidates re-rank against the exact fp32 vectors
  *    (same refine contract as the int8 path: returned sims are
  *    full-precision).
  */
object PqIndex {

  /** Train per-subspace codebooks: `m` runs of k-means over the subvector
    * slices. Returns codebooks(j)(c) = centroid c of subspace j.
    */
  def trainCodebooks(vectors: DataFrame, m: Int, ksub: Int,
      iters: Int = 4): Seq[Seq[Seq[Double]]] = {
    val dim = vectors.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = vectors.select(col("vec_id"),
        slice(col("embedding"), j * dsub + 1, dsub).as("embedding"))
      KMeans.fitCentroids(sub, ksub, iters)
    }
  }

  /** Encode vectors against trained codebooks: adds `code`
    * (array<int>, length m — nearest sub-centroid per subspace, ties to
    * the lower index like every k-means assignment here).
    */
  def encode(vectors: DataFrame, codebooks: Seq[Seq[Seq[Double]]])
      : DataFrame = {
    val m = codebooks.size
    val dsub = codebooks.head.head.size
    val cb = typedlit(codebooks)
    vectors
      .withColumn("_e", col("embedding").cast("array<double>"))
      .withColumn("code",
        transform(sequence(lit(0), lit(m - 1)), j => {
          val sub = slice(col("_e"), j * dsub + 1, lit(dsub))
          val dists = transform(element_at(cb, j + 1), c =>
            round(aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, v) => acc + v), 6))
          (array_position(dists, array_min(dists)) - 1).cast("int")
        }))
      .drop("_e")
  }

  /** Build the PQ index: codebooks + cell-partitioned code table. The
    * fp32 embeddings are NOT stored here — the refine step reads them
    * from the source relation (FAISS's IVFPQ + refine layout).
    */
  def build(vectors: DataFrame, path: String, cellBits: Int = 6,
      m: Int = 8, ksub: Int = 16, iters: Int = 4): Unit = {
    val spark = vectors.sparkSession
    val codebooks = trainCodebooks(vectors, m, ksub, iters)
    val cells = encode(vectors, codebooks)
      .withColumn("cell", signBucket(col("embedding"), cellBits))
      .drop("embedding")
    cells.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assignments")
    // geometry + baseline markers for the frozen-codebook lifecycle (r16):
    // CELLBITS makes rebuild/append geometry-preserving (the IVF rebuild's
    // ADVICE-r15 doctrine), BASELINE_FIT pins the build-time
    // reconstruction error the per-append drift ratio rates against.
    // `vectors` here is already in index space (buildRotated pre-rotates),
    // so the fit is computed directly, never re-projected.
    IvfIndex.writeSmallFile(spark, s"$path/CELLBITS", cellBits.toString)
    IvfIndex.writeSmallFile(spark, s"$path/BASELINE_FIT",
      fitInIndexSpace(vectors, codebooks).toString)
    // code-collision advisory (r18, VERDICT r17 item 5): the measured
    // collapse mode is DISTINCT vector patterns sharing one full code —
    // their ADC scores then tie EXACTLY and the deterministic asc-id
    // candidate cut can fill with wrong-pattern rows (IvfServeScaleProbe:
    // overlap@5 = 0.000 at 64 patterns on ksub=16). Raw per-subspace
    // saturation (the obvious check) fires BENIGNLY on every continuous
    // corpus — k-means always uses all ksub clusters — so the signal here
    // is a full-code group spanning MULTIPLE coarse cells: rows in
    // different sign-bucket cells point in genuinely different directions,
    // and different directions sharing one code is exactly the tie
    // hazard. Same-cluster rows sharing a code stay silent (they share a
    // cell — honest ties). One aggregate over the (cell, code) columns of
    // the just-written table; advisory, never fatal — the breadcrumb an
    // operator investigating bad recall should find first.
    val collided = spark.read.parquet(s"$path/assignments")
      .groupBy(col("code"))
      .agg(countDistinct(col("cell")).as("ncells"))
      .filter(col("ncells") > 1)
      .count()
    val fsPath = new org.apache.hadoop.fs.Path(s"$path/CODE_COLLISION_ADVISORY")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (collided > 0) {
      IvfIndex.writeSmallFile(spark, s"$path/CODE_COLLISION_ADVISORY",
        s"codes_spanning_multiple_cells=$collided ksub=$ksub m=$m")
      Console.err.println(s"[PqIndex] WARNING: $collided full code(s) are " +
        s"shared across different coarse cells at ksub=$ksub — distinct " +
        "vector patterns collide onto one code, so exact ADC ties can " +
        "evict right-cluster candidates from a tight candidate cut; " +
        "consider a larger ksub or refine (see CODE_COLLISION_ADVISORY)")
    } else fs.delete(fsPath, false)
    // cell routing centroids from the ORIGINAL vectors (same as the other
    // variants: quantization error stays out of the routing structure)
    val routed = vectors.withColumn("cell",
      signBucket(col("embedding"), cellBits))
    routed
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("ps"))
      .select(col("cell"),
        transform(col("ps"), p => p.getField("cx").cast("float"))
          .as("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, ci) => (j, ci, c) }
    }.toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** OPQ-lite build (Ge et al. 2013 initialize OPQ from exactly this):
    * PCA-rotate the embeddings with the FULL orthogonal eigenbasis before
    * PQ. Rotation decorrelates dimensions, so subspace variances balance
    * and each 4-bit sub-codebook spends its budget where the variance is —
    * the standard cure for PQ's weakness on correlated dimensions. The
    * rotation is orthogonal and full-dimension: cosine is invariant under
    * it, so [[topKRotated]] refines against the ORIGINAL vectors and
    * returns exactly the sims an unrotated exact search would.
    */
  def buildRotated(vectors: DataFrame, path: String, cellBits: Int = 6,
      m: Int = 8, ksub: Int = 16, iters: Int = 4): Unit = {
    val spark = vectors.sparkSession
    val (eigs, comps) = Pca.fit(vectors)
    // fail with the intended divisibility message here: the greedy
    // allocation below would otherwise die in minBy on an empty filter
    // (obscure UnsupportedOperationException) before trainCodebooks'
    // own require ever runs
    require(comps.length % m == 0,
      s"embedding dim ${comps.length} must be divisible by m=$m subspaces")
    // Parametric OPQ allocation (Ge et al. 2013 §4): raw PCA order stuffs
    // all the variance into subspace 0 and starves the others' codebooks —
    // measured recall@10 DROPPED 0.87 -> 0.74 at nprobe 8 on the clustered
    // vectors. Balance instead: assign components greedily, each to the
    // subspace with the smallest current eigenvalue PRODUCT (equalizing
    // the product equalizes each sub-codebook's quantization budget).
    val dsub = comps.length / m
    val slots = Array.fill(m)(0)
    val logProd = Array.fill(m)(0.0)
    val assign = Array.fill(comps.length)(-1)
    for (i <- comps.indices) { // eigenvalues arrive sorted desc
      val j = (0 until m)
        .filter(slots(_) < dsub)
        .minBy(s => (logProd(s), s))
      assign(i) = j
      slots(j) += 1
      logProd(j) += math.log(math.max(eigs(i), 1e-12))
    }
    val order = (0 until m).flatMap(j =>
      comps.indices.filter(assign(_) == j))
    val rotation: Seq[Seq[Double]] = order.map(comps(_).toSeq)
    val rotated = Pca.project(vectors, rotation)
      .drop("embedding")
      .withColumnRenamed("projected", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    build(rotated, path, cellBits, m, ksub, iters)
    import spark.implicits._
    rotation.zipWithIndex.map { case (row, i) => (i, row) }
      .toDF("component", "weights")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/rotation")
  }

  /** Query a [[buildRotated]] index: the query routes and ADC-scores in
    * the ROTATED space (matching the stored codes/centroids), then refines
    * with the original query against the original fp32 vectors (cosine is
    * rotation-invariant, so the refine sims are identical either way).
    */
  def topKRotated(spark: SparkSession, path: String, fullVectors: DataFrame,
      qvec: Array[Float], k: Int, nprobe: Int, refine: Int = 4): DataFrame = {
    val rotation = spark.read.parquet(s"$path/rotation")
      .orderBy("component").collect()
      .map(_.getSeq[Double](1).toArray)
    val rq = rotation.map { row =>
      var dot = 0.0
      var i = 0
      while (i < row.length && i < qvec.length) { dot += row(i) * qvec(i); i += 1 }
      dot.toFloat
    }
    topKImpl(spark, path, fullVectors, routeQvec = rq, refineQvec = qvec,
      k = k, nprobe = nprobe, refine = refine)
  }

  /** Query: probe cells, ADC-score the probed codes, refine the top
    * `k · refine` against the exact fp32 vectors. Output matches the
    * other index variants: pass-through columns + full-precision `sim`.
    */
  def topK(spark: SparkSession, path: String, fullVectors: DataFrame,
      qvec: Array[Float], k: Int, nprobe: Int, refine: Int = 4): DataFrame =
    topKImpl(spark, path, fullVectors, routeQvec = qvec, refineQvec = qvec,
      k = k, nprobe = nprobe, refine = refine)

  /** Shared query core: `routeQvec` drives cell probing + ADC scoring (the
    * index's own space — rotated for [[buildRotated]]), `refineQvec` the
    * exact re-rank against `fullVectors`.
    */
  private def topKImpl(spark: SparkSession, path: String,
      fullVectors: DataFrame, routeQvec: Array[Float],
      refineQvec: Array[Float], k: Int, nprobe: Int, refine: Int)
      : DataFrame = {
    val qvec = routeQvec
    val cells = IvfIndex.probeCells(spark, path, qvec, nprobe)
    // the query's m × ksub dot-product table — bounded driver-side math
    val codebooks = spark.read.parquet(s"$path/codebooks")
      .orderBy("subspace", "centroid_id")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray).toArray)
    val m = codebooks.size
    val dsub = codebooks.head.head.length
    val lut: Array[Array[Double]] = Array.tabulate(m) { j =>
      codebooks(j).map { c =>
        var dot = 0.0
        var t = 0
        while (t < dsub) { dot += qvec(j * dsub + t) * c(t); t += 1 }
        dot
      }
    }
    val lutLit = typedlit(lut.map(_.toSeq).toSeq)
    val candidateIds = spark.read.parquet(s"$path/assignments")
      .filter(col("cell").isin(cells: _*))
      // ADC: approximate dot = sum over subspaces of lut(j)(code(j)) —
      // the codegen'd kernel (r18; bitwise-equal fold order)
      .withColumn("asim",
        graft.functions.VectorFunctions.adcScore(col("code"), lutLit))
      .orderBy(desc("asim"), asc("vec_id"))
      .limit(k * refine)
      .select(col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    val passThrough = fullVectors.columns
      .filterNot(_ == "embedding").toSeq.map(col)
    fullVectors
      .filter(col("vec_id").isin(candidateIds: _*))
      .withColumn("sim", round4(graft.functions.VectorFunctions
        .cosineSim(col("embedding"), typedlit(refineQvec))))
      .select(passThrough :+ col("sim"): _*)
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  // --- frozen-codebook lifecycle (r16, VERDICT r15 item 7): the SAME
  // drift->rebuild policy the IVF index ships (IvfIndex.scala:134-258) —
  // codebooks are frozen at build time, a drifted stream's codes land far
  // from every sub-centroid and ADC recall silently degrades; the
  // per-append reconstruction-error ratio against the pinned baseline is
  // the ground-truth-free signal, and the threshold rule / advisory
  // marker / rebuild bracket are IvfIndex's own (they are path-generic).

  /** Stored codebooks as codebooks(j)(c) — a bounded parameter read
    * (m x ksub x dsub doubles).
    */
  private[graft] def readCodebooks(spark: SparkSession, path: String)
      : Seq[Seq[Seq[Double]]] =
    spark.read.parquet(s"$path/codebooks")
      .orderBy("subspace", "centroid_id").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq)

  /** True when `path` holds a completed PQ index (codes + codebooks). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/assignments/_SUCCESS")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/codebooks/_SUCCESS"))
  }

  private def hasRotation(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/rotation/_SUCCESS"))
  }

  /** Cell geometry of the stored index. REQUIRED, never guessed (ADVICE
    * r16): an index written before the CELLBITS marker existed, built with
    * non-default bits, would otherwise route appended rows into a
    * DIFFERENT sign-bucket geometry than the resident cell partitions —
    * silently corrupting probe pruning. The recovery for a marker-less
    * index is one [[rebuildIndex]] run, which re-writes the marker.
    */
  private def storedCellBits(spark: SparkSession, path: String): Int =
    IvfIndex.readSmallFile(spark, s"$path/CELLBITS")
      .map(_.trim.toInt).getOrElse(throw new IllegalStateException(
        s"no CELLBITS marker at $path — the index predates the geometry " +
          "marker; rebuild it (build/buildRotated at the original " +
          "cellBits) to adopt the marker before append/rebuild"))

  /** Vectors mapped into the index's own space: identity for a plain PQ
    * index, the stored OPQ rotation for a [[buildRotated]] one — appends
    * and fit ratings must encode in the space the codebooks were trained
    * in.
    */
  private def inIndexSpace(vectors: DataFrame, path: String): DataFrame = {
    val spark = vectors.sparkSession
    if (!hasRotation(spark, path)) vectors
    else {
      val rotation = spark.read.parquet(s"$path/rotation")
        .orderBy("component").collect()
        .map(_.getSeq[Double](1).toSeq).toSeq
      Pca.project(vectors, rotation)
        .drop("embedding")
        .withColumnRenamed("projected", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
    }
  }

  /** Mean PQ reconstruction error of `vs` (already in index space) against
    * `codebooks`: per row, the sum over subspaces of the squared distance
    * to the NEAREST sub-centroid — exactly the quantity k-means training
    * minimized, so the build-time pin is the "codebooks fit this data"
    * floor and a drifted batch rates a large multiple of it.
    */
  private def fitInIndexSpace(vs: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]]): Double = {
    val m = codebooks.size
    val dsub = codebooks.head.head.size
    val cb = typedlit(codebooks)
    val fit = (0 until m).map { j =>
      val sub = slice(col("_e"), j * dsub + 1, dsub)
      array_min(transform(element_at(cb, j + 1), c =>
        round(aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v), 6)))
    }.reduce(_ + _)
    vs.withColumn("_e", col("embedding").cast("array<double>"))
      .agg(avg(fit)).head.getDouble(0)
  }

  /** One batch's reconstruction fit against the FROZEN codebooks — the
    * drift signal ([[graft.streaming.StreamingIngest.pqBatch]] rates each
    * applied append's `assignmentFit / baselineFit` through
    * `IvfIndex.writeFitRow`/`fitTripped`).
    */
  def assignmentFit(vectors: DataFrame, path: String): Double = {
    val spark = vectors.sparkSession
    fitInIndexSpace(inIndexSpace(vectors, path), readCodebooks(spark, path))
  }

  /** Append vectors WITHOUT retraining: encode against the stored (frozen)
    * codebooks in index space, route cells by the same data-independent
    * sign-bucket split, append only the touched cell partitions. Routing
    * centroids stay frozen (they rank probe order only; [[rebuildIndex]]
    * refreshes them). Cost O(batch), the IVF append contract.
    */
  def append(vectors: DataFrame, path: String): Unit = {
    val spark = vectors.sparkSession
    require(exists(spark, path), s"no completed PQ index at $path — build()")
    val cellBits = storedCellBits(spark, path)
    val codebooks = readCodebooks(spark, path)
    val encoded = encode(inIndexSpace(vectors, path), codebooks)
      .withColumn("cell", signBucket(col("embedding"), cellBits))
      .drop("embedding")
      .persist()
    try {
      encoded.repartition(col("cell"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$path/assignments")
      // advisory refresh (r19, ADVICE r18): build() computes the
      // cross-cell code-sharing advisory once, but a DRIFTED appended
      // batch is exactly where new sharing appears — leaving the marker
      // stale until the next rebuild weakens the "breadcrumb an operator
      // finds first" contract. Any collision introduced by this append
      // involves at least one batch row, hence one of the batch's
      // distinct full codes — so the check is a broadcast semi-join of
      // those (bounded, O(batch)) codes against the table's two narrow
      // (code, cell) columns, never the full-width relation. The marker
      // is UPDATED on a hit and left alone on zero: absence of
      // batch-involved collisions says nothing about pre-existing ones
      // (build()/rebuildIndex() own the clear).
      val batchCodes = encoded.select(col("code")).distinct()
      val newCollided = spark.read.parquet(s"$path/assignments")
        .select(col("code"), col("cell"))
        .join(broadcast(batchCodes), Seq("code"))
        .groupBy(col("code"))
        .agg(countDistinct(col("cell")).as("ncells"))
        .filter(col("ncells") > 1)
        .count()
      if (newCollided > 0) {
        val m = codebooks.size
        val ksub = codebooks.head.size
        IvfIndex.writeSmallFile(spark, s"$path/CODE_COLLISION_ADVISORY",
          s"codes_spanning_multiple_cells=$newCollided ksub=$ksub m=$m " +
            "source=append")
        Console.err.println(s"[PqIndex] WARNING: after append, " +
          s"$newCollided full code(s) involving this batch span multiple " +
          s"coarse cells at ksub=$ksub — distinct vector patterns collide " +
          "onto one code; consider rebuilding with a larger ksub " +
          "(see CODE_COLLISION_ADVISORY)")
      }
    } finally encoded.unpersist()
  }

  /** OFFLINE rebuild of a drift-tripped PQ index: re-train codebooks (and
    * the OPQ rotation, when the index has one) on `source` — the fp32
    * sibling relation the refine step already requires, which holds every
    * committed vector — then swap, re-pin BASELINE_FIT, and clear the
    * advisory/fit state that rated the RETIRED codebooks.
    * `_stream_commits/` is untouched, so a post-swap replay of a committed
    * batch still no-ops. Geometry (m, ksub, cellBits) defaults to the
    * stored codebooks' own — an operator answering REBUILD_ADVISED cannot
    * silently change the code layout. `_REBUILD_INPROGRESS` brackets the
    * swap; recovery from a stale bracket is re-running rebuildIndex
    * (idempotent — it reads only `source` and markers, never the
    * mid-swap relations).
    */
  def rebuildIndex(spark: SparkSession, path: String, source: DataFrame,
      m: Int = 0, ksub: Int = 0, iters: Int = 4): Unit = {
    require(exists(spark, path), s"no completed PQ index at $path")
    val stored = readCodebooks(spark, path)
    val mm = if (m > 0) m else stored.size
    val kk = if (ksub > 0) ksub else stored.head.size
    val cellBits = storedCellBits(spark, path)
    IvfIndex.writeSmallFile(spark, s"$path/_REBUILD_INPROGRESS",
      System.nanoTime().toString)
    if (hasRotation(spark, path))
      buildRotated(source, path, cellBits, mm, kk, iters)
    else build(source, path, cellBits, mm, kk, iters)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_fit"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/REBUILD_ADVISED"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_REBUILD_INPROGRESS"),
      false)
  }

  /** Bytes of the stored code table (the compression numerator). Hadoop
    * FS (r15 sweep) so the gauge also reads non-local index paths.
    */
  def assignBytes(path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(s"$path/assignments")
    val fs = root.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName.endsWith(".parquet")) total += st.getLen
    }
    total
  }
}
