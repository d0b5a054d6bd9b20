package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`ArrayType(FloatType)`) — north-star extension, SURVEY §2.11.
 *
 * Two paths:
 *  - brute-force cosine top-k: exact baseline; the probe set is small and
 *    broadcast, so the scan over N candidates is embarrassingly parallel
 *    and shuffles only k rows per query (partial top-k under the window).
 *  - sign-LSH (random hyperplanes): candidates share a bucket of
 *    hyperplane signs; at 100 TB the bucket key is the shuffle key and
 *    per-bucket work is bounded. This is the SimHash-for-vectors scheme;
 *    multi-probe = more bands.
 *
 * Dot products use `zip_with` + `aggregate` (sequential per-row array
 * fold: deterministic, no UDF). Expression staging rule (see Dedup):
 * higher-order lambdas are interpreted with no subexpression sharing, so
 * the dimension-index array is materialized once as `__idx` rather than
 * rebuilt inside every plane's projection.
 */
object Similarity {

  /** Sequential fold dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplane component: value in [-1, 1)
    * derived from (plane, dim) by hashing — no RNG state, so every
    * executor derives identical planes. */
  private def planeComponent(plane: Int, dim: Column): Column = {
    val seed = lit(plane.toLong * 0x9E3779B97F4A7C15L)
    (pmod(xxhash64(dim, seed), lit(2000001L)) - 1000000L).cast("double") / 1000000.0
  }

  /** Sign-LSH bucket id over a vector + PRE-MATERIALIZED index array:
    * one bit per hyperplane = sign of <v, r_p>. `planeOffset` selects an
    * independent plane set per band. */
  def signBucket(v: Column, idx: Column, planes: Int, planeOffset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(v, idx, (x, i) => x * planeComponent(planeOffset + p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** The dimension-index array `[0, size)` to stage next to the vector. */
  def dimIndex(v: Column): Column = sequence(lit(0), size(v) - 1)

  /**
   * Exact brute-force cosine top-k for a set of query vectors.
   * `queries` must be small enough to broadcast (it is, by construction
   * of "probe set"); ties broken by candidate id for determinism.
   */
  def bruteForceTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {

    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /**
   * LSH-bucketed ANN top-k: only candidates sharing the query's sign
   * bucket in at least one band are scored. Recall grows with `bands`;
   * cost is bands x bucket-local joins instead of a full scan.
   * Convenience composition of [[lshFit]] + [[lshProbe]] — a real
   * pipeline fits once and probes many (same economics as IVF).
   */
  def lshTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      planes: Int = 12, bands: Int = 4): DataFrame =
    lshProbe(lshFit(candidates, idCol, vecCol, planes, bands),
      queries, idCol, vecCol, k)

  /**
   * A fitted sign-LSH search index — the LSH sibling of [[IvfIndex]],
   * same lifecycle (fit once / probe many / `filtered` for
   * metadata-predicated ANN / save / load / extend / close). `banded`
   * is the (neighbor_id, c_vec, band, bucket, meta…) relation — the
   * bucket key is the shuffle/pruning key at scale. planes/bands ride
   * with the index (a probe banded with different hyperplanes would
   * silently never match — same failure class as a shingle-k mismatch,
   * see `Dedup.EmbeddingIndex`).
   */
  final case class LshIndex(banded: DataFrame, planes: Int, bands: Int,
                            savedDir: Option[String] = None,
                            version: Long = 1L,
                            folded: Seq[String] = Nil,
                            parent: Option[String] = None) {
    /** Pin the banded relation in executor storage for repeated probing. */
    def cache(): LshIndex = { banded.cache(); this }

    /** Metadata-filtered view for FILTERED ANN — the LSH analog of
      * [[IvfIndex.filtered]]: the predicate (over metadata columns
      * carried into `banded` by `lshFit(metaCols = ...)`) prunes the
      * bucket relation BEFORE the bucket join, so candidate generation
      * never sees non-qualifying rows and top-k fills from qualifying
      * rows only — post-filtering a global top-k would under-fill it.
      * On a saved index the filter reaches the parquet scan of `banded`
      * (plain pushdown). Build once per predicate, probe many. The view
      * drops `savedDir` AND `parent`: `close()` on a view must not
      * delete the full index's tree, and `save()` of a view persists
      * the subset as a NEW unrelated tree — carrying the full index's
      * lineage would make the subset indistinguishable from a complete
      * successor of its grandparent. */
    def filtered(predicate: Column): LshIndex =
      copy(banded = banded.filter(predicate), savedDir = None, parent = None)

    def unpersist(): LshIndex = { banded.unpersist(false); this }

    /** Persist; planes/bands land in a one-row meta table so a load can
      * never probe with mismatched hyperplanes. Returns the index with
      * `savedDir` recorded for [[close]]. NOTE the stale-guard's scope:
      * save stamps the handle's CURRENT version (extend/compact are what
      * bump), so two different indexes saved in sequence over the same
      * dir at the same version are indistinguishable to the guard —
      * in-place re-save at an unchanged version is outside its
      * protection (same for all index families). */
    def save(dir: String): LshIndex = {
      banded.write.mode("overwrite").parquet(s"$dir/banded")
      val spark = banded.sparkSession
      import spark.implicits._
      Seq((planes, bands)).toDF("planes", "bands")
        .write.mode("overwrite").parquet(s"$dir/meta")
      IndexMeta.write(spark, dir, IndexMeta.Meta(version,
        parent = parent.orElse(savedDir).filterNot(_ == dir), folded = folded,
        rows = IndexMeta.rowCounts(spark, dir, Seq("banded"))))
      copy(savedDir = Some(dir))
    }

    /** Retire this index version in ONE call — unpersist + delete the
      * saved tree, if any; same contract as `CorpusIndex.close`,
      * including the stale-handle refusal ([[IndexMeta]]). */
    def close(): Unit = {
      unpersist()
      savedDir.foreach { d =>
        val spark = banded.sparkSession
        IndexMeta.requireCurrent(spark, d, version, "close()")
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true)
      }
    }
  }

  /** The (id, vec, band, bucket, meta…) banded relation both index fit
    * and probe use; hyperplanes derive deterministically from
    * (plane, dim) hashes, so both sides band identically with no shared
    * RNG state. */
  private def bandVectors(df: DataFrame, idCol: String, vecCol: String,
                          idAs: String, vecAs: String,
                          planes: Int, bands: Int,
                          metaCols: Seq[String]): DataFrame =
    df.select((col(idCol).as(idAs) +: col(vecCol).as(vecAs) +:
        metaCols.map(col)) :+
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            graft.functions.VectorExpressions
              .sign_lsh_bucket(col(vecCol), planes, b * planes).as("bucket"))
        }: _*)).as("bb"): _*)
      .select(col(idAs) +: col(vecAs) +: col("bb.band") +: col("bb.bucket") +:
        metaCols.map(col): _*)

  /** Fit the sign-LSH index: band every candidate. `metaCols` names
    * metadata columns to carry into the banded relation (and the saved
    * parquet tree) so probes can pre-filter candidates via
    * [[LshIndex.filtered]] — the production filtered-ANN shape. */
  def lshFit(candidates: DataFrame, idCol: String, vecCol: String,
             planes: Int = 12, bands: Int = 4,
             metaCols: Seq[String] = Nil): LshIndex =
    LshIndex(bandVectors(candidates, idCol, vecCol, "neighbor_id", "c_vec",
      planes, bands, metaCols), planes, bands)

  def loadLshIndex(spark: org.apache.spark.sql.SparkSession, dir: String): LshIndex = {
    val meta = spark.read.parquet(s"$dir/meta")
      .select(col("planes"), col("bands")).head()
    val stamp = IndexMeta.read(spark, dir)
    LshIndex(spark.read.parquet(s"$dir/banded"),
      meta.getInt(0), meta.getInt(1), savedDir = Some(dir),
      version = stamp.map(_.version).getOrElse(1L),
      folded = stamp.map(_.folded).getOrElse(Nil),
      parent = stamp.flatMap(_.parent))
  }

  /** Grow an [[LshIndex]] with `newVecs` WITHOUT refitting — bands the
    * new vectors with the index's OWN planes/bands and unions, exactly
    * O(new vectors); the corpus-sized banded relation is untouched.
    * Metadata columns carried by the index are preserved (`newVecs`
    * must supply them), so filtered probes see old and new vectors
    * alike. Same append-only id contract as the other index families. */
  def extendLshIndex(index: LshIndex, newVecs: DataFrame,
                     idCol: String, vecCol: String): LshIndex = {
    val metaCols = index.banded.columns.toSeq
      .filterNot(Set("neighbor_id", "c_vec", "band", "bucket"))
    // a NEW version: savedDir dropped (close() of the extension must not
    // delete the parent's tree), version bumped, lineage carried — the
    // parent's tree becomes this version's `parent` for the next save
    index.copy(banded = index.banded.unionByName(
      bandVectors(newVecs, idCol, vecCol, "neighbor_id", "c_vec",
        index.planes, index.bands, metaCols)),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Shrink an [[LshIndex]] by retired ids — one streaming anti-join on
    * the banded relation. The hyperplanes are deterministic, so
    * `remove(fit(A ∪ R), R) ≡ fit(A)` bucket-for-bucket with no
    * re-admission bookkeeping (the same argument as
    * [[graft.extensions.Dedup.removeFromEmbeddingIndex]]). */
  def removeFromLshIndex(index: LshIndex, removedIds: DataFrame,
                         idCol: String): LshIndex = {
    val rm = removedIds.select(col(idCol).as("neighbor_id")).distinct()
    index.copy(banded = index.banded.join(rm, Seq("neighbor_id"), "left_anti"),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Probe a fitted [[LshIndex]]: only candidates sharing a query's
    * bucket in at least one band are scored; the banded probe side is
    * tiny and broadcast. */
  def lshProbe(index: LshIndex, queries: DataFrame,
               idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(bandVectors(queries, idCol, vecCol,
      "query_id", "q_vec", index.planes, index.bands, Nil))
    val scored = index.banded
      .join(q, Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("q_vec"), col("c_vec")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /**
   * IVF (inverted-file) ANN top-k — the other classic scale path next to
   * sign-LSH: a KMeans coarse quantizer (`nlist` cells, fixed seed)
   * partitions the corpus; each query probes its `nprobe` nearest cells
   * and scores only those candidates.
   *
   * At 100 TB: cell assignment is one `transform` pass; the probe join
   * shuffles on the cell id (bounded, ~N/nlist per cell); centroids are
   * tiny and broadcast. Training fits on a sample — pass `trainFraction`
   * < 1 for very large corpora.
   */
  def ivfTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      trainFraction: Double = 1.0): DataFrame =
    ivfProbe(ivfFit(candidates, idCol, vecCol, nlist, seed, trainFraction),
      queries, idCol, vecCol, k, nprobe)

  /**
   * A fitted IVF index: the tiny centroid table plus the cell-assigned
   * corpus. Build ONCE (`ivfFit`), reuse across probe calls — a real
   * pipeline never re-trains the quantizer per query. `save`/`loadIvfIndex`
   * persist it as parquet partitioned by cell, so a 100 TB corpus's index
   * is probed with cell-partition pruning and zero rebuild cost.
   */
  final case class IvfIndex(centers: DataFrame, assigned: DataFrame,
                            savedDir: Option[String] = None,
                            version: Long = 1L,
                            folded: Seq[String] = Nil,
                            parent: Option[String] = None) {
    /** Pin the assignment in executor storage for repeated probing. */
    def cache(): IvfIndex = { assigned.cache(); centers.cache(); this }

    /** Metadata-filtered view of this index for FILTERED ANN: the
      * predicate (over metadata columns carried into `assigned` by
      * `ivfFit(metaCols = ...)`) restricts the cell-assigned corpus
      * BEFORE candidate generation, so top-k fills from qualifying rows
      * only — post-filtering a global top-k would under-fill it. On a
      * saved index the filter reaches the parquet scan of `assigned`
      * (plain pushdown, composed with cell-partition pruning); on a
      * cached one it shares the unfiltered index's executor storage.
      * The view is cheap — build once per predicate and probe many.
      * The view drops `savedDir` AND `parent`: `close()` on a view must
      * not delete the full index's tree, and `save()` of a view
      * persists the subset as a NEW unrelated tree with no inherited
      * lineage. */
    def filtered(predicate: Column): IvfIndex =
      copy(assigned = assigned.filter(predicate), savedDir = None, parent = None)

    /** Release executor storage pinned by [[cache]] (long-lived services
      * must pair every cache with this; short-lived mains may skip it). */
    def unpersist(): IvfIndex = {
      assigned.unpersist(false); centers.unpersist(false); this
    }

    /** Returns the index with `savedDir` recorded for [[close]]. */
    def save(dir: String): IvfIndex = {
      centers.write.mode("overwrite").parquet(s"$dir/centers")
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/assigned")
      val spark = centers.sparkSession
      IndexMeta.write(spark, dir, IndexMeta.Meta(version,
        parent = parent.orElse(savedDir).filterNot(_ == dir), folded = folded,
        rows = IndexMeta.rowCounts(spark, dir, Seq("centers", "assigned"))))
      copy(savedDir = Some(dir))
    }

    /** Retire this index version in ONE call — unpersist + delete the
      * saved tree, if any; same contract as `CorpusIndex.close`,
      * including the stale-handle refusal ([[IndexMeta]]). */
    def close(): Unit = {
      unpersist()
      savedDir.foreach { d =>
        val spark = centers.sparkSession
        IndexMeta.requireCurrent(spark, d, version, "close()")
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true)
      }
    }
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex = {
    val stamp = IndexMeta.read(spark, dir)
    IvfIndex(
      spark.read.parquet(s"$dir/centers"),
      spark.read.parquet(s"$dir/assigned"),
      savedDir = Some(dir),
      version = stamp.map(_.version).getOrElse(1L),
      folded = stamp.map(_.folded).getOrElse(Nil),
      parent = stamp.flatMap(_.parent))
  }

  /** Assign vectors to their nearest cell of an EXISTING centroid table
    * (squared Euclidean — KMeans' own metric; ties to the lowest cell
    * id). The centroid matrix rides as ONE broadcast single-row
    * relation (the sorted array-of-structs), and the argmin is a single
    * `transform` + `array_min` over that column: zero shuffle, zero
    * ML-pipeline dependency at probe/extend time, O(1) plan NODES in
    * nlist, and — unlike the earlier `typedlit` formulation — O(1)
    * TASK-BINARY bytes in nlist: a plan literal is serialized into
    * every task, so a production 64k-cell × 128-dim index would ship
    * ~32 MB with each of thousands of tasks, while the broadcast
    * relation ships once per executor through the block manager (the
    * same transport `KMeans.transform`'s model broadcast uses). The
    * join is a 1-row BroadcastNestedLoopJoin — each output row
    * references the broadcast array, no per-row copy. Measured in
    * `Scratch ivfcells` at sf0.1 (PLANS.md round-12 table): closure-
    * serialized task binary flat at 43 KB from nlist=16 to 16384 vs
    * 10.9 MB/task for the literal shape at 16384×64; plan nodes flat
    * for both; run time is the inherent O(nlist × dim) arithmetic
    * (broadcast ~5-8% slower at fixture scale — the join plumbing). */
  def assignToCells(vecs: DataFrame, centers: DataFrame,
                    idCol: String, vecCol: String,
                    metaCols: Seq[String] = Nil): DataFrame = {
    require(!centers.isEmpty, "centroid table is empty")
    // struct field order (cell, center): sort_array orders by cell id,
    // so the argmin scan order — and therefore tie behavior — is
    // deterministic regardless of the centroid table's partitioning
    val ctrRow = broadcast(centers
      .agg(sort_array(collect_list(struct(col("cell"), col("center"))))
        .as("__ctrs")))
    // same float-subtract/multiply + double-accumulate per cell as the
    // literal formulation — assignment stays bit-identical to
    // KMeans.transform (spec-pinned); struct (d2, cell) ordering keeps
    // ties on the lowest cell id
    val best = array_min(transform(col("__ctrs"), c =>
      struct(
        aggregate(zip_with(col("c_vec"), c.getField("center"), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, x) => acc + x).as("d2"),
        c.getField("cell").as("cell"))))
    vecs.select(col(idCol).as("neighbor_id") +: col(vecCol).as("c_vec") +:
        metaCols.map(col): _*)
      .crossJoin(ctrRow)
      .withColumn("__best", best)
      .select(col("neighbor_id") +: col("c_vec") +:
        col("__best.cell").as("cell") +: metaCols.map(col): _*)
  }

  /** Grow an [[IvfIndex]] with `newVecs` WITHOUT re-training the coarse
    * quantizer — the IVF leg of the index-versioning symmetry
    * (`extendCorpusIndex` / `extendEmbeddingIndex` are the text and
    * LSH analogs): new vectors are assigned to the EXISTING centroids
    * via [[assignToCells]] and unioned into the cell-assigned corpus.
    * Extension is exactly O(new vectors), one narrow projection — at
    * 100 TB the corpus-sized `assigned` relation is untouched. The
    * centroids deliberately do NOT move (re-clustering would reassign
    * the whole corpus and invalidate every saved cell partition); as
    * with any IVF, re-fit when the data distribution drifts enough
    * that cell occupancy degrades recall. Same append-only id contract
    * as the other index families. Metadata columns carried by the index
    * (`ivfFit(metaCols = ...)`) are preserved: `newVecs` must supply the
    * same columns, so filtered probes see old and new vectors alike. */
  def extendIvfIndex(index: IvfIndex, newVecs: DataFrame,
                     idCol: String, vecCol: String): IvfIndex = {
    val metaCols = index.assigned.columns.toSeq
      .filterNot(Set("neighbor_id", "c_vec", "cell"))
    IvfIndex(index.centers,
      index.assigned.unionByName(
        assignToCells(newVecs, index.centers, idCol, vecCol, metaCols)),
      version = index.version + 1, folded = index.folded,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Shrink an [[IvfIndex]] by retired ids — the IVF leg of the removal
    * lifecycle. One streaming anti-join on the cell-assigned relation;
    * the centroids deliberately do NOT move (re-clustering would
    * reassign the whole corpus and invalidate every saved cell
    * partition — the same frozen-quantizer contract [[extendIvfIndex]]
    * holds), so the exactness statement is
    * `remove(index, R).assigned ≡ assignToCells(A \ R, index.centers)`
    * — survivors' cells are identical on both paths (spec-pinned).
    * As with extend, re-fit when enough of the corpus has churned that
    * cell occupancy degrades recall. */
  def removeFromIvfIndex(index: IvfIndex, removedIds: DataFrame,
                         idCol: String): IvfIndex = {
    val rm = removedIds.select(col(idCol).as("neighbor_id")).distinct()
    IvfIndex(index.centers,
      index.assigned.join(rm, Seq("neighbor_id"), "left_anti"),
      version = index.version + 1, folded = index.folded,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Train the coarse quantizer and assign every candidate to its cell.
    * `metaCols` names metadata columns of `candidates` to carry into the
    * cell-assigned relation (and the saved parquet tree) so probes can
    * pre-filter candidates via [[IvfIndex.filtered]] — the production
    * filtered-ANN shape, where the predicate prunes INSIDE the index
    * instead of post-filtering a ranked result. */
  def ivfFit(
      candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, seed: Long = 42L,
      trainFraction: Double = 1.0, metaCols: Seq[String] = Nil): IvfIndex = {

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val cand = candidates.select(col(idCol).as("neighbor_id") +:
        col(vecCol).as("c_vec") +: metaCols.map(col): _*)
      .withColumn("features", array_to_vector(col("c_vec")))
    val trainSet =
      if (trainFraction >= 1.0) cand else cand.sample(trainFraction, seed)
    // coarse quantization needs rough cells, not convergence: few
    // iterations + random init keep the index build cheap (recall comes
    // from nprobe, and k-means|| init costs more than the training here).
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(trainSet)
    val assigned = model.transform(cand)
      .select(col("neighbor_id") +: col("c_vec") +: col("cell") +:
        metaCols.map(col): _*)

    // centroid table is tiny: ship it broadcast and rank each query's
    // cells by Euclidean distance (KMeans' own metric).
    val spark = candidates.sparkSession
    import spark.implicits._
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "center")
    IvfIndex(centers, assigned)
  }

  /** Each query's `nprobe` nearest cells by squared Euclidean distance
    * to the centroid (KMeans' own metric, matching the assignment) —
    * the coarse-pruning step shared by [[ivfProbe]] and [[ivfPqProbe]].
    * Returns (query_id, q_vec, cell), one row per probed cell. */
  private[extensions] def nearestCells(q: DataFrame, centers: DataFrame,
                                       nprobe: Int): DataFrame =
    q.crossJoin(broadcast(centers))
      .select(col("query_id"), col("q_vec"), col("cell"),
        aggregate(zip_with(col("q_vec"), col("center"),
          (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x).as("d2"))
      .withColumn("__pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("cell"))

  /** Probe a fitted index: score only the `nprobe` nearest cells' members. */
  def ivfProbe(
      index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      nprobe: Int = 4): DataFrame = {

    val assigned = index.assigned
    val qProbes = broadcast(nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      index.centers, nprobe))

    val scored = assigned.join(qProbes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("q_vec"), col("c_vec")).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  // ---- product quantization (PQ) --------------------------------------
  //
  // The third classic ANN scale path next to sign-LSH and IVF:
  // COMPRESSION rather than pruning. Each (L2-normalized) vector is cut
  // into `m` subvectors; a per-subspace k-means codebook (`ksub` cells)
  // maps every subvector to one byte-sized code, so a 64-dim float
  // vector (256 B) becomes m=8 codes (8 B) — 32x less memory traffic on
  // the scoring scan. A query probe precomputes the m x ksub table of
  // subspace dot products ONCE (asymmetric distance computation, ADC);
  // scoring a candidate is then m table lookups + adds instead of `dim`
  // multiplies. Top `rerank` ADC survivors are re-ranked with the exact
  // cosine against the stored vectors, so the final ranking error is
  // only "was a true top-k neighbor outside the ADC top-`rerank`".
  //
  // At 100 TB: PQ scans ALL candidates (unlike IVF's cell pruning) but
  // moves 32x fewer bytes and does 8x less arithmetic per candidate —
  // the right tool when recall targets rule out aggressive pruning, and
  // composable with IVF (probe cells, score members by ADC). The
  // codebook is m*ksub*dsub doubles (8 KB at 8x16x8) embedded as plan
  // literals — three orders below the 10.9 MB literal the IVF family
  // had to avoid (see PLANS.md "IVF taskKB"), so no broadcast machinery
  // is needed. Training is a driver-side loop of `m` (small constant)
  // sampled KMeans fits; encoding is one codegen'd pass.

  /** Stage the L2-normalized (double) copy of `vecCol` as `__vhat`.
    * Zero-norm vectors map to all-zeros (ADC and exact cosine both score
    * them 0 against everything). Norm is computed once per row via a
    * staged `__n` column — higher-order lambdas share no subexpressions,
    * so inlining `norm` per element would be O(dim^2)/row. */
  private def withUnitVec(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__n", norm(col(vecCol)))
      .withColumn("__vhat",
        when(col("__n") === 0, transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol),
            x => x.cast("double") / col("__n"))))

  /** Nearest-codebook-cell codes for a normalized vector: for each of
    * the `m` subspaces, the argmin-distance cell index (0-based;
    * strict `<` keeps the LOWEST cell on exact ties — deterministic).
    * One sequential fold over the ksub cells per subspace, all inside
    * codegen. */
  private def encodeCodes(vhat: Column, codebooks: Seq[Seq[Seq[Float]]],
                          dsub: Int): Column =
    array(codebooks.indices.map { sub =>
      val cb = typedlit(codebooks(sub).map(_.map(_.toDouble)))
      val subvec = slice(vhat, sub * dsub + 1, dsub)
      aggregate(
        sequence(lit(0), lit(codebooks(sub).length - 1)),
        struct(lit(Double.MaxValue).as("d2"), lit(0).as("cell")),
        (acc, cell) => {
          val d2 = aggregate(zip_with(subvec, cb(cell),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), cell.as("cell"))).otherwise(acc)
        },
        acc => acc.getField("cell"))
    }: _*)

  /** The per-query ADC lookup table: a flat m*ksub double array where
    * entry [sub*ksub + cell] = dot(q-subvector, codebook[sub][cell]).
    * Computed once per QUERY row; candidate scoring only does lookups. */
  private def adcTable(qhat: Column, codebooks: Seq[Seq[Seq[Float]]],
                       dsub: Int): Column =
    concat(codebooks.indices.map { sub =>
      val cb = typedlit(codebooks(sub).map(_.map(_.toDouble)))
      val subvec = slice(qhat, sub * dsub + 1, dsub)
      transform(sequence(lit(0), lit(codebooks(sub).length - 1)),
        cell => aggregate(zip_with(subvec, cb(cell), (x, y) => x * y),
          lit(0.0), (a, x) => a + x))
    }: _*)

  /**
   * A fitted product-quantization search index — same lifecycle as
   * [[LshIndex]]/[[IvfIndex]] (fit once / probe many / `filtered` /
   * save / load / extend / close, with [[IndexMeta]] version lineage).
   * `codes` is the (neighbor_id, codes, c_vec, meta…) relation; the ADC
   * scan projects ONLY (neighbor_id, codes) — on a saved index parquet
   * column pruning means the 256 B/vector `c_vec` column is never read
   * until the `rerank`-sized exact pass.
   */
  final case class PqIndex(codebooks: Seq[Seq[Seq[Float]]], codes: DataFrame,
                           m: Int, ksub: Int, dim: Int,
                           savedDir: Option[String] = None,
                           version: Long = 1L,
                           folded: Seq[String] = Nil,
                           parent: Option[String] = None) {
    def cache(): PqIndex = { codes.cache(); this }
    def unpersist(): PqIndex = { codes.unpersist(false); this }

    /** Metadata-filtered view for filtered ANN (see [[LshIndex.filtered]]
      * for the lineage rationale: the view drops `savedDir` AND `parent`
      * so a subset can't retire or masquerade as the full tree). */
    def filtered(predicate: Column): PqIndex =
      copy(codes = codes.filter(predicate), savedDir = None, parent = None)

    /** Persist codes + codebooks + hyperparameters; a load can never
      * probe with a mismatched codebook. Same stale-guard scope note as
      * [[LshIndex.save]]. */
    def save(dir: String): PqIndex = {
      val spark = codes.sparkSession
      import spark.implicits._
      codes.write.mode("overwrite").parquet(s"$dir/codes")
      codebooks.zipWithIndex.flatMap { case (cells, sub) =>
        cells.zipWithIndex.map { case (c, cell) => (sub, cell, c) }
      }.toDF("sub", "cell", "center")
        .write.mode("overwrite").parquet(s"$dir/codebooks")
      Seq((m, ksub, dim)).toDF("m", "ksub", "dim")
        .write.mode("overwrite").parquet(s"$dir/meta")
      IndexMeta.write(spark, dir, IndexMeta.Meta(version,
        parent = parent.orElse(savedDir).filterNot(_ == dir), folded = folded,
        rows = IndexMeta.rowCounts(spark, dir, Seq("codes"))))
      copy(savedDir = Some(dir))
    }

    /** Retire this index version in ONE call — unpersist + delete the
      * saved tree, with the stale-handle refusal ([[IndexMeta]]). */
    def close(): Unit = {
      unpersist()
      savedDir.foreach { d =>
        val spark = codes.sparkSession
        IndexMeta.requireCurrent(spark, d, version, "close()")
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true)
      }
    }
  }

  /** Fit a PQ index: per-subspace KMeans codebooks (driver loop over the
    * `m` subspaces — m is a small constant; each fit is distributed and
    * runs on `trainFraction` of the corpus), then one codegen'd encode
    * pass over all candidates. `metaCols` ride into the codes relation
    * for [[PqIndex.filtered]]. */
  /** Train the `m` per-subspace KMeans codebooks over a relation
    * carrying the normalized `__vhat` column — shared by [[pqFit]] and
    * [[ivfPqFit]] (m is a small constant; each fit is distributed and
    * runs on `trainFraction` of the corpus).
    *
    * The m fits are INDEPENDENT (disjoint subspace slices of the same
    * cached training relation, each with its own seed), so they run
    * CONCURRENTLY from a small driver thread pool: a KMeans fit is a
    * driver-orchestrated loop of many short jobs, and running the
    * subspaces back to back left the cluster idle through every job's
    * scheduling gap — overlapping them backfills those gaps (the
    * independent-jobs pattern; FIFO scheduling gives exactly the
    * desired back-fill). Each individual fit is unchanged — same data,
    * same seed, same partitioning, so the codebooks are bit-identical
    * to the sequential loop's (Scratch timeq at sf0.1/local[32]:
    * sim_topk_ivfpq 8.4 -> 4.8 s, sim_topk_ivfpq_res 11.0 -> 5.1 s,
    * sim_topk_pq 7.7 -> 5.9 s min-warm; all probe rows hash-identical
    * vs the DuckDB oracle). The cache is materialized with one count()
    * first so the m concurrent first readers do not race to populate
    * it. */
  private def trainCodebooks(base: DataFrame, m: Int, ksub: Int, dsub: Int,
                             seed: Long,
                             trainFraction: Double): Seq[Seq[Seq[Float]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = (if (trainFraction >= 1.0) base
                 else base.sample(trainFraction, seed))
      .select(col("__vhat")).cache()
    train.count()
    val spark = train.sparkSession
    // every fit's jobs run under one cancellable group, the pool threads
    // are named for thread dumps, and the await is BOUNDED
    // (spark.graft.pq.fitTimeoutSec, default 1800 s — generous next to
    // the seconds-scale fits, tight next to Duration.Inf): one hung or
    // failed subspace fit must fail the whole train fast and INTERRUPT
    // its siblings instead of hanging the operator with a live pool
    // (VERDICT r19 #5 — pool.shutdown() alone never interrupts running
    // fits).
    val timeoutSec = spark.conf.get("spark.graft.pq.fitTimeoutSec", "1800").toLong
    val groupId = s"graft-pq-fit-${java.util.UUID.randomUUID()}"
    val threadNo = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, 8),
      (r: Runnable) => {
        val t = new Thread(r, s"graft-pq-fit-${threadNo.getAndIncrement()}")
        t.setDaemon(true)
        t
      })
    val codebooks: Seq[Seq[Seq[Float]]] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val fits = (0 until m).map { sub =>
          scala.concurrent.Future {
            // job groups are thread-local: stamp the shared group in
            // each pool thread so cancelJobGroup reaches every fit
            spark.sparkContext.setJobGroup(groupId,
              s"pq codebook fit sub=$sub", interruptOnCancel = true)
            try {
              // per-sub seed: identical-subspace data must not yield
              // identical codebooks by construction; few iterations +
              // random init as in ivfFit (cells need to be rough, recall
              // comes from rerank)
              new KMeans().setK(ksub).setSeed(seed + sub).setMaxIter(10)
                .setInitMode("random")
                .setFeaturesCol("features").setPredictionCol("cell")
                .fit(train.select(array_to_vector(
                  slice(col("__vhat"), sub * dsub + 1, dsub)).as("features")))
                .clusterCenters.toSeq.map(_.toArray.toSeq.map(_.toFloat))
            } finally spark.sparkContext.clearJobGroup()
          }
        }
        try
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(fits),
            scala.concurrent.duration.Duration(timeoutSec,
              java.util.concurrent.TimeUnit.SECONDS))
        catch {
          case e: Throwable =>
            // first failure (or timeout) kills the group's running jobs
            // and interrupts the pool — siblings fail fast, nothing
            // keeps computing toward a result nobody will read
            spark.sparkContext.cancelJobGroup(groupId)
            pool.shutdownNow()
            throw e
        }
      } finally {
        pool.shutdown()
        train.unpersist()
      }
    codebooks
  }

  def pqFit(candidates: DataFrame, idCol: String, vecCol: String,
            m: Int = 8, ksub: Int = 16, seed: Long = 42L,
            trainFraction: Double = 1.0,
            metaCols: Seq[String] = Nil): PqIndex = {
    val base = withUnitVec(
      candidates.select(col(idCol).as("neighbor_id") +:
        col(vecCol).as("c_vec") +: metaCols.map(col): _*), "c_vec")
    // dim: one-row driver read (schema metadata, not data volume)
    val dim = base.select(size(col("c_vec"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m

    val codebooks = trainCodebooks(base, m, ksub, dsub, seed, trainFraction)

    val codes = base
      .withColumn("codes", encodeCodes(col("__vhat"), codebooks, dsub))
      .select(col("neighbor_id") +: col("codes") +: col("c_vec") +:
        metaCols.map(col): _*)
    PqIndex(codebooks, codes, m, ksub, dim)
  }

  def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
                  dir: String): PqIndex = {
    val meta = spark.read.parquet(s"$dir/meta")
      .select(col("m"), col("ksub"), col("dim")).head()
    val (m, ksub, dim) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val cb = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub"), col("cell"), col("center"))
      .collect() // m*ksub rows of dsub floats — 8 KB-scale index metadata
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    val codebooks = (0 until m).map { sub =>
      cb.filter(_._1 == sub).sortBy(_._2).map(_._3.toSeq).toSeq
    }
    val stamp = IndexMeta.read(spark, dir)
    PqIndex(codebooks, spark.read.parquet(s"$dir/codes"), m, ksub, dim,
      savedDir = Some(dir),
      version = stamp.map(_.version).getOrElse(1L),
      folded = stamp.map(_.folded).getOrElse(Nil),
      parent = stamp.flatMap(_.parent))
  }

  /** Grow a [[PqIndex]] with `newVecs` WITHOUT refitting: encode against
    * the FROZEN codebooks and union — exactly O(new vectors), the
    * corpus-sized codes relation untouched. Same version-bump lineage as
    * the other families. */
  def extendPqIndex(index: PqIndex, newVecs: DataFrame,
                    idCol: String, vecCol: String): PqIndex = {
    val metaCols = index.codes.columns.toSeq
      .filterNot(Set("neighbor_id", "codes", "c_vec"))
    val dsub = index.dim / index.m
    val enc = withUnitVec(
      newVecs.select(col(idCol).as("neighbor_id") +:
        col(vecCol).as("c_vec") +: metaCols.map(col): _*), "c_vec")
      .withColumn("codes", encodeCodes(col("__vhat"), index.codebooks, dsub))
      .select(col("neighbor_id") +: col("codes") +: col("c_vec") +:
        metaCols.map(col): _*)
    index.copy(codes = index.codes.unionByName(enc),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Shrink a [[PqIndex]] by retired ids — one streaming anti-join on
    * the codes relation under the FROZEN codebooks (survivors' codes
    * are the fitted rows verbatim; re-encoding `A \ R` under the same
    * codebooks is bitwise identical, the [[extendPqIndex]] contract
    * run backward). */
  def removeFromPqIndex(index: PqIndex, removedIds: DataFrame,
                        idCol: String): PqIndex = {
    val rm = removedIds.select(col(idCol).as("neighbor_id")).distinct()
    index.copy(codes = index.codes.join(rm, Seq("neighbor_id"), "left_anti"),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** The (query_id, q_vec, __dt) probe relation: queries normalized,
    * each with its precomputed flat ADC lookup table. */
  private def adcQueries(queries: DataFrame, idCol: String, vecCol: String,
                         codebooks: Seq[Seq[Seq[Float]]],
                         dsub: Int): DataFrame =
    withUnitVec(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      "q_vec")
      .withColumn("__dt", adcTable(col("__vhat"), codebooks, dsub))
      .select(col("query_id"), col("q_vec"), col("__dt"))

  /** ADC-score a (query_id, neighbor_id, __dt, codes) candidate scan
    * (full-corpus for [[pqProbe]], cell-pruned for [[ivfPqProbe]]),
    * keep the top `rerank` per query on a SKINNY
    * (query_id, neighbor_id, __adc) rank exchange — at N×Q rows a
    * dim-float q_vec payload would dominate the shuffle — then re-rank
    * the survivors exactly against the stored vectors (`vectors` =
    * (neighbor_id, c_vec); the only place c_vec is read; q_vec
    * re-enters via the broadcast query table). The m-term lookup sum
    * is unrolled at plan-build time. */
  private def adcRerankTopK(scan: DataFrame, qVecs: DataFrame,
                            vectors: DataFrame, m: Int, offsets: Seq[Int],
                            k: Int, rerank: Int,
                            adcExtra: Option[Column] = None,
                            cellPruned: Boolean = false): DataFrame = {
    // adcExtra: a per-scan-row additive score term (the residual
    // variant's coarse dot(qhat, chat)); None leaves the direct plan
    // byte-identical.
    // cellPruned (the IVF-PQ path): carry the scan row's `cell` through
    // the rank exchange (+4 B on a skinny row) and key the exact-rerank
    // join on (cell, neighbor_id) instead of neighbor_id alone — the
    // candidate broadcast then prunes the c_vec read by cell: on a
    // saved cell-partitioned tree the file scan gets a live DPP filter
    // REUSING the rerank join's own broadcast, with no separate
    // cell-set broadcast to build (the r15 probe regression was exactly
    // that extra per-probe broadcast + its nearestCells re-evaluation).
    val lookups = (0 until m).map(sub =>
      col("__dt")(lit(offsets(sub)) + col("codes")(sub)))
      .reduce(_ + _)
    val carry = if (cellPruned) Seq(col("cell")) else Nil
    val adc = scan.select(col("query_id") +: col("neighbor_id") +: carry :+
      adcExtra.fold(lookups)(lookups + _).as("__adc"): _*)
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val cands = adc.withColumn("__ar", row_number().over(wA))
      .filter(col("__ar") <= rerank)
      .select(col("query_id") +: col("neighbor_id") +: carry: _*)
    val joinKeys = if (cellPruned) Seq("cell", "neighbor_id")
      else Seq("neighbor_id")
    val exact = vectors
      .join(broadcast(cands), joinKeys)
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Probe a fitted [[PqIndex]]: ADC-score EVERY candidate's codes
    * against the query's precomputed lookup table (m adds + lookups per
    * candidate — the compressed scan), keep the top `rerank` per query,
    * then re-rank those exactly. Output schema matches [[ivfProbe]]. */
  def pqProbe(index: PqIndex, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 10,
              rerank: Int = 50): DataFrame = {
    val q = adcQueries(queries, idCol, vecCol, index.codebooks,
      index.dim / index.m)

    // per-sub offsets into the flat ADC table: KMeans may return FEWER
    // than `ksub` cells when a subspace has few distinct subvectors
    // (k-means collapses duplicate points), so the stride is each sub's
    // ACTUAL codebook size, not the requested ksub
    val offsets = index.codebooks.scanLeft(0)(_ + _.length)

    // compressed scan: codes-only projection (c_vec pruned), queries+
    // tables broadcast, one bounded partial-top-k shuffle per query
    val scan = index.codes.select(col("neighbor_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
    adcRerankTopK(scan, q.select(col("query_id"), col("q_vec")),
      index.codes.select(col("neighbor_id"), col("c_vec")),
      index.m, offsets, k, rerank)
  }

  /** One-shot PQ top-k: fit + probe (the fit-once/probe-many split is
    * [[pqFit]]/[[pqProbe]]). */
  def pqTopK(candidates: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int = 10,
             m: Int = 8, ksub: Int = 16, rerank: Int = 50): DataFrame =
    pqProbe(pqFit(candidates, idCol, vecCol, m, ksub), queries,
      idCol, vecCol, k, rerank)

  // ---- IVF-PQ composition (IVFADC) ------------------------------------
  //
  // The standard 100 TB ANN shape (Jégou et al., "Product Quantization
  // for Nearest Neighbor Search", §IV): the IVF coarse quantizer prunes
  // the candidate space to `nprobe` cells, and WITHIN those cells the
  // scan is the PQ compressed one — m table lookups per candidate over
  // 8 B codes instead of dim multiplies over 256 B floats. PQ-only
  // ([[pqProbe]]) moves 32x fewer bytes but still touches every row;
  // IVF-only ([[ivfProbe]]) touches nprobe/nlist of the rows but moves
  // full vectors; the composition touches nprobe/nlist of the rows AND
  // moves 32x fewer bytes per touched row — both savings multiply.
  //
  // Encoding note: BOTH published variants are implemented, selected by
  // `residual` at fit time. Direct encoding (default) quantizes the
  // normalized vector itself — one codebook family valid independent of
  // the coarse quantizer, so a bring-your-own-centers composition can
  // PQ-compress an existing IVF without any coupling. Residual encoding
  // (`residual = true`) is the paper's IVFADC proper: codes quantize
  // r = vhat - chat(cell) (chat = the NORMALIZED cell centroid, so the
  // decomposition lives in the same unit space the ADC scores), which
  // buys ADC fidelity because within-cell residuals are far tighter
  // than the raw vectors — the codebook's ksub cells model a smaller
  // ball. The probe then scores dot(qhat, vhat) = dot(qhat, chat) +
  // dot(qhat, r): the first term is one per-(query, probed-cell)
  // constant computed with the centroid table (nprobe x |queries| rows
  // — free), the second is the SAME m-lookup ADC sum, against the
  // residual codebooks. The price: residual codebooks are coupled to
  // the coarse quantizer (if the centers move, re-encode), which is why
  // direct stays the default for bring-your-own-centers composition.
  // Exact re-rank bounds the final ranking error of both variants to
  // "was a true neighbor outside the ADC top-rerank"; the recall gates
  // price each honestly.

  /**
   * A fitted IVF-PQ search index — same lifecycle as the other four
   * families (fit once / probe many / `filtered` / save / load / extend
   * / close, with [[IndexMeta]] version lineage). `codes` is the
   * (neighbor_id, cell, codes, meta…) relation: `cell` is the
   * shuffle/pruning key (the saved tree is parquet PARTITIONED by it,
   * so a probe's nprobe cells prune at the file level), and the ADC
   * scan projects only (cell, neighbor_id, codes). The full vectors
   * live in the separate `vectors` (neighbor_id, cell, c_vec) relation
   * — also cell-partitioned — touched ONLY by the rerank-sized exact
   * pass: splitting them out keeps the stored codes tree 32x smaller
   * than the corpus vector column, which is the compression's point.
   */
  final case class IvfPqIndex(centers: DataFrame,
                              codebooks: Seq[Seq[Seq[Float]]],
                              codes: DataFrame,
                              vectors: DataFrame,
                              m: Int, ksub: Int, dim: Int,
                              residual: Boolean = false,
                              savedDir: Option[String] = None,
                              version: Long = 1L,
                              folded: Seq[String] = Nil,
                              parent: Option[String] = None) {
    def cache(): IvfPqIndex = {
      codes.cache(); vectors.cache(); centers.cache(); this
    }
    def unpersist(): IvfPqIndex = {
      codes.unpersist(false); vectors.unpersist(false)
      centers.unpersist(false); this
    }

    /** Metadata-filtered view for filtered ANN (see [[LshIndex.filtered]]
      * for the lineage rationale: the view drops `savedDir` AND `parent`
      * so a subset can't retire or masquerade as the full tree). The
      * predicate applies to `codes` (where the meta columns live); the
      * rerank-only `vectors` relation stays whole — every rerank row is
      * semi-bounded by the filtered scan's survivors, so an unfiltered
      * vector can never surface. */
    def filtered(predicate: Column): IvfPqIndex =
      copy(codes = codes.filter(predicate), savedDir = None, parent = None)

    /** Persist centers + codes (partitioned by cell) + the rerank-only
      * vectors relation (also cell-partitioned) + codebooks +
      * hyperparameters; a load can never probe with a mismatched
      * codebook or centroid table. `c_vec` lives ONLY in the vectors
      * tree: storing it beside every code row meant the 32x code
      * compression never shrank the stored footprint — at 100 TB the
      * codes tree is the hot ADC scan and must stay codes-sized, while
      * the vector tree is touched only by the rerank-sized exact pass
      * (VERDICT r14 #7). Same stale-guard scope note as
      * [[LshIndex.save]]. */
    def save(dir: String): IvfPqIndex = {
      val spark = codes.sparkSession
      import spark.implicits._
      centers.write.mode("overwrite").parquet(s"$dir/centers")
      codes.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/codes")
      vectors.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/vectors")
      codebooks.zipWithIndex.flatMap { case (cells, sub) =>
        cells.zipWithIndex.map { case (c, cell) => (sub, cell, c) }
      }.toDF("sub", "cell", "center")
        .write.mode("overwrite").parquet(s"$dir/codebooks")
      Seq((m, ksub, dim, residual)).toDF("m", "ksub", "dim", "residual")
        .write.mode("overwrite").parquet(s"$dir/meta")
      IndexMeta.write(spark, dir, IndexMeta.Meta(version,
        parent = parent.orElse(savedDir).filterNot(_ == dir), folded = folded,
        rows = IndexMeta.rowCounts(spark, dir, Seq("codes", "vectors"))))
      copy(savedDir = Some(dir))
    }

    /** Retire this index version in ONE call — unpersist + delete the
      * saved tree, with the stale-handle refusal ([[IndexMeta]]). */
    def close(): Unit = {
      unpersist()
      savedDir.foreach { d =>
        val spark = codes.sparkSession
        IndexMeta.requireCurrent(spark, d, version, "close()")
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(p, true)
      }
    }
  }

  /** Fit an IVF-PQ index: the coarse KMeans quantizer assigns every
    * candidate to a cell ([[ivfFit]]'s leg), and one shared per-subspace
    * codebook family compresses every (normalized) vector to m codes
    * ([[pqFit]]'s leg) — one codegen'd encode pass over the assigned
    * relation. `metaCols` ride into the codes relation for
    * [[IvfPqIndex.filtered]].
    *
    * `centers`: bring-your-own coarse quantizer — an explicit
    * (cell, center) table routed through the production
    * [[assignToCells]] path instead of fitting KMeans, the same
    * existing-index composition [[semanticDupPairs]] supports: a
    * 100 TB pipeline that already operates an IVF index PQ-compresses
    * it without re-clustering (which would reassign the whole corpus
    * and invalidate every saved cell partition). `nlist` is ignored
    * when `centers` is given.
    *
    * `residual = true` selects the paper's IVFADC-proper residual
    * encoding (see the section note): codebooks train on and codes
    * quantize vhat - chat(cell) instead of vhat. The subtraction is one
    * broadcast join against the nlist-row normalized-centroid table +
    * a zip_with — same narrow shape as the encode itself. */
  def ivfPqFit(candidates: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, m: Int = 8, ksub: Int = 16,
               seed: Long = 42L, trainFraction: Double = 1.0,
               metaCols: Seq[String] = Nil,
               centers: Option[DataFrame] = None,
               residual: Boolean = false): IvfPqIndex = {
    val coarse = centers match {
      case Some(c) => IvfIndex(c,
        assignToCells(candidates, c, idCol, vecCol, metaCols))
      case None => ivfFit(candidates, idCol, vecCol, nlist, seed,
        trainFraction, metaCols)
    }
    val base0 = withUnitVec(coarse.assigned, "c_vec")
    val base =
      if (!residual) base0
      else subtractCellCenter(base0, coarse.centers)
    val dim = base.select(size(col("c_vec"))).head().getInt(0)
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val codebooks = trainCodebooks(base, m, ksub, dsub, seed, trainFraction)
    val encoded = base
      .withColumn("codes", encodeCodes(col("__vhat"), codebooks, dsub))
    // codes-sized scan relation vs rerank-only vector relation: c_vec
    // rides the second, never the first (the stored/ scanned footprint
    // is the compression's whole point)
    val codes = encoded.select(col("neighbor_id") +: col("cell") +:
      col("codes") +: metaCols.map(col): _*)
    val vectors = encoded.select(col("neighbor_id"), col("cell"), col("c_vec"))
    IvfPqIndex(coarse.centers, codebooks, codes, vectors, m, ksub, dim,
      residual = residual)
  }

  /** The NORMALIZED (unit, double) centroid table (cell, __chat) — the
    * space residual encoding decomposes in: vhat = chat + r must hold in
    * the same unit space the ADC scores, and the raw KMeans centers are
    * not unit vectors. */
  private def centersUnit(centers: DataFrame): DataFrame =
    withUnitVec(centers.select(col("cell"), col("center")), "center")
      .select(col("cell"), col("__vhat").as("__chat"))

  /** Replace `__vhat` with the cell residual vhat - chat(cell): one
    * broadcast join against the nlist-row normalized-centroid table +
    * one zip_with — narrow, no shuffle of the corpus side. */
  private def subtractCellCenter(assigned: DataFrame,
                                 centers: DataFrame): DataFrame =
    assigned.join(broadcast(centersUnit(centers)), Seq("cell"))
      .withColumn("__vhat",
        zip_with(col("__vhat"), col("__chat"), (x, y) => x - y))
      .drop("__chat")

  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String): IvfPqIndex = {
    val metaDf = spark.read.parquet(s"$dir/meta")
    // pre-residual trees carry no flag — they are direct-encoded
    val residual = metaDf.schema.fieldNames.contains("residual") &&
      metaDf.select(col("residual")).head().getBoolean(0)
    val meta = metaDf.select(col("m"), col("ksub"), col("dim")).head()
    val (m, ksub, dim) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val cb = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub"), col("cell"), col("center"))
      .collect() // m*ksub rows of dsub floats — 8 KB-scale index metadata
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    val codebooks = (0 until m).map { sub =>
      cb.filter(_._1 == sub).sortBy(_._2).map(_._3.toSeq).toSeq
    }
    val stamp = IndexMeta.read(spark, dir)
    val codes = spark.read.parquet(s"$dir/codes")
    // backward compatible with pre-split trees (c_vec inline in codes):
    // derive the vectors relation from the codes read instead
    val vPath = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    val vectors =
      if (vPath.getFileSystem(spark.sessionState.newHadoopConf()).exists(vPath))
        spark.read.parquet(s"$dir/vectors")
      else codes.select(col("neighbor_id"), col("cell"), col("c_vec"))
    IvfPqIndex(spark.read.parquet(s"$dir/centers"), codebooks,
      codes.drop("c_vec"), vectors, m, ksub, dim, residual = residual,
      savedDir = Some(dir),
      version = stamp.map(_.version).getOrElse(1L),
      folded = stamp.map(_.folded).getOrElse(Nil),
      parent = stamp.flatMap(_.parent))
  }

  /** Grow an [[IvfPqIndex]] with `newVecs` WITHOUT re-training either
    * quantizer: assign to the FROZEN cells ([[assignToCells]]) and
    * encode against the FROZEN codebooks — exactly O(new vectors), the
    * corpus-sized codes relation untouched. Same version-bump lineage
    * and append-only id contract as the other families; metadata
    * columns carried by the index must be supplied by `newVecs`. */
  def extendIvfPqIndex(index: IvfPqIndex, newVecs: DataFrame,
                       idCol: String, vecCol: String): IvfPqIndex = {
    val metaCols = index.codes.columns.toSeq
      .filterNot(Set("neighbor_id", "cell", "codes"))
    val dsub = index.dim / index.m
    val assigned0 = withUnitVec(
      assignToCells(newVecs, index.centers, idCol, vecCol, metaCols),
      "c_vec")
    // a residual index encodes residuals against the SAME frozen centers
    // the assignment used — the coupling the section note documents
    val assigned =
      if (!index.residual) assigned0
      else subtractCellCenter(assigned0, index.centers)
    val enc = assigned
      .withColumn("codes", encodeCodes(col("__vhat"), index.codebooks, dsub))
    index.copy(
      codes = index.codes.unionByName(enc.select(col("neighbor_id") +:
        col("cell") +: col("codes") +: metaCols.map(col): _*)),
      vectors = index.vectors.unionByName(
        enc.select(col("neighbor_id"), col("cell"), col("c_vec"))),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Shrink an [[IvfPqIndex]] by retired ids — the IVFADC leg of the
    * removal lifecycle: two streaming anti-joins keep the codes and the
    * rerank-only vectors relation in lockstep (the split-tree
    * invariant). Cells and codebooks stay FROZEN, exactly as in
    * [[extendIvfPqIndex]], so survivors' codes are bitwise identical to
    * re-encoding `A \ R` under the same quantizers (spec-pinned) and
    * every previously-issued probe plan stays valid. */
  def removeFromIvfPqIndex(index: IvfPqIndex, removedIds: DataFrame,
                           idCol: String): IvfPqIndex = {
    val rm = removedIds.select(col(idCol).as("neighbor_id")).distinct()
    index.copy(
      codes = index.codes.join(rm, Seq("neighbor_id"), "left_anti"),
      vectors = index.vectors.join(rm, Seq("neighbor_id"), "left_anti"),
      savedDir = None, version = index.version + 1,
      parent = index.savedDir.orElse(index.parent))
  }

  /** Probe a fitted [[IvfPqIndex]]: rank the query's `nprobe` nearest
    * cells (coarse pruning — the scan never touches the other
    * nlist - nprobe cells' rows), ADC-score ONLY those cells' codes
    * against the query's precomputed lookup table, keep the top
    * `rerank` per query on the skinny rank exchange, then re-rank
    * exactly. Output schema matches [[ivfProbe]]/[[pqProbe]]. On a
    * saved index the cell join prunes at the parquet-partition level;
    * per-query work is (nprobe/nlist) x N x m lookups — the scanned
    * fraction times the compressed scan. */
  def ivfPqProbe(index: IvfPqIndex, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int = 10,
                 nprobe: Int = 4, rerank: Int = 50): DataFrame = {
    val q = adcQueries(queries, idCol, vecCol, index.codebooks,
      index.dim / index.m)
    val offsets = index.codebooks.scanLeft(0)(_ + _.length)
    // each probed (query, cell) row carries the query's ADC table; the
    // relation is nprobe x |queries| rows of m*ksub doubles — tiny, and
    // broadcast so the codes relation never reshuffles. A residual index
    // additionally carries the per-(query, cell) constant
    // __qc = dot(qhat, chat) — the coarse term of the score
    // decomposition; the ADC lookups supply the residual term.
    val probed = nearestCells(q.select(col("query_id"), col("q_vec")),
      index.centers, nprobe)
    val probedCells =
      if (!index.residual) probed.select(col("query_id"), col("cell"))
      else withUnitVec(
          probed.join(broadcast(centersUnit(index.centers)), Seq("cell")),
          "q_vec")
        .select(col("query_id"), col("cell"),
          aggregate(zip_with(col("__vhat"), col("__chat"), (x, y) => x * y),
            lit(0.0d), (acc, x) => acc + x).as("__qc"))
    val qCells = broadcast(
      probedCells.join(q.select(col("query_id"), col("__dt")), Seq("query_id")))
    val scan = index.codes.select(col("cell"), col("neighbor_id"), col("codes"))
      .join(qCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
    // the exact re-rank pass prunes by the SAME probed cell set as the
    // ADC scan (ADVICE r14: without a cell key the rerank join
    // row-scanned every cell's c_vec files per probe). HOW it prunes is
    // the r15 lesson: a dedicated `select(cell).distinct()` semi-join
    // build re-evaluated nearestCells and built a SECOND broadcast per
    // probe (+25% on the steady-state row, VERDICT r15 #2) — instead
    // the candidates now CARRY their cell through the rank exchange and
    // the rerank join keys on (cell, neighbor_id), so the cell prune
    // rides the rerank join's own candidate broadcast: zero extra
    // jobs, and on a saved tree the c_vec scan still gets a live DPP
    // filter (pinned, PlanShapeSpec).
    adcRerankTopK(scan, q.select(col("query_id"), col("q_vec")),
      index.vectors, index.m, offsets, k, rerank,
      adcExtra = if (index.residual) Some(col("__qc")) else None,
      cellPruned = true)
  }

  /** One-shot IVF-PQ top-k: fit + probe (the fit-once/probe-many split
    * is [[ivfPqFit]]/[[ivfPqProbe]]). */
  def ivfPqTopK(candidates: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int = 10,
                nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                nprobe: Int = 4, rerank: Int = 50,
                residual: Boolean = false): DataFrame =
    ivfPqProbe(ivfPqFit(candidates, idCol, vecCol, nlist, m, ksub,
      residual = residual),
      queries, idCol, vecCol, k, nprobe, rerank)

  // ------------------------------------------------------ semantic dedup

  /** SemDeDup-style semantic-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540): the k-means cells of a fitted [[IvfIndex]] prune
    * the candidate space, and only WITHIN-cell pairs are cosine-scored —
    * the embedding-space analog of the minhash band join, with the SAME
    * index structure the ANN probes use doing double duty (fit / extend /
    * save once; probe for search, pair for dedup, from one cell-assigned
    * relation).
    *
    * Scale shape: both join sides are the already-assigned skinny
    * relation, shuffled once each on `cell` (co-partitioned join); the
    * per-cell pairwise cost is the method's own cost model — pick
    * `nlist ≈ N / target-cell-size` so cells stay bounded (the dial the
    * paper turns), and `maxCellSize` hard-caps degenerate cells exactly
    * like `Dedup.bucketPairs` caps hash buckets (capped cells are
    * SKIPPED, trading recall for a bounded worst case; the cell-size
    * census is ≤ nlist rows, computed and broadcast for free).
    *
    * Returns (id_a, id_b, cosine) with id_a < id_b, cosine >= eps; each
    * vector lives in exactly one cell, so pairs are already distinct.
    */
  def semanticDupPairs(index: IvfIndex, eps: Double = 0.95,
                       maxCellSize: Int = 100000): DataFrame = {
    val okCells = broadcast(
      index.assigned.groupBy("cell").count()
        .filter(col("count") <= maxCellSize).select("cell"))
    val within = index.assigned.join(okCells, Seq("cell"))
    val a = within.select(col("cell"),
      col("neighbor_id").as("id_a"), col("c_vec").as("v_a"))
    val b = within.select(col("cell"),
      col("neighbor_id").as("id_b"), col("c_vec").as("v_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= eps)
  }

  /** Cosine of every indexed vector to its own cell centroid — the
    * priority signal for the paper's keep rule. One broadcast of the
    * ≤ nlist-row centroid table; no shuffle. */
  private def centroidCosine(index: IvfIndex): DataFrame =
    index.assigned
      .join(broadcast(index.centers), Seq("cell"))
      .select(col("neighbor_id"), col("cell"),
        cosine(col("c_vec"), col("center")).as("ctr_cos"))

  /** Semantic dedup keep-set: drops every vector that loses a
    * `semanticDupPairs` pairing under the keep order, returning the
    * surviving (neighbor_id, cell) rows. `keepRule`:
    *
    *  - `"min_id"` (default): keep the lowest id of each duplicate pair —
    *    the repo's standard first-wins greedy rule (append-order stable,
    *    SQL-oracle-able: x is dropped iff some y with y.id < x.id has
    *    cosine(x, y) >= eps in x's cell).
    *  - `"far_from_centroid"`: the SemDeDup paper's rule — keep the pair
    *    member with the LOWER cosine to its cell centroid (retain
    *    cluster outliers, drop the redundant core; §3 of the paper
    *    found this slightly beats random/near keeps). Ties fall back to
    *    the id order so the decision stays deterministic.
    *
    * Drop semantics are the pairwise-greedy exists-rule (drop x iff SOME
    * qualifying pair ranks it second), not iterated graph peeling: one
    * pair scan + one distinct + one anti-join, no fixpoint — at 100 TB
    * the drop relation is skinny (ids only) and the corpus never
    * re-shuffles. */
  def semanticDedup(index: IvfIndex, eps: Double = 0.95,
                    keepRule: String = "min_id",
                    maxCellSize: Int = 100000): DataFrame = {
    val pairs = semanticDupPairs(index, eps, maxCellSize)
    val dropped = keepRule match {
      case "min_id" =>
        pairs.select(col("id_b").as("neighbor_id"))
      case "far_from_centroid" =>
        val cc = centroidCosine(index)
        pairs
          .join(cc.select(col("neighbor_id").as("id_a"),
            col("ctr_cos").as("cos_a")), Seq("id_a"))
          .join(cc.select(col("neighbor_id").as("id_b"),
            col("ctr_cos").as("cos_b")), Seq("id_b"))
          // id_a < id_b, so the id tie-break drops id_b on equal cosines
          .select(when(col("cos_a") > col("cos_b"), col("id_a"))
            .otherwise(col("id_b")).as("neighbor_id"))
      case other =>
        throw new IllegalArgumentException(
          s"keepRule must be min_id | far_from_centroid, got '$other'")
    }
    index.assigned
      .join(dropped.distinct(), Seq("neighbor_id"), "left_anti")
      .select(col("neighbor_id"), col("cell"))
  }

  /** Incremental SemDeDup — the O(new) probe of the family, mirroring
    * `Dedup.dedupEmbeddingsAgainstCorpus` but with cell pruning instead
    * of LSH bucketing: assign the incoming batch to the EXISTING cells
    * (one narrow projection over the batch; the corpus-sized `assigned`
    * relation is never reshuffled — it is already keyed by cell) and
    * cosine-score each batch vector against its cell's members only.
    * Returns (idCol, corpus_id, cosine) for every batch/corpus pairing
    * at >= eps — corpus-wins provenance, ready for an anti-join drop or
    * an `extendIvfIndex` accept of the novel remainder (the same
    * accept→bump lifecycle the other index families run). */
  def semanticDupAgainstIndex(index: IvfIndex, batch: DataFrame,
                              idCol: String, vecCol: String,
                              eps: Double = 0.95,
                              maxCellSize: Int = 100000): DataFrame = {
    val okCells = broadcast(
      index.assigned.groupBy("cell").count()
        .filter(col("count") <= maxCellSize).select("cell"))
    val probe = assignToCells(batch, index.centers, idCol, vecCol)
      .select(col("cell"), col("neighbor_id").as("__batch_id"),
        col("c_vec").as("__batch_vec"))
      .join(okCells, Seq("cell"))
    probe
      .join(index.assigned.select(col("cell"),
        col("neighbor_id").as("corpus_id"), col("c_vec").as("__corpus_vec")),
        Seq("cell"))
      .select(col("__batch_id").as(idCol), col("corpus_id"),
        graft.functions.VectorExpressions
          .cosine_similarity(col("__batch_vec"), col("__corpus_vec"))
          .as("cosine"))
      .filter(col("cosine") >= eps)
  }

  /** The drop decision `semanticDupAgainstIndex` feeds: batch rows with
    * NO >= eps corpus match in their cell survive (corpus-wins, the
    * same contract as `dedupAgainstCorpus`). One broadcast anti-join of
    * the skinny match ids against the batch. */
  def semanticDedupBatch(index: IvfIndex, batch: DataFrame,
                         idCol: String, vecCol: String,
                         eps: Double = 0.95,
                         maxCellSize: Int = 100000): DataFrame =
    batch.join(
      broadcast(semanticDupAgainstIndex(index, batch, idCol, vecCol, eps,
        maxCellSize).select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
}
