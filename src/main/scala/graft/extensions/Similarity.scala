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
   */
  def lshTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      planes: Int = 12, bands: Int = 4): DataFrame = {

    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            graft.functions.VectorExpressions
              .sign_lsh_bucket(col(vecCol), planes, b * planes).as("bucket"))
        }: _*)).as("bb"))
        .select(col(id), col(vec), col("bb.band"), col("bb.bucket"))

    val c = banded(candidates, "neighbor_id", "c_vec")
    val q = broadcast(banded(queries, "query_id", "q_vec"))
    val scored = c.join(q, Seq("band", "bucket"))
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
                            savedDir: Option[String] = None) {
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
      * The view is cheap — build once per predicate and probe many. */
    def filtered(predicate: Column): IvfIndex =
      copy(assigned = assigned.filter(predicate))

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
      copy(savedDir = Some(dir))
    }

    /** Retire this index version in ONE call — unpersist + delete the
      * saved tree, if any; same contract as `CorpusIndex.close`. */
    def close(): Unit = {
      unpersist()
      savedDir.foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(centers.sparkSession.sessionState.newHadoopConf())
          .delete(p, true)
      }
    }
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$dir/centers"),
      spark.read.parquet(s"$dir/assigned"),
      savedDir = Some(dir))

  /** Assign vectors to their nearest cell of an EXISTING centroid table
    * (squared Euclidean — KMeans' own metric; ties to the lowest cell
    * id). The centroids are collected to the driver and inlined as ONE
    * array-of-structs literal — O(nlist × dim) values, the same "model
    * broadcast" shape `KMeans.transform` has — and the argmin is a
    * single `transform` + `array_min` over that literal: zero shuffle,
    * zero ML-pipeline dependency at probe/extend time, and O(1) plan
    * NODES in nlist. (The earlier shape built one struct expression per
    * cell inside the projection — fine at nlist=16, but a production
    * IVF runs 4k–64k cells, where tens of thousands of expression nodes
    * break whole-stage codegen and blow up planning time. The per-row
    * O(nlist × dim) arithmetic is inherent to coarse quantization; the
    * expression-count blowup was not.) */
  def assignToCells(vecs: DataFrame, centers: DataFrame,
                    idCol: String, vecCol: String,
                    metaCols: Seq[String] = Nil): DataFrame = {
    val ctrs = centers.select(col("cell"), col("center")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq)).sortBy(_._1).toSeq
    require(ctrs.nonEmpty, "centroid table is empty")
    val ctrLit = typedlit(ctrs) // array<struct<_1: cell, _2: center>>
    // same float-subtract/multiply + double-accumulate per cell as the
    // per-cell-literal formulation — assignment stays bit-identical to
    // KMeans.transform (spec-pinned); struct (d2, cell) ordering keeps
    // ties on the lowest cell id
    val best = array_min(transform(ctrLit, c =>
      struct(
        aggregate(zip_with(col("c_vec"), c.getField("_2"), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, x) => acc + x).as("d2"),
        c.getField("_1").as("cell"))))
    vecs.select(col(idCol).as("neighbor_id") +: col(vecCol).as("c_vec") +:
        metaCols.map(col): _*)
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
        assignToCells(newVecs, index.centers, idCol, vecCol, metaCols)))
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

  /** Probe a fitted index: score only the `nprobe` nearest cells' members. */
  def ivfProbe(
      index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      nprobe: Int = 4): DataFrame = {

    val assigned = index.assigned
    val centers = index.centers
    val qProbes = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
        .crossJoin(broadcast(centers))
        .select(col("query_id"), col("q_vec"), col("cell"),
          aggregate(zip_with(col("q_vec"), col("center"),
            (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x).as("d2"))
        .withColumn("__pr", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)))
        .filter(col("__pr") <= nprobe)
        .select(col("query_id"), col("q_vec"), col("cell")))

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
}
