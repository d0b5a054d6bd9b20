package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IVF-PQ composition (IVFADC): coarse cells prune the candidate space,
  * PQ codes compress the within-cell scan, exact re-rank bounds the
  * ranking error — plus the shared index lifecycle
  * (save/load/extend/filtered/close). */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embs = graft.sources.Tables
    .load(spark, TestSpark.Sf0001, "embeddings")

  test("no pruning (nprobe=nlist, full rerank) makes IVF-PQ exactly equal to brute force") {
    // With every cell probed and the exact pass re-scoring everything,
    // ivfPqProbe must return bit-identical rows to bruteForceTopK —
    // isolating the composition plumbing (cell join + ADC + rerank)
    // from quantization quality.
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val n = e.count().toInt
    val ivfpq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
      nlist = 4, m = 8, ksub = 8, nprobe = 4, rerank = n)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(ivfpq === brute)
  }

  test("finds planted near-duplicates at rank 1 while pruning cells AND compressing the scan") {
    val e = embs
    import org.apache.spark.sql.functions.{transform => atransform}
    val planted = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"),
        atransform(col("embedding"), x => x * 1.01f + 0.001f).as("embedding"))
    val withPlanted = e.select("vec_id", "embedding").union(planted)
    val q = e.filter(col("vec_id") < 5)
    // the 1.01x + 0.001 planted copy is near-parallel to its original, so
    // both the coarse assignment (L2 on raw vectors, same region) and the
    // codes (normalized, near-identical) keep it reachable at nprobe=2
    val top = Similarity.ivfPqTopK(withPlanted, q, "vec_id", "embedding",
      k = 3, nlist = 4, m = 8, ksub = 16, nprobe = 2, rerank = 20)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(top.get(id).contains(id + 10000),
        s"query $id missed its planted dup: $top")
    }
  }

  test("fit-once/probe-many == one-shot; save/load roundtrip probes identically; tree is cell-partitioned") {
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val idx = Similarity.ivfPqFit(e, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 8)
    def rows(i: Similarity.IvfPqIndex) =
      Similarity.ivfPqProbe(i, q, "vec_id", "embedding", k = 5,
        nprobe = 2, rerank = 30)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
      nlist = 4, m = 8, ksub = 8, nprobe = 2, rerank = 30)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows(idx) === oneShot)

    val dir = TestSpark.tmpDir("graft-ivfpq-roundtrip")
    val saved = idx.save(dir)
    // the saved codes tree is parquet partitioned BY CELL — the physical
    // layout the probe's nprobe pruning rides on at scale
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == 4, s"expected 4 cell partitions: ${cellDirs.toSeq}")
    // c_vec lives ONLY in the rerank-only vectors tree: storing it next
    // to every code row would undo the 32x storage win of the codes
    assert(!spark.read.parquet(s"$dir/codes").columns.contains("c_vec"),
      "saved codes tree must not duplicate the vector column")
    val vecDirs = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(vecDirs.length == 4, "vectors tree is cell-partitioned too")
    assert(spark.read.parquet(s"$dir/vectors").columns.toSet ==
      Set("neighbor_id", "cell", "c_vec"))
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.m == 8 && loaded.ksub == 8 && loaded.dim == idx.dim)
    assert(loaded.codebooks == idx.codebooks,
      "codebooks must round-trip float-exact")
    assert(rows(loaded) === oneShot)
    saved.close()
  }

  test("extend assigns to FROZEN cells, encodes with FROZEN codebooks, bumps version, carries lineage") {
    val e = embs.filter(col("vec_id") < 300)
    val dir = TestSpark.tmpDir("graft-ivfpq-extend")
    val half = Similarity.ivfPqFit(e.filter(col("vec_id") < 150),
      "vec_id", "embedding", nlist = 4, m = 8, ksub = 8).save(dir)
    val ext = Similarity.extendIvfPqIndex(half,
      e.filter(col("vec_id") >= 150), "vec_id", "embedding")
    assert(ext.codebooks == half.codebooks, "extension must not refit PQ")
    assert(ext.centers eq half.centers, "extension must not move centroids")
    assert(ext.version == 2L && ext.savedDir.isEmpty)
    assert(ext.parent.contains(dir))
    // new vectors land in existing cells and are probe-visible
    val q = e.filter(col("vec_id") === 0)
    val seen = Similarity.ivfPqProbe(ext, q, "vec_id", "embedding",
      k = 300, nprobe = 4, rerank = 300)
      .select("neighbor_id").as[Long].collect().toSet
    assert(seen.exists(_ >= 150), "extended vectors must be probe-visible")
    assert(seen.size == 299, "every other vector ranks within k=300")
    half.close()
  }

  test("removeFromIvfPqIndex keeps codes and vectors in lockstep under " +
    "frozen quantizers; retired ids vanish from probes") {
    val e = embs.filter(col("vec_id") < 300)
    val idx = Similarity.ivfPqFit(e, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 8)
    val rmIds = e.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val removed = Similarity.removeFromIvfPqIndex(idx, rmIds, "vec_id")
    assert(removed.codebooks == idx.codebooks && (removed.centers eq idx.centers),
      "removal must not refit either quantizer")
    assert(removed.version === idx.version + 1)
    // split-tree invariant: the two relations shrink in lockstep, and
    // survivors' codes are the FITTED rows verbatim (bitwise — an
    // anti-join never re-encodes)
    val survIds = e.filter(col("vec_id") % 3 =!= 0)
      .select("vec_id").as[Long].collect().toSet
    assert(removed.codes.select("neighbor_id").as[Long].collect().toSet == survIds)
    assert(removed.vectors.select("neighbor_id").as[Long].collect().toSet == survIds)
    // probing WITH a retired vector surfaces survivors only
    val rmId = e.filter(col("vec_id") % 3 === 0)
      .orderBy("vec_id").select("vec_id").as[Long].head()
    val hits = Similarity.ivfPqProbe(removed,
      e.filter(col("vec_id") === rmId), "vec_id", "embedding",
      k = 5, nprobe = 4, rerank = 50)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits.nonEmpty && !hits.contains(rmId))
  }

  test("residual encoding: no pruning + full rerank equals brute force exactly") {
    // isolates the residual composition — the per-(query, cell) coarse
    // term dot(qhat, chat) + the residual-codebook ADC + the shared
    // exact re-rank — from quantization quality, exactly like the
    // direct-variant test above
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val n = e.count().toInt
    val res = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
      nlist = 4, m = 8, ksub = 8, nprobe = 4, rerank = n, residual = true)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(res === brute)
  }

  test("residual encoding: planted dups at rank 1; ADC cut is tight enough at rerank=20") {
    val e = embs
    import org.apache.spark.sql.functions.{transform => atransform}
    val planted = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"),
        atransform(col("embedding"), x => x * 1.01f + 0.001f).as("embedding"))
    val withPlanted = e.select("vec_id", "embedding").union(planted)
    val q = e.filter(col("vec_id") < 5)
    val top = Similarity.ivfPqTopK(withPlanted, q, "vec_id", "embedding",
      k = 3, nlist = 4, m = 8, ksub = 16, nprobe = 2, rerank = 20,
      residual = true)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(top.get(id).contains(id + 10000),
        s"query $id missed its planted dup: $top")
    }
  }

  test("residual encoding BEATS direct in its regime (tight clusters — " +
    "the operating point the variant ships for)") {
    // VERDICT r15 #4: on near-uniform embeddings residual ≤ direct
    // (measured, PLANS.md) — the paper's gain needs TIGHT cells, where
    // the residual after subtracting the cell center is small relative
    // to the vector and the codebooks model a far smaller ball. The
    // clustered fixture (19 planted clusters, within-cluster spread
    // <= 10 in one dim vs centers ~128 apart) is exactly that regime.
    // Measured sweep (Scratch resregime, sf0.001): at nlist=19, m=8,
    // ksub=16, nprobe=2 — rerank 10: 0.328 vs 0.676; rerank 20: 0.520
    // vs 0.816; rerank 50: 0.836 vs 0.948. Gate at rerank=20 with
    // generous slack under the measured 0.296 margin.
    val ce = embs.select(col("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        ((pmod(pmod(col("vec_id"), lit(19)) * 31 + d * 17, lit(5)) - 2) * 8 +
          when(d === pmod(col("vec_id"), lit(19)) + 1,
            pmod(col("vec_id"), lit(11))).otherwise(lit(0)))
          .cast("float")).as("embedding"))
    val q = ce.filter(col("vec_id") % 20 === 0)
    val brute = Similarity.bruteForceTopK(ce, q, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val nTrue = brute.count()
    def recall(res: Boolean): Double = {
      val idx = Similarity.ivfPqFit(ce, "vec_id", "embedding",
        nlist = 19, m = 8, ksub = 16, residual = res)
      brute.join(
        Similarity.ivfPqProbe(idx, q, "vec_id", "embedding",
          k = 10, nprobe = 2, rerank = 20)
          .select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nTrue
    }
    val (direct, residual) = (recall(res = false), recall(res = true))
    assert(residual >= direct + 0.10,
      f"residual ($residual%.3f) must beat direct ($direct%.3f) by a " +
        "clear margin in the clustered regime")
    assert(residual >= 0.70,
      f"residual recall $residual%.3f under the regime floor")
  }

  test("residual encoding: flag round-trips through save/load; extend keeps the residual space") {
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val dir = TestSpark.tmpDir("graft-ivfpq-res-roundtrip")
    val idx = Similarity.ivfPqFit(e.filter(col("vec_id") < 150),
      "vec_id", "embedding", nlist = 4, m = 8, ksub = 8, residual = true)
    assert(idx.residual)
    val saved = idx.save(dir)
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.residual,
      "a loaded residual tree must keep decoding in residual space — " +
        "a dropped flag silently mis-scores every ADC probe")
    def rows(i: Similarity.IvfPqIndex) =
      Similarity.ivfPqProbe(i, q, "vec_id", "embedding", k = 5,
        nprobe = 2, rerank = 30)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    assert(rows(loaded) === rows(idx))
    // extend: residuals of the NEW vectors are taken against the same
    // frozen centers the assignment used, encoded with frozen codebooks
    val ext = Similarity.extendIvfPqIndex(loaded,
      e.filter(col("vec_id") >= 150), "vec_id", "embedding")
    assert(ext.residual && ext.codebooks == loaded.codebooks)
    val seen = Similarity.ivfPqProbe(ext,
      e.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 300, nprobe = 4, rerank = 300)
      .select("neighbor_id").as[Long].collect().toSet
    assert(seen.exists(_ >= 150), "extended vectors must be probe-visible")
    assert(seen.size == 299, "every other vector ranks within k=300")
    saved.close()
  }

  test("filtered view prunes candidates before the cell scan and drops lineage") {
    val e = embs.filter(col("vec_id") < 300)
      .withColumn("domain",
        when(col("vec_id") % 2 === 0, "even").otherwise("odd"))
    val idx = Similarity.ivfPqFit(e, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 8, metaCols = Seq("domain"))
    val view = idx.copy(savedDir = Some("/tmp/fake"), parent = Some("/tmp/p"))
      .filtered(col("domain") === "even")
    assert(view.savedDir.isEmpty && view.parent.isEmpty,
      "a filtered subset must not masquerade as the full tree")
    val q = e.filter(col("vec_id") === 1).select("vec_id", "embedding")
    val ids = Similarity.ivfPqProbe(view, q, "vec_id", "embedding",
      k = 10, nprobe = 4, rerank = 30)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0),
      s"only qualifying candidates may surface: $ids")
  }

  test("nprobe=1 scans only the query's own cell — out-of-cell vectors cannot surface") {
    // two well-separated blobs on axis 0 vs axis 1 force nlist=2 KMeans
    // to split them; a query in blob A at nprobe=1 must never return a
    // blob-B id even though rerank would admit it
    val blobA = (0L until 40L).map(i =>
      (i, Array.tabulate(16)(d => if (d == 0) 10f + (i % 5) * 0.1f else 0.01f * d)))
    val blobB = (100L until 140L).map(i =>
      (i, Array.tabulate(16)(d => if (d == 1) 10f + (i % 5) * 0.1f else 0.01f * d)))
    val vecs = (blobA ++ blobB).toDF("vec_id", "embedding")
    val idx = Similarity.ivfPqFit(vecs, "vec_id", "embedding",
      nlist = 2, m = 4, ksub = 8)
    val q = vecs.filter(col("vec_id") === 0)
    val ids = Similarity.ivfPqProbe(idx, q, "vec_id", "embedding",
      k = 80, nprobe = 1, rerank = 80)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.forall(_ < 100L),
      s"nprobe=1 must confine the scan to the query's cell: $ids")
    assert(ids.size == 39, "…and return the whole own-cell blob")
  }
}
