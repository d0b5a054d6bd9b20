package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product-quantization ANN: codebook fit, ADC scoring, exact re-rank,
  * and the shared index lifecycle (save/load/extend/filtered/close). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embs = graft.sources.Tables
    .load(spark, TestSpark.Sf0001, "embeddings")

  test("full rerank makes PQ exactly equal to brute force (ADC only gates the candidate order)") {
    // With rerank >= corpus size the exact pass re-scores EVERYTHING, so
    // whatever the codebooks look like, pqProbe must return bit-identical
    // rows to bruteForceTopK — isolating the lifecycle/scoring plumbing
    // from quantization quality.
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val n = e.count().toInt
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 5,
      m = 8, ksub = 8, rerank = n)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(pq === brute)
  }

  test("PQ finds planted near-duplicates at rank 1 with a pruning rerank") {
    val e = embs
    import org.apache.spark.sql.functions.{transform => atransform}
    val planted = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"),
        atransform(col("embedding"), x => x * 1.01f + 0.001f).as("embedding"))
    val withPlanted = e.select("vec_id", "embedding").union(planted)
    val q = e.filter(col("vec_id") < 5)
    val top = Similarity.pqTopK(withPlanted, q, "vec_id", "embedding",
      k = 3, m = 8, ksub = 16, rerank = 20)
      .filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { id =>
      assert(top.get(id).contains(id + 10000),
        s"query $id missed its planted dup: $top")
    }
  }

  test("fit-once/probe-many == one-shot; save/load roundtrip probes identically") {
    val e = embs.filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    val idx = Similarity.pqFit(e, "vec_id", "embedding", m = 8, ksub = 8)
    def rows(i: Similarity.PqIndex) =
      Similarity.pqProbe(i, q, "vec_id", "embedding", k = 5, rerank = 30)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    val oneShot = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 5,
      m = 8, ksub = 8, rerank = 30)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows(idx) === oneShot)

    val dir = TestSpark.tmpDir("graft-pq-roundtrip")
    val saved = idx.save(dir)
    val loaded = Similarity.loadPqIndex(spark, dir)
    assert(loaded.m == 8 && loaded.ksub == 8 && loaded.dim == idx.dim)
    assert(loaded.codebooks == idx.codebooks,
      "codebooks must round-trip float-exact")
    assert(rows(loaded) === oneShot)
    saved.close()
  }

  test("extend encodes with FROZEN codebooks, bumps version, carries lineage") {
    val e = embs.filter(col("vec_id") < 300)
    val dir = TestSpark.tmpDir("graft-pq-extend")
    val half = Similarity.pqFit(e.filter(col("vec_id") < 150),
      "vec_id", "embedding", m = 8, ksub = 8).save(dir)
    val ext = Similarity.extendPqIndex(half,
      e.filter(col("vec_id") >= 150), "vec_id", "embedding")
    assert(ext.codebooks == half.codebooks, "extension must not refit")
    assert(ext.version == 2L && ext.savedDir.isEmpty)
    assert(ext.parent.contains(dir))
    // the new vectors are probe-visible: a query that IS a new vector
    // finds itself excluded but its exact duplicate would rank first —
    // here just assert a late vector appears among some top-k
    val q = e.filter(col("vec_id") === 0)
    val seen = Similarity.pqProbe(ext, q, "vec_id", "embedding",
      k = 300, rerank = 300)
      .select("neighbor_id").as[Long].collect().toSet
    assert(seen.exists(_ >= 150), "extended vectors must be probe-visible")
    assert(seen.size == 299, "every other vector ranks within k=300")
    half.close()
  }

  test("filtered view prunes candidates before ADC and drops lineage") {
    val e = embs.filter(col("vec_id") < 300)
      .withColumn("domain",
        when(col("vec_id") % 2 === 0, "even").otherwise("odd"))
    val idx = Similarity.pqFit(e, "vec_id", "embedding", m = 8, ksub = 8,
      metaCols = Seq("domain"))
    val view = idx.copy(savedDir = Some("/tmp/fake"), parent = Some("/tmp/p"))
      .filtered(col("domain") === "even")
    assert(view.savedDir.isEmpty && view.parent.isEmpty,
      "a filtered subset must not masquerade as the full tree")
    val q = e.filter(col("vec_id") === 1).select("vec_id", "embedding")
    val ids = Similarity.pqProbe(view, q, "vec_id", "embedding",
      k = 10, rerank = 30)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(ids.nonEmpty && ids.forall(_ % 2 == 0),
      s"only qualifying candidates may surface: $ids")
  }

  test("a failing codebook fit fails the train fast and leaves the session usable") {
    // A NULL embedding makes every subspace's KMeans fit throw. The
    // bounded-await/cancel-group path (VERDICT r19 #5) must surface the
    // failure promptly — not hang on Duration.Inf with a live pool — and
    // must not wedge the session for subsequent jobs.
    val e = embs.filter(col("vec_id") < 100)
      .select(col("vec_id"),
        when(col("vec_id") === 7, lit(null)
          .cast("array<float>")).otherwise(col("embedding")).as("embedding"))
    val t0 = System.nanoTime()
    val err = intercept[Throwable] {
      Similarity.pqFit(e, "vec_id", "embedding", m = 8, ksub = 8)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(err != null)
    assert(secs < 120.0, s"failing fit took ${secs}s — not fail-fast")
    // session still serves jobs after the cancelled group
    assert(embs.limit(1).count() == 1L)
  }
}
