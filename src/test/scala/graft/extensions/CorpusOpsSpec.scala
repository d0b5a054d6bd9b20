package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 13 distinct tokens, so it carries real 8-grams
  private val passage = "the standard benchmark question about widgets appears " +
    "verbatim in this evaluation set today"

  test("decontamination: docs quoting an eval passage drop, clean docs survive") {
    val evalSet = Seq((100L, passage)).toDF("doc_id", "text")
    val train = Seq(
      // quotes the full eval passage inside longer text -> contaminated
      (1L, s"some preamble text then $passage and a closing remark"),
      // shares only a 4-word phrase (under the 8-gram window) -> clean
      (2L, "the standard benchmark question people ask is entirely " +
        "unrelated to evaluation leakage concerns here"),
      // no overlap at all -> clean
      (3L, "completely different content about spark query engines and " +
        "columnar execution with shuffles joins and aggregation at scale")
    ).toDF("doc_id", "text")

    val contaminated = CorpusOps.contaminatedIds(train, evalSet, "doc_id", "text")
      .as[Long].collect().toSet
    assert(contaminated == Set(1L))

    val kept = CorpusOps.decontaminate(train, evalSet, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    assert(kept.columns.toSeq == train.columns.toSeq,
      "survivors keep all training columns")

    // the eval gram set must BROADCAST: the corpus side is the 100 TB
    // side and may never shuffle for the semi-join
    val plan = CorpusOps.contaminatedIds(train, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval gram set must broadcast, got:\n$plan")
  }

  test("contamination report: hit counts over distinct grams, hit fraction exact") {
    // train doc = eval passage + 3 extra leading tokens, all tokens
    // distinct -> n_grams and n_hit are countable by hand
    val evalSet = Seq((100L, passage)).toDF("doc_id", "text")
    val train = Seq((1L, s"alpha beta gamma $passage"),
      (2L, "no overlap here at all with anything in the evaluation")).toDF("doc_id", "text")

    val r = CorpusOps.contaminationReport(train, evalSet, "doc_id", "text")
      .select("doc_id", "n_grams", "n_hit", "hit_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 1 && r.head._1 == 1L, "only the quoting doc is reported")
    val (_, nGrams, nHit, frac) = r.head
    // 3 + 13 = 16 distinct tokens -> 9 distinct 8-grams; the 6 that land
    // fully inside the quoted 13-token span are exactly the eval doc's
    // own 8-grams
    assert(nGrams == 9L, s"expected 9 distinct 8-grams, got $nGrams")
    assert(nHit == 6L, s"expected 6 eval hits, got $nHit")
    assert(math.abs(frac - 6.0 / 9.0) < 1e-15)
  }

  test("bloom decontamination: identical keep-set to the broadcast path on real docs") {
    // the operator's whole contract is IDENTITY — the bloom only prunes
    // work for the exact confirm join, never changes the answer. Checked
    // on the real documents table (planted near-dup clusters, so the
    // %11 split genuinely contaminates), not a toy fixture.
    val d = graft.sources.Tables.load(spark, TestSpark.Sf0001, "documents")
    val train = d.filter(col("doc_id") % 11 =!= 0)
    val evalSet = d.filter(col("doc_id") % 11 === 0)
    val exact = CorpusOps.decontaminate(train, evalSet, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val bloomed = CorpusOps.decontaminateBloom(train, evalSet, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == exact, "bloom path must be a pure work optimization")
    assert(exact.nonEmpty && exact.size < train.count(),
      "fixture sanity: the split contaminates some docs and spares others")
    assert(bloomed.subsetOf(
      train.select("doc_id").as[Long].collect().toSet))
  }

  test("bloom decontamination: answer invariant under fpp (false positives die in the confirm join)") {
    val d = graft.sources.Tables.load(spark, TestSpark.Sf0001, "documents")
      .limit(200)
    val train = d.filter(col("doc_id") % 11 =!= 0)
    val evalSet = d.filter(col("doc_id") % 11 === 0)
    // fpp 0.5 floods the suspect stream with false positives; fpp 0.01
    // barely any — the keep-set must not move by a single row
    val loose = CorpusOps.decontaminateBloom(train, evalSet, "doc_id", "text",
      fpp = 0.5).select("doc_id").as[Long].collect().toSet
    val tight = CorpusOps.decontaminateBloom(train, evalSet, "doc_id", "text",
      fpp = 0.01).select("doc_id").as[Long].collect().toSet
    assert(loose == tight, "fpp is a work dial, not a semantics dial")
    // and a loose bloom really does pass MORE suspects through — the
    // dial moves the pruned stream, proving the filter is in the plan
    val nLoose = CorpusOps.bloomSuspectGrams(train, evalSet, "doc_id", "text",
      shingleK = 8, fpp = 0.5).count()
    val nTight = CorpusOps.bloomSuspectGrams(train, evalSet, "doc_id", "text",
      shingleK = 8, fpp = 0.01).count()
    assert(nLoose >= nTight,
      s"fpp 0.5 must admit at least as many suspects as 0.01 ($nLoose vs $nTight)")
  }

  test("packSequences: greedy concatenation order, boundary straddle, shard isolation") {
    // one shard (all ids even), token counts 3/4/2 against budget 5:
    // exclusive cumsums 0,3,7 -> packs 0,0,1 and offsets 0,3,2
    val docs = Seq((2L, "a b c"), (4L, "d e f g"), (6L, "h i"))
      .toDF("doc_id", "text")
    val packed = CorpusOps.packSequences(docs, "doc_id", "text",
      budget = 5, shard = lit(0))
      .select("doc_id", "pack_id", "tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == Seq((2L, 0L, 0L), (4L, 0L, 3L), (6L, 1L, 2L)))

    // shards pack independently: same docs split across 2 shards restart
    // each shard's token stream at offset 0
    val sharded = CorpusOps.packSequences(docs, "doc_id", "text",
      budget = 5, shard = pmod(col("doc_id"), lit(4)))
      .select("shard", "doc_id", "pack_id", "tok_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sharded == Set((2L, 2L, 0L, 0L), (0L, 4L, 0L, 0L), (2L, 6L, 0L, 3L)))

    // placement is deterministic under physical reshuffling: the shard
    // key + in-shard id order pin it, not partitioning or arrival order
    val again = CorpusOps.packSequences(docs.repartition(7), "doc_id", "text",
      budget = 5, shard = lit(0))
      .select("doc_id", "pack_id", "tok_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == packed.toSeq)
  }

  test("stratifiedSample: fraction 1 keeps all, 0 drops all, default applies, deterministic") {
    val df = (1L to 400L).map(i => (i, s"s${i % 4}")).toDF("id", "stratum")

    val full = CorpusOps.stratifiedSample(df, col("id"), col("stratum"),
      Map("s0" -> 1.0, "s1" -> 0.0), defaultFraction = 0.5)
    val bySt = full.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(bySt.getOrElse("s0", 0L) == 100L, "fraction 1.0 keeps every row")
    assert(!bySt.contains("s1"), "fraction 0.0 keeps none")
    // default 0.5 over 100 uniform md5 prefixes per stratum: loose band
    assert(bySt("s2") > 25L && bySt("s2") < 75L)
    assert(bySt("s3") > 25L && bySt("s3") < 75L)
    assert(full.columns.toSeq == df.columns.toSeq, "helper columns dropped")

    // content-stable: a row's fate depends only on (key, stratum
    // fraction) — rerun and re-partitioned runs agree row for row
    val a = full.select("id").as[Long].collect().toSet
    val b = CorpusOps.stratifiedSample(df.repartition(5), col("id"),
      col("stratum"), Map("s0" -> 1.0, "s1" -> 0.0), defaultFraction = 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)

    // ...and a stratum's sample at a LOWER fraction is a subset of its
    // sample at a higher one (threshold monotonicity — growing a
    // mixture never resamples what was already kept)
    val half = CorpusOps.stratifiedSample(df, col("id"), col("stratum"),
      Map("s2" -> 0.3), defaultFraction = 0.0)
      .select("id").as[Long].collect().toSet
    val more = CorpusOps.stratifiedSample(df, col("id"), col("stratum"),
      Map("s2" -> 0.7), defaultFraction = 0.0)
      .select("id").as[Long].collect().toSet
    assert(half.subsetOf(more))
  }

  test("fractionThreshold: hex width, bounds, and the >= 1.0 sentinel") {
    assert(CorpusOps.fractionThreshold(0.0) == "0000")
    assert(CorpusOps.fractionThreshold(0.1) == "1999")
    assert(CorpusOps.fractionThreshold(0.25) == "4000")
    assert(CorpusOps.fractionThreshold(0.5) == "8000")
    assert(CorpusOps.fractionThreshold(0.75) == "c000")
    assert(CorpusOps.fractionThreshold(1.0) == "g")
    assert(CorpusOps.fractionThreshold(1.5) == "g")
    // 'g' sorts above every lowercase hex digit, so the sentinel keeps all
    assert("ffff" < "g")
  }

  test("quotaSample: exact counts, tree rank == naive global rank, fanout-invariant") {
    import org.apache.spark.sql.expressions.Window
    // strata sized around their quotas: s0 binds (quota < size), s1
    // keeps all (quota > size), s2 takes the default
    val df = ((1L to 200L).map(i => (i, "s0")) ++
      (201L to 215L).map(i => (i, "s1")) ++
      (216L to 275L).map(i => (i, "s2"))).toDF("id", "stratum")
    val quotas = Map("s0" -> 40, "s1" -> 50)

    // the REFERENCE semantics: one global per-stratum rank over the
    // same salted-md5 order the operator documents
    val ord = md5(concat(lit("quota:"), col("id").cast("string")).cast("binary"))
    val naive = df
      .withColumn("r", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(ord, col("id"))))
      .filter(col("r") <= when(col("stratum") === "s0", 40)
        .when(col("stratum") === "s1", 50).otherwise(10))
      .select(col("id"), col("r").cast("long"))
      .as[(Long, Long)].collect().toSet

    for (fanout <- Seq(1, 4, 64)) {
      val got = CorpusOps.quotaSample(df, col("id"), col("stratum"),
        quotas, defaultQuota = 10, fanout = fanout)
        .select(col("id"), col("rank").cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(got == naive, s"fanout=$fanout must not change the kept set")
    }

    val counts = CorpusOps.quotaSample(df, col("id"), col("stratum"),
      quotas, defaultQuota = 10)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts == Map("s0" -> 40L, "s1" -> 15L, "s2" -> 10L),
      "exactly min(quota, |stratum|) per stratum")

    // physical layout must not leak into the kept set or the ranks
    val rep = CorpusOps.quotaSample(df.repartition(7), col("id"),
      col("stratum"), quotas, defaultQuota = 10)
      .select(col("id"), col("rank").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(rep == naive)

    // ranks are a clean 1..n prefix per stratum — downstream "first k
    // of the quota" slices need no re-rank
    val ranks = CorpusOps.quotaSample(df, col("id"), col("stratum"),
      quotas, defaultQuota = 10)
      .select(col("stratum"), col("rank").cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    ranks.foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"stratum $s ranks must be a contiguous 1..n prefix")
    }
  }

  test("wordFreq: exact counts under the shared token convention, minCount prunes losslessly") {
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry! APPLE"),
      (3L, "")).toDF("id", "text")
    // tokens() lowercases and strips punctuation — APPLE and cherry!
    // must land on the same counters as their clean forms
    val freq = CorpusOps.wordFreq(df, col("text"))
      .as[(String, Long)].collect().toMap
    assert(freq == Map("apple" -> 3L, "banana" -> 2L, "cherry" -> 1L))
    val pruned = CorpusOps.wordFreq(df, col("text"), minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(pruned == Map("apple" -> 3L, "banana" -> 2L),
      "minCount prunes AFTER the exact count — surviving rows unchanged")
  }

  test("vocabCoverage: bounded prefix, exact cumulative fractions") {
    val df = Seq((1L, "a a a b b c")).toDF("id", "text")
    // tokens a(3) b(2) c(1), total 6 occurrences
    val rows = CorpusOps.vocabCoverage(df, col("text"), topK = 2)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rows == Seq((1L, "a", 3L, 0.5), (2L, "b", 2L, 5.0 / 6.0)))
  }

  test("rarityScore: exact integer sums, OOV contributes zero, cross-corpus fit") {
    val corpus = Seq((1L, "the the cat"), (2L, "the dog")).toDF("id", "text")
    val freq = CorpusOps.wordFreq(corpus, col("text")) // the->3 cat->1 dog->1
    val scored = CorpusOps.rarityScore(corpus, col("id"), col("text"), freq)
      .select("doc_id", "n_tokens", "sum_count", "mean_count")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scored(1L) == ((1L, 3L, 7L, 7.0 / 3.0))) // the(3)+the(3)+cat(1)
    assert(scored(2L) == ((2L, 2L, 4L, 2.0)))       // the(3)+dog(1)
    // a freq table fitted on corpus A scores corpus B; unseen tokens
    // count 0 (the conservative direction for a keep-if-ordinary gate)
    val other = Seq((9L, "the zebra")).toDF("id", "text")
    val x = CorpusOps.rarityScore(other, col("id"), col("text"), freq)
      .select("doc_id", "n_tokens", "sum_count", "mean_count")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(x == Seq((9L, 2L, 3L, 1.5)))
  }

  test("profile: nulls, exact distincts, native-type min/max, approx mode agrees") {
    val df = Seq[(Option[Long], Option[String])](
      (Some(9L), Some("b")), (Some(10L), None), (None, Some("a")),
      (Some(10L), Some("a"))).toDF("num", "s")
    def byCol(exact: Boolean) = CorpusOps.profile(df, exact)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = byCol(exact = true)
    assert(p("num").getLong(1) == 4L && p("num").getLong(2) == 1L &&
      p("num").getLong(3) == 2L)
    assert(p("num").getString(4) == "9" && p("num").getString(5) == "10",
      "min/max must aggregate on the NATIVE type — string order says 10 < 9")
    assert((p("s").getLong(2), p("s").getLong(3),
      p("s").getString(4), p("s").getString(5)) == ((1L, 2L, "a", "b")))
    // approx mode: identical report except n_distinct, which is a sketch
    val a = byCol(exact = false)
    for (c <- Seq("num", "s")) {
      assert(a(c).getLong(1) == p(c).getLong(1) &&
        a(c).getLong(2) == p(c).getLong(2))
      assert(a(c).getString(4) == p(c).getString(4) &&
        a(c).getString(5) == p(c).getString(5))
      assert(math.abs(a(c).getLong(3) - p(c).getLong(3)) <= 1)
    }
  }

  test("mixPlan: rates hit the budget share, short strata cap and flag exhausted") {
    // s0: 1000 tokens avail, wants .6 * 1500 = 900  -> rate .9
    // s1:  200 tokens avail, wants .4 * 1500 = 600  -> caps at 1.0, exhausted
    // s2:  300 tokens avail, no weight             -> rate 0, planned 0
    val df = Seq(
      ("s0", 400L), ("s0", 600L),
      ("s1", 200L),
      ("s2", 300L)).toDF("stratum", "n_tok")
    val plan = CorpusOps.mixPlan(df, col("stratum"), col("n_tok"),
      Map("s0" -> 0.6, "s1" -> 0.4), budgetTokens = 1500L)
      .select("stratum", "n_docs", "avail_tokens", "target_frac",
        "sample_rate", "planned_tokens", "exhausted")
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(plan("s0") == (("s0", 2L, 1000L, 0.6, 0.9, 900.0, false)))
    assert(plan("s1") == (("s1", 1L, 200L, 0.4, 1.0, 200.0, true)))
    assert(plan("s2") == (("s2", 1L, 300L, 0.0, 0.0, 0.0, false)))
  }

  // ---------------------------------------- bigram LM statistics

  test("bigramFreq: adjacent pairs counted, short docs yield none, minCount prunes") {
    val df = Seq(
      (1L, "a b a b"), // pairs: (a,b) (b,a) (a,b)
      (2L, "solo"),    // 1 token -> no pairs
      (3L, "")         // no tokens -> no pairs
    ).toDF("doc_id", "text")
    val freq = CorpusOps.bigramFreq(df, col("text"))
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(freq == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    val pruned = CorpusOps.bigramFreq(df, col("text"), minCount = 2L)
      .as[(String, String, Long)].collect()
    assert(pruned.toSeq == Seq(("a", "b", 2L)),
      "minCount prunes after the exact count — surviving rows unchanged")
  }

  test("collocations: lift is the exact integer-product ratio") {
    // one doc "x y x y": pairs (x,y)x2 (y,x)x1, total_pairs 3,
    // unigrams x:2 y:2 -> lift(x,y) = 2*3/(2*2) = 1.5, lift(y,x) = 0.75
    val df = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val got = CorpusOps.collocations(df, col("text"), minPair = 1L, topK = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("x", "y", 2L, 1.5), ("y", "x", 1L, 0.75)),
      s"exact lift values in lift-desc order, got $got")
  }

  test("bigramNovelty: OOV pairs count as novel, pruned-fit pairs too") {
    val fitCorpus = Seq((1L, "a b c")).toDF("doc_id", "text") // fits: (a,b) (b,c)
    val score = Seq((10L, "a b x"), (11L, "b c")).toDF("doc_id", "text")
    val fitted = CorpusOps.bigramFreq(fitCorpus, col("text"))
    val nov = CorpusOps.bigramNovelty(score, col("doc_id"), col("text"), fitted)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 10: (a,b) seen, (b,x) novel -> 1/2; doc 11: (b,c) seen -> 0/1
    assert(nov(10L) == ((10L, 2L, 1L, 0.5)))
    assert(nov(11L) == ((11L, 1L, 0L, 0.0)))

    // a minCount-pruned fit marks the pruned tail as novel — the
    // documented conservative direction
    val prunedFit = CorpusOps.bigramFreq(fitCorpus, col("text"), minCount = 2L)
    val allNovel = CorpusOps.bigramNovelty(score, col("doc_id"), col("text"), prunedFit)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(allNovel == Map(10L -> 2L, 11L -> 1L))
  }

  // ------------------------------------- deterministic shard export

  private def shardCorpus = Seq.tabulate(200)(i =>
    (i.toLong, s"doc number $i body", 10L + i)).toDF("doc_id", "text", "n_chars")

  test("shardAssign: deterministic, in-range, decorrelated from the quota/split hashes") {
    val a = CorpusOps.shardAssign(shardCorpus, col("doc_id"), 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = CorpusOps.shardAssign(shardCorpus.repartition(7), col("doc_id"), 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a == b, "assignment is content-stable — partitioning must not matter")
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size == 8, "200 docs over 8 shards hit every shard")
    assertThrows[IllegalArgumentException] {
      CorpusOps.shardAssign(shardCorpus, col("doc_id"), 0)
    }
    assertThrows[IllegalArgumentException] {
      CorpusOps.shardAssign(shardCorpus, col("doc_id"), 65537)
    }
  }

  test("shardStats: manifest totals reconcile with the corpus") {
    val st = CorpusOps.shardStats(shardCorpus, col("doc_id"), col("n_chars"), 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(st.map(_._2).sum == 200L)
    assert(st.map(_._3).sum == (0 until 200).map(10L + _).sum)
    assert(st.map(_._1).sorted.toSeq == (0L until 8L))
  }

  test("shardPositions: a valid 1..n permutation per shard, partitioning-invariant") {
    val pos = CorpusOps.shardPositions(shardCorpus, col("doc_id"), 8)
      .as[(Long, Long, Long)].collect()
    pos.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    val pos2 = CorpusOps.shardPositions(shardCorpus.repartition(13),
      col("doc_id"), 8).as[(Long, Long, Long)].collect()
    assert(pos.sortBy(_._1).toSeq == pos2.sortBy(_._1).toSeq,
      "the export permutation is content-stable")
  }

  test("writeShards: partitioned tree round-trips, rows stored in export order, re-export identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      CorpusOps.writeShards(shardCorpus, col("doc_id"), 8, dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == 200L)
      assert(back.columns.toSet == Set("doc_id", "text", "n_chars", "shard"))
      assert(!back.columns.contains("__export_ord"), "the sort key never ships")

      // shard filter prunes at the directory level
      val one = spark.read.parquet(dir).filter(col("shard") === 3)
      val expected = CorpusOps.shardPositions(shardCorpus, col("doc_id"), 8)
        .filter(col("shard") === 3).orderBy(col("pos"))
        .select("key").as[Long].collect().toSeq
      // within a shard the FILE ORDER is the export order (one writer
      // task per shard; parquet preserves row order)
      val stored = one.select("doc_id").as[Long].collect().toSeq
      assert(stored == expected,
        "shard rows must be stored in the deterministic export order")

      // re-export is byte-for-byte consistent at the row level — the
      // resume/retry guarantee
      CorpusOps.writeShards(shardCorpus.repartition(11), col("doc_id"), 8, dir)
      val again = spark.read.parquet(dir).filter(col("shard") === 3)
        .select("doc_id").as[Long].collect().toSeq
      assert(again == stored)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("leakageSafeSplit: duplicate texts move as one group; naive per-doc " +
    "split would straddle them") {
    // ids 1 and 3 share a text; md5("1") starts 'c4' (train) while
    // md5("3") starts 'ec' (test) — the exact leak a per-doc hash split
    // commits. Group-rep splitting must put BOTH where id 1 goes.
    val docs = Seq(
      (1L, "shared dup text"),
      (3L, "shared dup text"),
      (7L, "unique text one"),
      (9L, "unique text two")
    ).toDF("doc_id", "text")
    val naive = docs.select(col("doc_id"),
      graft.functions.TextFunctions.hashSplit(col("doc_id").cast("string"))
        .as("split"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    assert(naive(1L) === "train" && naive(3L) === "test",
      "fixture must demonstrate the naive straddle")
    val safe = CorpusOps.leakageSafeSplit(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_rep"), r.getAs[String]("split"))).toMap
    assert(safe(1L) === ((1L, "train")))
    assert(safe(3L) === ((1L, "train")), "the copy follows its group rep")
    // singletons: rep = self, split = the rep's own hash split
    assert(safe(7L)._1 === 7L && safe(9L)._1 === 9L)
    assert(safe(7L)._2 === naive(7L) && safe(9L)._2 === naive(9L))
    // the invariant the operator exists for: no text straddles splits
    val straddles = CorpusOps.leakageSafeSplit(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .groupBy("text").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddles === 0L)
  }

  test("leakageSafeSplit honors non-default split boundaries") {
    // ADVICE r15: trainTo/valTo were declared but silently dropped —
    // only the defaults were ever exercised. Pin that both variants
    // route the boundaries through to hashSplit: "00"/"00" sends
    // everything to test, "zz"/"zz" sends everything to train (hex
    // chars all < 'z'), and the custom boundary agrees with a direct
    // hashSplit at the same thresholds.
    val docs = Seq((1L, "a"), (3L, "b"), (7L, "c"), (9L, "d"))
      .toDF("doc_id", "text")
    val allTest = CorpusOps.leakageSafeSplit(docs, "doc_id", "text",
      trainTo = "00", valTo = "00")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(allTest === Set("test"))
    val allTrain = CorpusOps.leakageSafeSplit(docs, "doc_id", "text",
      trainTo = "zz", valTo = "zz")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(allTrain === Set("train"))
    val custom = CorpusOps.leakageSafeSplit(docs, "doc_id", "text",
      trainTo = "80", valTo = "c0")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    val direct = docs.select(col("doc_id"),
      graft.functions.TextFunctions.hashSplit(col("doc_id").cast("string"),
        "80", "c0").as("split"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    // every text is unique, so each doc is its own rep — the split must
    // equal the direct hashSplit at the SAME custom thresholds
    assert(custom === direct)
    // ...and the groups variant (which already passed them) stays honest
    val groups = Seq((1L, 1L), (3L, 1L)).toDF("doc_id", "group_id")
    val g = CorpusOps.leakageSafeSplitGroups(docs, "doc_id", groups,
      trainTo = "00", valTo = "00")
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(g === Set("test"))
  }

  test("leakageSafeSplitGroups: near-dup groups move as a unit; ungrouped " +
    "docs are their own representative") {
    val docs = Seq((1L, "a"), (3L, "b"), (7L, "c"), (9L, "d"))
      .toDF("doc_id", "text")
    // an externally-resolved near-dup grouping (resolveDupGroups
    // contract): 1 and 3 are one component labelled by the min id
    val groups = Seq((1L, 1L), (3L, 1L)).toDF("doc_id", "group_id")
    val out = CorpusOps.leakageSafeSplitGroups(docs, "doc_id", groups)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_rep"), r.getAs[String]("split"))).toMap
    // md5("1") -> train, md5("3") -> test: the naive per-doc straddle
    // the group split must prevent
    assert(out(1L) === ((1L, "train")))
    assert(out(3L) === ((1L, "train")))
    assert(out(7L)._1 === 7L && out(9L)._1 === 9L)
    val naive = docs.select(col("doc_id"),
      graft.functions.TextFunctions.hashSplit(col("doc_id").cast("string"))
        .as("split"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    assert(out(7L)._2 === naive(7L) && out(9L)._2 === naive(9L))
  }

  test("semantic decontamination: eval members and their near-copies drop, " +
    "the rest survive; cell-pruned path equals brute; empty eval keeps all") {
    val e = graft.sources.Tables.load(spark, graft.TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 100)
    val copies = e.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 10000L).as("vec_id"),
      concat(array(col("embedding").getItem(0) + lit(0.05f)),
        slice(col("embedding"), 2, 1000000)).as("embedding"))
    val train = e.select(col("vec_id"), col("embedding")).unionByName(copies)
    val eval_ = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    val kept = CorpusOps.decontaminateSemantic(train, eval_,
      "vec_id", "embedding", eps = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every eval member self-matches at 1.0; every nudged copy matches
    // its original at ~0.9988; everything else sits near cosine 0.4
    (0L until 100L).foreach { id =>
      assert(kept.contains(id) === (id % 10 != 0), s"id $id")
    }
    assert(kept.forall(_ < 10000L), "copies must drop")
    // the cell-pruned path through nudge-orthogonal explicit cells
    // (assignment ignores the nudged component) returns the SAME set
    import spark.implicits._
    val centers = Seq(
      (0, Array.tabulate(64)(i => if (i == 1) -2f else if (i == 2) -2f else 0f)),
      (1, Array.tabulate(64)(i => if (i == 1) -2f else if (i == 2) 2f else 0f)),
      (2, Array.tabulate(64)(i => if (i == 1) 2f else if (i == 2) -2f else 0f)),
      (3, Array.tabulate(64)(i => if (i == 1) 2f else if (i == 2) 2f else 0f))
    ).toDF("cell", "center")
    val idx = Similarity.IvfIndex(centers,
      Similarity.assignToCells(train, centers, "vec_id", "embedding"))
    val contCells = CorpusOps.contaminatedIdsSemanticCells(idx, eval_,
      "vec_id", "embedding", eps = 0.95)
      .collect().map(_.getLong(0)).toSet
    val contBrute = CorpusOps.contaminatedIdsSemantic(train, eval_,
      "vec_id", "embedding", eps = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(contCells === contBrute,
      "within-cell pruning must lose nothing on the co-celled fixture")
    // empty eval battery contaminates nothing
    assert(CorpusOps.decontaminateSemantic(train,
      eval_.filter(lit(false)), "vec_id", "embedding").count()
      === train.count())
  }

  test("corpusDiff classifies added/removed/changed/same; stats roll up") {
    val oldC = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newC = Seq((2L, "beta"), (3L, "gamma prime"), (4L, "delta"))
      .toDF("doc_id", "text")
    val diff = CorpusOps.corpusDiff(oldC, newC, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    assert(diff === Map(1L -> "removed", 2L -> "same",
      3L -> "changed", 4L -> "added"))
    val stats = CorpusOps.corpusDiffStats(oldC, newC, "doc_id", "text")
      .collect().map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n"), r.getAs[Long]("min_id"),
          r.getAs[Long]("max_id"))).toMap
    assert(stats === Map(
      "removed" -> ((1L, 1L, 1L)), "same" -> ((1L, 2L, 2L)),
      "changed" -> ((1L, 3L, 3L)), "added" -> ((1L, 4L, 4L))))
    // identical snapshots: everything 'same' — the no-op refresh case
    val noop = CorpusOps.corpusDiff(oldC, oldC, "doc_id", "text")
    assert(noop.filter(col("status") =!= "same").count() === 0L)
  }
}
