package graft.functions

import org.apache.spark.sql.catalyst.expressions.{XxHash64Function, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType

/**
 * Static kernels for the custom expressions in [[HashExpressions]] /
 * [[VectorExpressions]].
 *
 * Top-level Scala objects compile their methods to JVM static forwarders,
 * so whole-stage-codegen'd Java can call them directly (the same pattern
 * Spark's own generated code uses for `DateTimeUtils` etc.): the row
 * pipeline stays inside WholeStageCodegen — no interpreted expression
 * tree, no per-row boxing — and the loop body is one JIT-compiled method
 * shared by the interpreted (`nullSafeEval`) and generated paths.
 */
object HashKernels {

  private def mix(z0: Long): Long = {
    var z = z0 * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL; z ^= (z >>> 31)
    z
  }

  /** Intersection size of two SORTED DISTINCT long arrays (the
    * [[hashedShingles]] output contract): one allocation-free merge pass.
    * The Jaccard verify only needs |a∩b| — |a∪b| = |a|+|b|-|a∩b| for
    * sets — so the per-pair hash-set builds and output arrays of
    * `array_intersect` + `array_union` were pure overhead on the
    * hottest dedup path (the verify stage dominated the incremental
    * probe: 4.4 s of 4.3 s total at sf0.1 before this kernel). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** See [[HashExpressions.HashedShingles]]: sorted distinct k-shingle
    * hashes of a token array, one pass, no string building. */
  def hashedShingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) {
      tok(i) = if (arr.isNullAt(i)) 0L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val m = if (n <= k) 1 else n - k + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h = h * 31L + tok(j); j += 1 }
      out(i) = mix(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted hashes
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, { nh =>
      ((0 until nh).map(HashExpressions.permCoeffs(_)._1).toArray,
       (0 until nh).map(HashExpressions.permCoeffs(_)._2).toArray)
    })

  /** See [[HashExpressions.MinHashSignature]]: `numHashes` running minima
    * in one pass over the (string or pre-hashed long) shingle array.
    *
    * Each permutation is `xxhash64(a_j * h + b_j)`: the affine map alone
    * (`a_j * h + b_j`, no wraparound — 32-bit base × 31-bit multiplier
    * stays inside a signed long) is ORDER-PRESERVING in `h`, so all
    * `numHashes` "permutations" shared one ordering (the globally
    * smallest base hash won every slot) and the signature collapsed to
    * ~1 effective permutation — a 0.99-Jaccard pair could disagree on
    * all 32 slots whenever the one differing shingle held the min base
    * hash (observed on sf0.1: 9 of 256 true pairs missed at every
    * banding). The xxhash64 finalizer breaks the monotonicity, giving
    * each slot an independent ordering — the property banding math
    * assumes. Same seed-42 xxhash64 as the builtin, so the
    * Column-composed form (`Dedup.minhashSignature`) stays in lockstep. */
  def minhashSignature(arr: ArrayData, numHashes: Int, elementIsString: Boolean): ArrayData = {
    val (coeffA, coeffB) = coeffs(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val raw =
          if (elementIsString)
            XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          else arr.getLong(i)
        val h = raw & 0xFFFFFFFFL // 32-bit base: products fit a long (ANSI-safe)
        var j = 0
        while (j < numHashes) {
          val v = XXH64.hashLong(h * coeffA(j) + coeffB(j), 42L)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** See [[HashExpressions.SimHash64]]: hash each token once, tally the 64
    * bit positions, majority-vote. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Static kernels for [[TextExpressions]] — same rationale as
  * [[HashKernels]]: the Column-composed forms walk the token array once
  * per profile through the expression interpreter; these score all
  * profiles in one pass per row. */
object TextKernels {

  import org.apache.spark.unsafe.types.UTF8String

  private def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Profiles in ascending lang-tag order (argmax tie resolves to the
    * lexicographically GREATEST tag, matching the struct-max form). */
  private val langTags: Array[UTF8String] =
    TextFunctions.LangProfiles.keys.toArray.sorted.map(UTF8String.fromString)
  private val langSets: Array[java.util.HashSet[UTF8String]] =
    TextFunctions.LangProfiles.toSeq.sortBy(_._1).map(p => toSet(p._2)).toArray
  private val und = UTF8String.fromString("und")

  /** Best-scoring language tag over the token array ("und" when nothing
    * matches): every profile scored in ONE pass over the tokens. */
  def langId(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val scores = new Array[Int](langSets.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var p = 0
        while (p < langSets.length) {
          if (langSets(p).contains(t)) scores(p) += 1
          p += 1
        }
      }
      i += 1
    }
    var best = 0
    var p = 1
    while (p < scores.length) {
      if (scores(p) >= scores(best)) best = p // later tag wins ties (asc order)
      p += 1
    }
    if (scores(best) > 0) langTags(best) else und
  }

  private val stopwords = toSet(TextFunctions.EnglishStopwords)

  /** Number of tokens (with multiplicity) that are English stopwords. */
  def stopwordHits(arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && stopwords.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }
}

/** Static kernels for [[VectorExpressions]] — same rationale as
  * [[HashKernels]]. */
object VectorKernels {

  /** See [[VectorExpressions.CosineSimilarity]]: dot, |a|, |b| in one pass
    * over float arrays; 0.0 when either norm is 0. */
  def cosineSimilarity(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    if (d == 0.0) 0.0 else dot / d
  }

  /** See [[VectorExpressions.SignLshBucket]]: `planes` hyperplane
    * projections accumulated in one pass, one sign bit each. */
  def signLshBucket(v: ArrayData, planes: Int, planeOffset: Int): Long = {
    val n = v.numElements()
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val xi = v.getFloat(i).toDouble
      var p = 0
      while (p < planes) {
        proj(p) += xi * VectorExpressions.planeComponent(planeOffset + p, i)
        p += 1
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0) out |= (1L << p)
      p += 1
    }
    out
  }
}
