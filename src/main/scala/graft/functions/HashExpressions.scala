package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the dedup hot loops.
 *
 * The builtin-composed forms (`Dedup.minhashSignature`, `simhash64`) work,
 * but higher-order-function lambdas are interpreted per element per
 * permutation: a 32-hash signature walks the shingle array 32 times
 * through the expression interpreter. These expressions do the whole
 * computation in ONE pass with a tight JVM loop — the (b) tier of the
 * custom-operator preference order (compose builtins < custom Expression
 * < custom physical operator).
 *
 * Hash function: the same xxhash64(seed=42) as Spark's `xxhash64` builtin
 * (`XxHash64Function`), so results are interchangeable with the
 * Column-composed variants.
 */
object HashExpressions {

  /** splitmix64-derived (31-bit odd multiplier, 31-bit offset) pairs —
    * identical constants to Dedup.permCoeffs so both impls agree. */
  private[graft] def permCoeffs(i: Int): (Long, Long) = {
    var z = (i.toLong + 0x9E3779B97F4A7C15L) * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL; z ^= (z >>> 31)
    ((z & 0x7FFFFFFFL) | 1L, (z >>> 33) & 0x7FFFFFFFL)
  }

  /**
   * Hashed word k-shingles of an array<string> of tokens, in one pass and
   * with NO string building: each token is hashed once, then each k-gram's
   * hash is a splitmix-finalized polynomial combine of its token hashes.
   * Output is the sorted DISTINCT shingle-hash set — the unit for both
   * MinHash signatures and exact Jaccard verification.
   */
  case class HashedShingles(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hashed_shingles"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireArrayOf(prettyName, child.dataType, StringType),
      ExprChecks.requireParam(prettyName, k >= 1, s"shingle size k must be >= 1, got $k"))

    override def nullSafeEval(input: Any): Any =
      HashKernels.hashedShingles(input.asInstanceOf[ArrayData], k)

    // Static-call codegen: keeps the stage inside WholeStageCodegen while
    // the loop runs as one JIT-compiled kernel method.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashKernels.hashedShingles($c, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature in one pass over an array of shingles — either
    * array<string> (hashed here) or array<long> (pre-hashed, e.g. from
    * [[HashedShingles]]): update `numHashes` running minima per element. */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireArrayOf(prettyName, child.dataType, StringType, LongType),
      ExprChecks.requireParam(prettyName, numHashes >= 1,
        s"numHashes must be >= 1, got $numHashes"))

    private lazy val elementIsString: Boolean = child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }

    override def nullSafeEval(input: Any): Any =
      HashKernels.minhashSignature(
        input.asInstanceOf[ArrayData], numHashes, elementIsString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashKernels.minhashSignature($c, $numHashes, $elementIsString)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of an array<string> of tokens in one pass: hash each
    * token once, tally all 64 bit positions, majority-vote the result. */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def checkInputDataTypes(): TypeCheckResult =
      ExprChecks.requireArrayOf(prettyName, child.dataType, StringType)

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(HashKernels.simhash64(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** |a ∩ b| of two SORTED DISTINCT array<long> columns (the
    * [[HashedShingles]] output contract) — one merge pass, no hash-set
    * builds, no output array. The exact-Jaccard verify is the hottest
    * stage of every text-dedup path (it runs once per CANDIDATE pair);
    * with set inputs jaccard = i / (|a| + |b| - i), so `array_intersect`
    * + `array_union` per pair are replaced by this single count. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireArrayOf(prettyName, left.dataType, LongType),
      ExprChecks.requireArrayOf(prettyName, right.dataType, LongType))

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.valueOf(HashKernels.sortedIntersectCount(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashKernels.sortedIntersectCount($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Bloom-filter membership probe against an EXECUTOR-SHARED filter: the
    * sketch ships once per executor as a Spark broadcast variable and is
    * deserialized once (TorrentBroadcast caches the deserialized object in
    * the local block manager), where a plan-embedded `Literal(bytes)` —
    * the shape Spark's own runtime-filter injection uses, sized there to
    * ≤8 MB — is re-deserialized with the task binary by EVERY task. At
    * the decontamination operating point (~10^8 eval grams → ~120 MB at
    * 1% fpp) the per-task literal cost dominates the probe, so this
    * expression is the Literal shape's big-filter sibling: same codegen'd
    * per-row `mightContainLong`, broadcast-variable delivery. The
    * deserialized filter is cached in a codegen mutable slot / transient
    * lazy val, so the per-row cost is one array index + two hashes. */
  case class BloomMightContain(
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireType(prettyName, child.dataType, LongType),
      ExprChecks.requireParam(prettyName, bloom != null,
        "broadcast bloom filter must not be null"))

    @transient private lazy val filter = bloom.value

    override def nullSafeEval(input: Any): Any =
      java.lang.Boolean.valueOf(
        filter.mightContainLong(input.asInstanceOf[Long]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bloomBc", bloom,
        "org.apache.spark.broadcast.Broadcast")
      // deserialize once per generated-class instance, not per row
      val filterVar = ctx.addMutableState(
        "org.apache.spark.util.sketch.BloomFilter", "bloomFilter",
        v => s"$v = (org.apache.spark.util.sketch.BloomFilter)$bcRef.value();")
      defineCodeGen(ctx, ev, c => s"$filterVar.mightContainLong($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column + SQL surfaces ----------------------------------------

  def bloom_might_contain(
      bloom: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      hash: Column): Column =
    ColumnBridge.column(BloomMightContain(bloom, ColumnBridge.expression(hash)))

  def hashed_shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(tokens), k))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Register both as SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
  }
}
