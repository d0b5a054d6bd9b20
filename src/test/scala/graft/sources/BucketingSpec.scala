package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val o = Tables.load(spark, TestSpark.Sf0001, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", numBuckets = 8)
    Bucketing.writeBucketed(o, "o_bkt", "l_orderkey", numBuckets = 8)

    // pin the planner so the assertion is about bucketing, not AQE or
    // broadcast: no adaptive re-plan, no broadcast fallback.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val joined = Bucketing.coLocatedJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
      assert(Bucketing.shuffleCount(joined) == 0,
        s"expected shuffle-free plan:\n${joined.queryExecution.executedPlan}")

      // and it computes the same thing as the plain join
      val expect = li.join(o, "l_orderkey").count()
      assert(joined.count() == expect)

      // counter-example: joining a bucketed with an unbucketed side shuffles
      val mixed = spark.table("li_bkt")
        .join(o.repartition(7, col("l_orderkey")), "l_orderkey")
      assert(Bucketing.shuffleCount(mixed) > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
