package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted count equals plain count on a skewed key distribution") {
    // hot key 0 carries 90% of rows
    val df = (1 to 1000).map(i => (if (i <= 900) 0L else i.toLong % 7, i.toLong))
      .toDF("k", "payload")
    val plain = df.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(df, "k", salts = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
    // and the partial stage really spreads the hot key
    val spread = df.withColumn("s", Skew.salt(8, col("payload")))
      .filter(col("k") === 0).select("s").distinct().count()
    assert(spread > 1)
  }

  test("salted join equals plain join") {
    val left = (1 to 500).map(i => (if (i <= 450) 1L else 2L, i)).toDF("k", "v")
    val right = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
