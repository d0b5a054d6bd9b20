package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only plan-inspection main: dumps explain(formatted) for selected
  * queries so pushdown/broadcast/codegen can be reviewed offline. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val names = if (args.length > 2) args(2).split(",").toSeq
      else Seq("cdc_snapshot_window", "cdc_current_state_agg", "q1_agg",
        "q_join_revenue", "q_join_semi", "q_topk_orders",
        "dedup_minhash_pairs", "sim_topk_brute", "text_langid")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      sb.append(s"\n=================== $n ===================\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
