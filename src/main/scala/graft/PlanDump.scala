package graft

import org.apache.spark.sql.SparkSession

/** Scratch: dump one query's executed plan (builder-side dev aid). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(s, args(1))
    println("PLANSTART")
    println(df.queryExecution.executedPlan.toString)
    println("PLANEND")
  }
}
