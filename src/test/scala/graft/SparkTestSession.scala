package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites reuse it via
  * getOrCreate — Spark allows a single context per JVM). */
object SparkTestSession {
  def apply(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // match Verify/Bench: open-cost floor below the fixtures' row-
      // group size so split planning can use the row groups
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
