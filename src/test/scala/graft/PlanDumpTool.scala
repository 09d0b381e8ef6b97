package graft

/** Dev-loop scratch main: print the formatted physical plan of one query.
  * Usage: Test/runMain graft.PlanDumpTool <query> [sfDir] */
object PlanDumpTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession()
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    SparkEntry.queries(args(0))(spark, d).explain("formatted")
  }
}
