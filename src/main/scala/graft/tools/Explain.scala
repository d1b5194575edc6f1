package graft.tools

/** Dev harness: print the executed plan of a named SparkEntry query.
  * Usage: sbt "runMain graft.tools.Explain <query> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.local("8")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name optimized ===")
    println(df.queryExecution.optimizedPlan.treeString.take(8000))
    println(s"=== $name executed ===")
    println(df.queryExecution.executedPlan.treeString.take(8000))
    val p = df.queryExecution.executedPlan.toString
    println(s"[explain] exchanges=${"Exchange".r.findAllIn(p).size} " +
      s"splits=${"split\\(".r.findAllIn(p).size} " +
      s"wscg=${"WholeStageCodegen".r.findAllIn(p).size}")
    spark.stop()
  }
}
