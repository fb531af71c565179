package graft.tools

import graft.queries.Catalog
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of the named catalog queries —
  * `runMain graft.tools.PlanPeek <sfDir> <query> [query...]`. The fast way
  * to iterate a plan pin without spinning a test cycle. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"===== $q")
      println(Catalog.queries(q)(spark, args(0))
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
