package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints the ReadSchema/PushedFilters lines of key query plans — the
  * column-pruning / filter-pushdown audit for the 100 TB scan paths. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"=== $name ===")
      df.queryExecution.sparkPlan.collectLeaves().foreach {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          println("scan " + s.metadata.getOrElse("Location", "").split("/").lastOption.getOrElse(""))
          println("  ReadSchema: " + s.requiredSchema.simpleString.take(200))
          println("  PushedFilters: " + s.metadata.getOrElse("PushedFilters", ""))
        case other => println("leaf: " + other.nodeName)
      }
    }
    audit("q17_transition_counts", graft.queries.Analytics3.queries("q17_transition_counts")(spark, dir))
    audit("q25_person_profiles", graft.queries.Analytics4.queries("q25_person_profiles")(spark, dir))
    audit("q28_simhash_md5", graft.queries.Analytics4.queries("q28_simhash_md5")(spark, dir))
    audit("q19_drift_report", graft.queries.Analytics3.queries("q19_drift_report")(spark, dir))
    spark.stop()
  }
}
