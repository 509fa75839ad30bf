package graft.tools

import org.apache.spark.sql.SparkSession
import graft.schema.Fixture
import graft.blocking.Blocking

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Fixture.docs(spark, Fixture.scales("t1")).toDF().cache()
    println("docs=" + docs.count())
    val keys = Blocking.docKeys(docs, Blocking.Cfg())
    println("keys=" + keys.count())
    keys.show(5, false)
    spark.stop()
  }
}
