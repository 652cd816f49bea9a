package graft.tools
import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke check: SparkEntry.entry at
  * sf0.001 must return rows.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY-ROWS $n")
    spark.stop()
  }
}
