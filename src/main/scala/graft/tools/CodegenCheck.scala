package graft.tools
import org.apache.spark.sql.SparkSession

/** Builder-side probe: run the custom eval kernels under whole-stage
  * codegen with `spark.sql.codegen.fallback=false`, so a doGenCode that
  * fails to compile ABORTS instead of silently degrading to the
  * interpreted path (the default fallback makes a broken codegen
  * invisible to ordinary tests). A `*(n)` prefix on the printed plan
  * line proves the generated stage compiled and executed.
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val df = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("split(trim(text), ' ') AS w")
      .selectExpr("clipped_ngram_overlaps(w, slice(w, 2, 50), 4) AS m",
        "lcs_length(w, slice(w, 2, 50)) AS l")
    val n = df.count()
    val first = df.head()
    println(s"CODEGEN-OK rows=$n first_m=${first.get(0)} first_l=${first.get(1)}")
    println("PLAN " + df.queryExecution.executedPlan.toString.linesIterator
      .take(2).mkString(" | "))
  }
}
