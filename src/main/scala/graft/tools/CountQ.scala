package graft.tools
object CountQ {
  def main(args: Array[String]): Unit = {
    println(s"queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
    val rowsOnly = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    println(s"rows-only=${rowsOnly.size}: ${rowsOnly.toSeq.sorted.mkString(",")}")
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    println(s"oracle-without-query=${orphans.size}")
  }
}
