package graft.tools
object QCount {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QCOUNT=${q.size} ORACLE=${o.size}")
    println("MISSING_ORACLE=" + (q -- o).toList.sorted.mkString(","))
    println("ORPHAN_ORACLE=" + (o -- q).toList.sorted.mkString(","))
  }
}
