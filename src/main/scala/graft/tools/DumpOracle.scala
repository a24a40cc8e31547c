package graft.tools

/** Dev utility: print the DuckDB oracle SQL for the named queries (all
  * names if no args) — for iterating on an oracle in DuckDB directly
  * before running the full Verify/selfcheck cycle. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.oracleSql.keys.toSeq.sorted
    names.foreach { n =>
      graft.SparkEntry.oracleSql.get(n) match {
        case Some(sql) => println(s"-- $n\n$sql\n")
        case None      => System.err.println(s"[dump-oracle] no oracle for $n")
      }
    }
  }
}
