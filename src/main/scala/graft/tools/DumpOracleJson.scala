package graft.tools

import java.nio.file.{Files, Paths}

/** Writes the FULL oracle_sql.json to the given path without running
  * any queries — for re-timing or re-checking oracles against an
  * existing Verify output directory whose json a filtered run
  * overwrote. */
object DumpOracleJson {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${graft.Bench.jsonStr(k)}: ${graft.Bench.jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"[dump-oracle-json] ${graft.SparkEntry.oracleSql.size} oracles -> $out")
  }
}
