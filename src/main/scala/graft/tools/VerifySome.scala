package graft.tools

import graft.SparkEntry
import graft.core.Sessions
import java.nio.file.{Files, Paths}

/** Dev-only: run a SUBSET of SparkEntry.queries against a sf dir and dump
  * result parquet + oracle_sql.json (same layout as Verify) for local
  * DuckDB cross-checks while iterating on oracles.
  *
  * Usage: runMain graft.tools.VerifySome <sfDir> <outDir> <name...>
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "verify-some")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(q => names.isEmpty || names(q._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[verify-some] wrote $name")
      } catch {
        case e: Throwable => println(s"[verify-some] $name FAILED: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
