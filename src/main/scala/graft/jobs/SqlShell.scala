package graft.jobs

import graft.core.{Sessions, Tables}

/** Ad-hoc SQL entry point: the Athena-console role (reference
  * `README.md:107-144` — "run these queries in the Athena console"),
  * pointed at the synthetic tables.
  *
  * Usage: runMain graft.jobs.SqlShell <sfDir> "<sql>" [maxRows]
  * Registers every table in <sfDir> as a view plus the graft dialect
  * functions (strpos, string_agg, cosine_sim, simhash_agg), runs the
  * statement, prints up to maxRows (default 20).
  */
object SqlShell {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SqlShell <sfDir> <sql> [maxRows]")
    val (dir, sql) = (args(0), args(1))
    val maxRows = if (args.length > 2) args(2).toInt else 20
    val spark = Sessions.local("graft-sql", 8)
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, dir)
    try {
      spark.sql(sql).show(maxRows, truncate = false)
    } catch {
      case e: Exception =>
        System.err.println(s"[sql-error] ${e.getMessage}")
        sys.exit(1)
    }
    spark.stop()
  }
}
