package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** §2.H — JDBC sink/source: the reference's storage layer IS a JDBC
  * database (etl_job.py:139-166: CREATE TABLE + INSERT into Postgres
  * via psycopg2; etl_job.py:224-274: check-then-insert upsert).
  *
  * Spark's JDBC relation shards the work across executors — one
  * connection per partition with batched statements on write,
  * predicate-pushed partitioned reads — so the same calls land one
  * row or a 100 TB backfill. `numPartitions` on the writer bounds
  * connection fan-in to what the database can take. Specs run
  * against Derby embedded in-memory (the JDBC driver shipped with
  * Spark); swapping the URL/driver for Postgres is configuration,
  * not code.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            driver: String = DerbyDriver): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .mode(mode).save()

  def read(spark: SparkSession, url: String, table: String,
           driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Existence probe via JDBC catalog metadata — NOT a catch-around
    * the read: a transient read failure must fail the upsert, or a
    * retry would treat the table as absent and double-insert. */
  private def tableExists(url: String, table: String, driver: String): Boolean = {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.getMetaData.getTables(null, null, table.toUpperCase, null).next()
    finally conn.close()
  }

  /** The reference's check-then-insert against a JDBC table: read
    * ONLY the key columns back (column pruning pushes into the SELECT
    * list), anti-join, append the survivors. Returns inserted count;
    * a re-run of the same batch inserts zero. */
  def upsertByKey(spark: SparkSession, batch: DataFrame, url: String,
                  table: String, keyCols: Seq[String],
                  driver: String = DerbyDriver): Long = {
    val existing: DataFrame =
      if (tableExists(url, table, driver))
        read(spark, url, table, driver).select(keyCols.map(col): _*).distinct()
      else batch.select(keyCols.map(col): _*).limit(0)
    val fresh = batch.join(existing, keyCols, "left_anti").transform(graft.Checkpoints.eager)
    val n = fresh.count()
    if (n > 0) write(fresh, url, table, SaveMode.Append, driver)
    n
  }
}
