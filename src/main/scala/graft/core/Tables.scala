package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (`TESTDATA.md`): a
  * TPC-H-ish star schema plus `events` (append log), `documents` (text
  * corpus) and `embeddings` (vector table). One parquet file per table.
  *
  * Centralizing the read path means a future move to a partitioned /
  * bucketed layout (the 100 TB posture: fact tables bucketed by join key
  * so repeated joins skip the shuffle) only touches this object, not the
  * ~30 query entry points.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.parquet`'s `ts` physical type is whatever the driver's
    * generator emitted for the round — TIMESTAMP(NANOS) through round 7
    * (which Spark's vectorized reader rejects outright,
    * PARQUET_TYPE_ILLEGAL — read as raw longs and truncate: integer
    * `div`, exactly DuckDB's TIMESTAMP_NS→TIMESTAMP cast), plain
    * TIMESTAMP(MICROS)/NTZ from round 8. Detect from the actual file
    * schema and normalize to micro-precision TimestampType either way,
    * so every consumer is layout-agnostic. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view named exactly like its file, for
    * the SQL entry points (and the dialect-shim demos) that address tables
    * by name — mirrors how the reference addresses the crawler-registered
    * `data_pipeline_db.raw_data` (reference `sql/sample_athena_queries.sql:7`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
