package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog job (SURVEY §2.1 S6, §3.2): the Glue-crawler role, Spark-native.
  *
  * Reference behavior (`data_pipeline/data_pipeline_stack.py:104-123`):
  * a crawler scans the raw-data tree daily, infers the schema, registers
  * or updates the table, with schema-change policy UPDATE_IN_DATABASE
  * (additive) and delete-behavior LOG (never drop columns).
  *
  * Spark mapping: `inferSchema` read → diff against the catalog →
  * CREATE TABLE or ALTER TABLE ADD COLUMNS → partition recovery
  * (`MSCK REPAIR TABLE`). Column removals are logged, never applied —
  * the table schema is additive, matching the reference policy exactly.
  */
object TableRegistry {

  final case class CrawlResult(
      table: String,
      created: Boolean,
      addedColumns: Seq[String],
      removedColumnsLogged: Seq[String],
      partitions: Long)

  /** Infer the schema of the partitioned CSV tree (header + inferSchema —
    * the crawler equivalent; data columns only, partition columns are
    * discovered from the directory layout). */
  def inferSchema(spark: SparkSession, root: String): StructType =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(root)
      .schema

  /** Crawl: infer, create-or-evolve (additive only), recover partitions. */
  def crawl(spark: SparkSession, root: String, db: String, table: String): CrawlResult = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val fq = s"$db.$table"
    val inferred = inferSchema(spark, root)
    val exists = spark.catalog.tableExists(fq)

    if (!exists) {
      val dataCols = inferred.fields
        .filterNot(f => graft.sources.UserSchemas.partitionCols.contains(f.name))
      val colDdl = dataCols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val partDdl = inferred.fields
        .filter(f => graft.sources.UserSchemas.partitionCols.contains(f.name))
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(
        s"""CREATE TABLE $fq ($colDdl ${if (partDdl.nonEmpty) s", $partDdl" else ""})
           |USING CSV
           |OPTIONS (header 'true', path '$root')
           |${if (partDdl.nonEmpty) s"PARTITIONED BY (${graft.sources.UserSchemas.partitionCols.mkString(", ")})" else ""}
           |""".stripMargin)
      val parts = recoverPartitions(spark, fq)
      CrawlResult(fq, created = true, inferred.fieldNames.toSeq, Nil, parts)
    } else {
      val existing = spark.table(fq).schema.fieldNames.toSet
      val current = inferred.fieldNames.toSet
      val added = (current -- existing).toSeq.sorted
      val removed = (existing -- current).toSeq.sorted // LOG only, never dropped
      if (added.nonEmpty) {
        val ddl = added
          .map(n => inferred.fields.find(_.name == n).get)
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"ALTER TABLE $fq ADD COLUMNS ($ddl)")
      }
      val parts = recoverPartitions(spark, fq)
      CrawlResult(fq, created = false, added, removed, parts)
    }
  }

  /** Partition discovery — `MSCK REPAIR TABLE` equivalent. */
  def recoverPartitions(spark: SparkSession, fqTable: String): Long = {
    spark.sql(s"MSCK REPAIR TABLE $fqTable")
    spark.sql(s"SHOW PARTITIONS $fqTable").count()
  }
}
