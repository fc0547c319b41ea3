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
      partitions: Long,
      typeChangedColumns: Seq[String] = Nil)

  /** Infer the schema of the partitioned CSV tree (header + inferSchema —
    * the crawler equivalent; data columns only, partition columns are
    * discovered from the directory layout). */
  def inferSchema(spark: SparkSession, root: String): StructType =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(root)
      .schema

  private def createTable(
      spark: SparkSession, fq: String, root: String, schema: StructType): Unit = {
    val partitionCols = graft.sources.UserSchemas.partitionCols
    val dataCols = schema.fields.filterNot(f => partitionCols.contains(f.name))
    val colDdl = dataCols.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partDdl = schema.fields
      .filter(f => partitionCols.contains(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(
      s"""CREATE TABLE $fq ($colDdl ${if (partDdl.nonEmpty) s", $partDdl" else ""})
         |USING CSV
         |OPTIONS (header 'true', path '$root')
         |${if (partDdl.nonEmpty) s"PARTITIONED BY (${partitionCols.mkString(", ")})" else ""}
         |""".stripMargin)
  }

  /** Crawl: infer, create-or-evolve, recover partitions. Evolution policy
    * mirrors the reference crawler (`data_pipeline_stack.py:119-122`):
    * UPDATE_IN_DATABASE — new columns are added AND changed column types
    * are updated on re-crawl; delete behavior LOG — removed columns are
    * reported but never dropped (they stay in the catalog at their last
    * known type). */
  def crawl(spark: SparkSession, root: String, db: String, table: String): CrawlResult = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val fq = s"$db.$table"
    val inferred = inferSchema(spark, root)
    val exists = spark.catalog.tableExists(fq)

    if (!exists) {
      createTable(spark, fq, root, inferred)
      val parts = recoverPartitions(spark, fq)
      CrawlResult(fq, created = true, inferred.fieldNames.toSeq, Nil, parts)
    } else {
      val partitionCols = graft.sources.UserSchemas.partitionCols
      val existingSchema = spark.table(fq).schema
      val existingNames = existingSchema.fieldNames.toSet
      val currentNames = inferred.fieldNames.toSet
      val added = (currentNames -- existingNames).toSeq.sorted
      val removed = (existingNames -- currentNames).toSeq.sorted // LOG only, never dropped
      // UPDATE_IN_DATABASE: a column whose inferred type changed on
      // re-crawl (e.g. int → double widening) gets its catalog type
      // updated. Partition columns keep their layout-derived types.
      val changed = existingSchema.fields
        .filterNot(f => partitionCols.contains(f.name))
        .filter(f => inferred.fields.find(_.name == f.name)
          .exists(_.dataType != f.dataType))
        .map(_.name).toSeq.sorted
      if (changed.nonEmpty) {
        // v1 CSV tables can't ALTER a column's type in place — rebuild
        // the catalog entry with the merged schema: updated types,
        // removed columns retained at their old types, new columns
        // appended. Metadata-only: the data tree is untouched.
        val merged = StructType(
          existingSchema.fields.map { f =>
            if (changed.contains(f.name))
              f.copy(dataType = inferred.fields.find(_.name == f.name).get.dataType)
            else f
          } ++
          added.map(n => inferred.fields.find(_.name == n).get))
        // v1 catalogs have no REPLACE TABLE: the drop+create pair is not
        // atomic, so restore the previous entry if the re-create fails
        // (a transactional metastore would make this a single swap)
        spark.sql(s"DROP TABLE $fq")
        try createTable(spark, fq, root, merged)
        catch {
          case e: Exception =>
            // original error wins, but a failed restore means the table
            // entry is GONE — log it loudly so the loss is diagnosable
            try createTable(spark, fq, root, existingSchema)
            catch {
              case restore: Exception =>
                org.slf4j.LoggerFactory.getLogger(getClass).error(
                  s"restore of $fq after failed type-change re-create also " +
                    s"failed — catalog entry lost, re-crawl to recreate", restore)
            }
            throw e
        }
      } else if (added.nonEmpty) {
        val ddl = added
          .map(n => inferred.fields.find(_.name == n).get)
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"ALTER TABLE $fq ADD COLUMNS ($ddl)")
      }
      val parts = recoverPartitions(spark, fq)
      CrawlResult(fq, created = false, added, removed, parts, changed)
    }
  }

  /** Partition discovery — `MSCK REPAIR TABLE` equivalent. */
  def recoverPartitions(spark: SparkSession, fqTable: String): Long = {
    spark.sql(s"MSCK REPAIR TABLE $fqTable")
    spark.sql(s"SHOW PARTITIONS $fqTable").count()
  }
}
