package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The runnable end-to-end curation job (round-11 verdict item 3): the
  * command a user of the engine actually executes over a corpus tree —
  * build the per-document lineage ledger, export the curated corpus as
  * content-hash shards, and write + print the per-stage manifest.
  *
  * {{{
  *   sbt "runMain graft.jobs.CurationPipeline /root/testdata/sf0.01 /tmp/curated"
  * }}}
  *
  * Output layout:
  *   <out>/corpus/shard=K/   curated docs (doc_id, source, text,
  *                           n_tokens, n_copies) — q128's shard draw
  *   <out>/ledger/           the full per-doc lineage ledger
  *   <out>/manifest/         the 8-row stage manifest (also printed)
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/graft-curated"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-curation-pipeline")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, dir, out)
    spark.stop()
  }

  /** The job body over an existing session (spec-drivable). */
  def run(spark: SparkSession, dir: String, out: String): Unit = {
    // one materialization of the ledger feeds the corpus export, the
    // ledger dump and the manifest aggregation (the q175 lesson)
    val led = graft.core.Materialize.once(
      graft.operators.Curation.ledger(spark, dir))

    led.filter(col("alive5") && col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("text"),
        col("n_tok").as("n_tokens"), col("n_copies"),
        (conv(substring(md5(trim(col("text"))), 15, 4), 16, 10).cast("long")
          % graft.operators.Sampling.ExportShards).as("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/corpus")

    led.write.mode("overwrite").parquet(s"$out/ledger")

    val manifest = graft.operators.Curation.manifestOver(led)
    manifest.write.mode("overwrite").parquet(s"$out/manifest")
    manifest.collect().foreach { r =>
      println(s"[curation] stage ${r.getLong(0)} ${r.getString(1)} " +
        s"(${r.getString(2)}): in=${r.getLong(3)} out=${r.getLong(4)} " +
        s"tokens ${r.getLong(5)} -> ${r.getLong(6)}, " +
        s"dropped=${r.getLong(7)}${
          if (r.getString(8).nonEmpty) s" (${r.getString(8)})" else ""}")
    }
    println(s"[curation] wrote $out/{corpus,ledger,manifest}")
  }
}
