package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The runnable curation job end-to-end: outputs exist, the written
  * manifest equals the q228 query row-for-row, and the exported corpus
  * reconciles with the ledger's kept set. */
class CurationPipelineJobSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_curation_job").toString
    CurationPipeline.run(spark, sf, dir)
    dir
  }

  test("the job writes corpus, ledger and manifest") {
    Seq("corpus", "ledger", "manifest").foreach { d =>
      assert(new java.io.File(s"$out/$d").isDirectory, s"$d missing")
    }
  }

  test("the written manifest equals the q228 query") {
    val written = spark.read.parquet(s"$out/manifest")
      .orderBy("stage_ord").collect().map(_.toSeq).toSeq
    val query = graft.operators.Curation.q228CurationManifest(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(written == query)
  }

  test("the exported corpus is exactly the ledger's kept multiset") {
    val corpus = spark.read.parquet(s"$out/corpus")
    val ledger = spark.read.parquet(s"$out/ledger")
    val kept = ledger.filter(col("alive5") && col("n_copies") > 0)
    assert(corpus.count() == kept.count())
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // shard dirs within the configured fan-out, every doc carrying >=1 copy
    assert(corpus.select("shard").distinct().count()
      <= graft.operators.Sampling.ExportShards)
    assert(corpus.filter(col("n_copies") < 1).count() == 0)
  }
}
