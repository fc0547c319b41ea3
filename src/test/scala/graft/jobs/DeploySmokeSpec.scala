package graft.jobs

import graft.SparkSpec
import graft.sources.HttpJsonSource

class DeploySmokeSpec extends SparkSpec {

  test("smoke passes on a good deploy: 200 envelope and readable landed data") {
    val root = java.nio.file.Files.createTempDirectory("graft_smoke_ok").toString + "/raw"
    val smoke = DeploySmoke.run(spark, root, _ => Right(PipelineDemo.FixtureBody))
    assert(smoke.ok, smoke.detail)
    assert(smoke.envelope.statusCode == 200)
    assert(smoke.envelope.recordsProcessed == 3)
    assert(smoke.readBack >= 3)
  }

  test("smoke fails loudly when the re-invoked extractor errors") {
    val root = java.nio.file.Files.createTempDirectory("graft_smoke_f").toString + "/raw"
    val failing: HttpJsonSource.Fetcher = _ => Left("connect timeout after 30s")
    val smoke = DeploySmoke.run(spark, root, failing)
    assert(!smoke.ok)
    assert(smoke.envelope.statusCode == 500)
    assert(smoke.detail.contains("connect timeout"))
  }

  test("smoke fails on an empty payload even with a 200-shaped envelope") {
    val root = java.nio.file.Files.createTempDirectory("graft_smoke_e").toString + "/raw"
    val smoke = DeploySmoke.run(spark, root, _ => Right("[]"))
    assert(!smoke.ok)
    assert(smoke.detail.contains("zero records"))
  }
}
