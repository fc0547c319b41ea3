package graft.exec

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.ExtractJob

class ObjectStoreSpec extends SparkSpec {

  test("lists the raw-data tree with sizes, prefix filter, and pagination") {
    val root = Files.createTempDirectory("graft_objects").toString
    val r = ExtractJob.run(spark, root, fetcher = _ => Right(graft.jobs.PipelineDemo.FixtureBody))
    assert(r.statusCode == 200)

    val all = ObjectStore.list(spark, root)
    assert(all.objects.nonEmpty)
    assert(all.objects.forall(o => o.size > 0 || o.key.endsWith("_SUCCESS")))
    assert(all.objects.map(_.key) == all.objects.map(_.key).sorted)
    // the partitioned layout is visible in the keys (year=/month=/day=)
    assert(all.objects.exists(_.key.matches("year=\\d{4}/month=\\d{2}/day=\\d{2}/.*\\.csv")))

    // prefix filter — the check_s3_data shape (list raw-data/ only)
    val year = java.time.Year.now().toString
    val pruned = ObjectStore.list(spark, root, prefix = s"year=$year/")
    assert(pruned.objects.nonEmpty)
    assert(pruned.objects.forall(_.key.startsWith(s"year=$year/")))

    // pagination: maxKeys=1 pages walk every object exactly once, in order
    var token: Option[String] = None
    val walked = Seq.newBuilder[String]
    var pages = 0
    var done = false
    while (!done && pages < 100) {
      val page = ObjectStore.list(spark, root, maxKeys = 1, continuationToken = token)
      walked ++= page.objects.map(_.key)
      token = page.nextToken
      pages += 1
      done = token.isEmpty
    }
    assert(walked.result() == all.objects.map(_.key))
  }

  test("missing root lists empty, not an error") {
    val l = ObjectStore.list(spark, "/tmp/graft_does_not_exist_xyz")
    assert(l.objects.isEmpty && l.nextToken.isEmpty)
  }
}
