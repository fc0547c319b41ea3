package graft.exec

import java.nio.file.{Files, Paths}
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec
import graft.exec.QueryExecutionManager.Status

class QueryExecutionManagerSpec extends SparkSpec {

  test("submit → SUCCEEDED with csv + metadata artifacts and results") {
    val dir = Files.createTempDirectory("graft_results").toString
    val mgr = new QueryExecutionManager(spark, dir)
    graft.core.Tables.registerAll(spark, sf)
    val id = mgr.submit("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    val st = mgr.await(id)
    assert(st.status == Status.Succeeded, st.reason)
    assert(Files.exists(Paths.get(dir, s"$id.csv")))
    assert(Files.exists(Paths.get(dir, s"$id.csv.metadata")))
    val meta = Files.readString(Paths.get(dir, s"$id.csv.metadata"))
    assert(meta.contains("\"rowCount\":5"))
    val Some((header, rows)) = mgr.results(id)
    assert(header == Seq("r_regionkey", "r_name"))
    assert(rows.length == 5)
    assert(rows.forall(_.forall(_.isDefined)))
    assert(rows.map(_(1).get).contains("AFRICA"))
  }

  test("bad SQL → FAILED with a reason (StateChangeReason shape)") {
    val dir = Files.createTempDirectory("graft_results_f").toString
    val mgr = new QueryExecutionManager(spark, dir)
    val id = mgr.submit("SELECT * FROM nonexistent_table_xyz")
    val st = mgr.await(id)
    assert(st.status == Status.Failed)
    assert(st.reason.exists(_.nonEmpty))
    assert(mgr.results(id).isEmpty)
  }

  test("retention deletes only artifacts older than the TTL") {
    val dir = Files.createTempDirectory("graft_results_r").toString
    val old = Paths.get(dir, "old.csv")
    val fresh = Paths.get(dir, "fresh.csv")
    Files.createDirectory(old)
    Files.writeString(old.resolve("part-0.csv"), "a\n1")
    Files.createDirectory(fresh)
    val eightDaysMs = 8L * 24 * 3600 * 1000
    Files.setLastModifiedTime(old,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - eightDaysMs))
    val deleted = Retention.cleanup(dir, maxAgeDays = 7)
    assert(deleted == Seq("old.csv"))
    assert(!Files.exists(old) && Files.exists(fresh))
  }
}
