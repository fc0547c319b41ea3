package graft.layout

import graft.SparkSpec

class CompactorSpec extends SparkSpec {

  private def freshDir(name: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit(); d
  }

  test("compaction is row-identical, hits the target count, and leaves no temp dirs") {
    import spark.implicits._
    val root = freshDir("compact")
    val dir = new java.io.File(root, "events").getPath
    // a fragmented directory: 64 files for ~trivial bytes
    val df = (1L to 5000L).map(i => (i, s"v$i", i % 7)).toDF("id", "s", "k")
    df.repartition(64).write.parquet(dir)
    val rowsBefore = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val rep = Compactor.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(rep.compacted && rep.filesBefore == 64 && rep.filesAfter == 1,
      s"expected 64 -> 1, got $rep")
    val rowsAfter = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction must be row-identical")
    // atomicity housekeeping: no .tmp/.old generations survive
    val siblings = Option(new java.io.File(dir).getParentFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(siblings == Set("events"), s"leftover generations: $siblings")
    // second run is a reported no-op — the layout is already at target
    val rep2 = Compactor.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(!rep2.compacted && rep2.filesBefore == 1)
  }

  test("survey flags exactly the fragmented leaves of a partitioned tree") {
    import spark.implicits._
    val root = freshDir("survey")
    val frag = new java.io.File(root, "day=1").getPath
    val fine = new java.io.File(root, "day=2").getPath
    (1L to 100L).toDF("id").repartition(16).write.parquet(frag)
    (1L to 100L).toDF("id").repartition(1).write.parquet(fine)
    val rows = Compactor.survey(spark, root.getPath, targetBytes = Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.length == 2)
    val byDir = rows.map(r => new java.io.File(r._1).getName -> (r._2, r._3)).toMap
    assert(byDir("day=1") == ((16L, true)), s"fragmented leaf must flag: $byDir")
    assert(byDir("day=2") == ((1L, false)), s"compact leaf must not flag: $byDir")
  }
}
