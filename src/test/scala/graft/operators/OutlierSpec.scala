package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutlierSpec extends SparkSpec {

  test("q192 covers every embedded vector exactly once") {
    val out = Outlier.q192EmbeddingOutliers(spark, sf)
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
  }

  test("a planted negated vector is the outlier; aligned vectors are not") {
    import spark.implicits._
    // five near-identical vectors and one pointing the opposite way:
    // the Σ-vector centroid still points with the majority, so the
    // negated vector's centroid cosine is deeply negative
    val base = Array(1.0f, 0.5f, 0.25f, 0.125f)
    val rows = (0L to 4L).map { i =>
      (i, base.map(x => x + 0.01f * i), "s")
    } :+ (5L, base.map(x => -x), "s")
    val emb = rows.toDF("vec_id", "embedding", "source")
    val got = Outlier.scoresOver(
        emb.select("vec_id", "embedding"),
        emb.select(col("vec_id"), col("source")))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(5L)._2, "the negated vector must be flagged")
    assert(got(5L)._1 < -500000L, "and sit deeply negative")
    (0L to 4L).foreach { i =>
      assert(!got(i)._2, s"aligned vector $i must not be flagged")
      assert(got(i)._1 > 900000L)
    }
  }

  test("a single-vector source scores cosine 1 against itself") {
    import spark.implicits._
    val emb = Seq((7L, Array(0.3f, -0.4f, 0.5f), "solo"))
      .toDF("vec_id", "embedding", "source")
    val got = Outlier.scoresOver(
        emb.select("vec_id", "embedding"),
        emb.select(col("vec_id"), col("source")))
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(2) == 1000000L)
    assert(!got(0).getBoolean(3))
  }

  test("the audit equals a driver replay of quantize, sum and score") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val src = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ha(y: Double): Long =
      if (y >= 0) math.floor(y + 0.5).toLong else -math.floor(-y + 0.5).toLong
    val qv = emb.map { case (id, v) =>
      val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      id -> v.map(x => ha(1000.0 * x / nrm))
    }
    val cent = qv.toSeq.groupBy(x => src(x._1)).map { case (s, xs) =>
      s -> xs.map(_._2).transpose.map(_.sum).toArray
    }
    def dotd(a: Seq[Long], b: Seq[Long]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val expect = qv.map { case (id, q) =>
      val c = cent(src(id)).toSeq
      id -> ha(1e6 * dotd(q.toSeq, c) / math.sqrt(dotd(q.toSeq, q.toSeq) * dotd(c, c)))
    }
    val got = Outlier.q192EmbeddingOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("the scoring pass never shuffles corpus-sized rows: centroid side broadcast") {
    val df = Outlier.q192EmbeddingOutliers(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the |sources|-row centroid table must broadcast —\n$plan")
  }
}
