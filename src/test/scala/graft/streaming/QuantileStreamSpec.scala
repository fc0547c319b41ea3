package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.functions.QuantileSketchAgg

class QuantileStreamSpec extends SparkSpec {

  private def state(v: Option[Array[Byte]]) = TestGroupState.create[Array[Byte]](
    optionalState = v.map(org.apache.spark.api.java.Optional.of[Array[Byte]])
      .getOrElse(org.apache.spark.api.java.Optional.empty[Array[Byte]]()),
    timeoutConf = GroupStateTimeout.NoTimeout,
    batchProcessingTimeMs = 0L,
    eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
    hasTimedOut = false)

  test("sketchUpdate folds batches through serialized state; versions are monotone") {
    val s1 = state(None)
    val out1 = QuantileStream.sketchUpdate("click",
      (1L to 300L).iterator.map(QuantileStream.EvRow("click", _)), s1).toSeq
    assert(out1.length == 1 && out1.head.version == 300L)
    val s2 = state(Some(s1.get))
    val out2 = QuantileStream.sketchUpdate("click",
      (301L to 600L).iterator.map(QuantileStream.EvRow("click", _)), s2).toSeq
    assert(out2.head.version == 600L)
    // the folded state answers like a sketch built in one shot: both
    // obey the rank budget over the union stream
    val direct = new QuantileSketchAgg.State()
    (1L to 600L).foreach(direct.insert)
    val folded = QuantileSketchAgg.State.fromBytes(s2.get)
    Seq(50, 90, 99).foreach { p =>
      val n = 600L
      def err(est: Long): Long = {
        val target = math.max(1L, (n * p + 99L) / 100L)
        math.max(0L, math.max(est - target, target - est)) // values ARE ranks here
      }
      assert(err(folded.quantile(p)) <= n / 20 + 1, s"folded p$p")
      assert(err(direct.quantile(p)) <= n / 20 + 1, s"direct p$p")
    }
    // an empty batch emits nothing but keeps state
    val s3 = state(Some(s2.get))
    assert(QuantileStream.sketchUpdate("click", Iterator.empty, s3).isEmpty)
  }

  test("q183: streamed estimates clear the batch-recounted rank budget") {
    val rows = QuantileStream.q183StreamQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      Seq(3, 5, 7).foreach(i => assert(r.getBoolean(i), s"verdict col $i for ${r.getString(0)}"))
    }
    // same facts as the batch gate (shared oracle): exact columns agree
    val batch = graft.operators.QuantileSketch.q182QuantileSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6))).toMap
    rows.foreach { r =>
      assert(batch(r.getString(0)) ==
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6))))
    }
  }
}
