package graft.streaming

import graft.SparkSpec
import graft.operators.Classify

class ClassifyStreamSpec extends SparkSpec {

  test("streamed NB admission: scores equal batch truncated-model scoring; floor is score >= 0") {
    val out = ClassifyStream.q152StreamNbQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    assert(out.values.forall(_._2 >= 0), "admission floor is score_micro >= 0")
    // batch replay with the SAME truncated model + prior
    val topW = Classify.truncatedModel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val prior = Classify.priorMicroOf(spark, sf)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val batch = docs.map { case (d, t) =>
      val ts = t.split(" ").filter(_.nonEmpty).toSeq
      d -> ((ts.length.toLong, prior + ts.map(topW.getOrElse(_, 0L)).sum))
    }.toMap
    val admitted = batch.filter(_._2._2 >= 0)
    assert(out.keySet == admitted.keySet, "stream admits exactly the batch-positive docs")
    out.foreach { case (d, v) =>
      assert(v == admitted(d), s"doc $d stream $v != batch ${admitted(d)}")
    }
  }

  test("online NB training lands exactly on the batch-trained model") {
    val stream = ClassifyStream.q166StreamNbTrain(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stream.nonEmpty)
    // batch twin from raw text, driver-side (the ClassifySpec replay)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toks = docs.map { case (d, t) => d -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val filler = Classify.FillerTokens.toSet
    val lab = toks.view.mapValues(ts =>
      ts.count(filler) * Classify.FillerMax <= ts.length).toMap
    val cp = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val cn = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    toks.foreach { case (d, ts) =>
      val tgt = if (lab(d)) cp else cn
      ts.foreach(t => tgt(t) += 1)
    }
    val vocab = cp.keySet ++ cn.keySet
    val (tp, tn, v) = (cp.values.sum, cn.values.sum, vocab.size.toLong)
    def micro(x: Double): Long = math.round(math.log(x) / math.log(2) * 1e6)
    val expect = vocab.map { t =>
      t -> ((cp(t), cn(t),
        micro((cp(t) + 1).toDouble / (tp + v)) - micro((cn(t) + 1).toDouble / (tn + v))))
    }.toMap
    assert(stream == expect, "online-trained model must equal the batch model")
  }

  test("streamed admission is drain-deterministic") {
    val a = ClassifyStream.q152StreamNbQuality(spark, sf).collect().map(_.toString).toSeq
    val b = ClassifyStream.q152StreamNbQuality(spark, sf).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
