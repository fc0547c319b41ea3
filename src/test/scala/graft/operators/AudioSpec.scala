package graft.operators

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  test("real WAV round-trip agrees with the generating formula sample-for-sample (8k + 16k)") {
    for (rate <- Seq(8000, 16000); (d, n) <- Seq((0L, 256), (7L, 388), (123L, 640))) {
      val wave = Audio.AudioFixture.waveform(d, n)
      val bytes = Audio.AudioFixture.encode(wave, rate)
      val back = Audio.WavDecoder.decode(bytes)
      assert(back.sampleRate == rate, s"rate for doc $d")
      assert(back.samples.toSeq == wave.toSeq, s"samples for doc $d @ $rate")
    }
  }

  test("every generated asset decodes and its stats match the formula (formula/real agreement)") {
    val decoded = Audio.decodeAudio(Audio.audioAssets(spark, sf)).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val wave = Audio.AudioFixture.waveform(r.doc_id, r.n_samples.toInt)
      assert(r.sum_abs == wave.map(s => math.abs(s).toLong).sum, s"doc ${r.doc_id} sum_abs")
      val zc = (1 until wave.length).count(i => (wave(i - 1) < 0) != (wave(i) < 0)).toLong
      assert(r.zero_crossings == zc, s"doc ${r.doc_id} zero_crossings")
      assert(r.sample_rate == Audio.AudioFixture.rate(r.doc_id), s"doc ${r.doc_id} rate")
    }
  }

  test("framing keeps complete 64-sample frames; energies replay the formula") {
    val out = Audio.frameAudio(Audio.audioAssets(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.n_frames == r.n_samples / 64, s"doc ${r.doc_id} frame count")
      val wave = Audio.AudioFixture.waveform(r.doc_id, r.n_samples.toInt)
      val energies = (0 until r.n_frames.toInt).map { f =>
        (f * 64 until f * 64 + 64).map(i => wave(i).toLong * wave(i)).sum
      }
      assert(r.total_energy == energies.sum, s"doc ${r.doc_id} total energy")
      val fp = energies.foldLeft(0L)((acc, e) => (acc * 31 + e) % 1000000007L)
      assert(r.energy_fp == fp, s"doc ${r.doc_id} energy fp")
    }
  }

  test("q153 fingerprint replays the energy-gradient formula; clusters partition by fingerprint") {
    val fps = Audio.fingerprintAudio(Audio.audioAssets(spark, sf)).collect()
    assert(fps.nonEmpty)
    fps.foreach { r =>
      // the fingerprint uses complete frames only, so replaying the first
      // n_frames·64 samples reproduces every energy it saw
      val wave = Audio.AudioFixture.waveform(r.doc_id, r.n_frames.toInt * 64)
      val e = (0 until r.n_frames.toInt).map { f =>
        (f * 64 until f * 64 + 64).map(i => wave(i).toLong * wave(i)).sum
      }
      val bits = (0 until r.n_frames.toInt - 1)
        .foldLeft(0L)((acc, f) => if (e(f + 1) > e(f)) acc | (1L << f) else acc)
      assert(r.grad_bits == bits, s"doc ${r.doc_id} gradient bits")
    }
    val clusters = Audio.q153AudioFpDedup(spark, sf).collect()
    assert(clusters.nonEmpty, "fixture corpus should have fingerprint collisions")
    val byFp = fps.groupBy(r => (r.n_frames, r.grad_bits))
    clusters.foreach { c =>
      val members = byFp((c.getLong(0), c.getLong(1)))
      assert(c.getLong(2) == members.length.toLong)
      assert(c.getLong(3) == members.map(_.doc_id).min, "keeper = min doc_id")
    }
    // every multi-member fingerprint is reported, none invented
    assert(clusters.length == byFp.count(_._2.length >= 2))
  }

  test("q110 aggregates the real decoded waveforms per sample rate") {
    val decoded = Audio.decodeAudio(Audio.audioAssets(spark, sf)).collect()
    val expect = decoded.groupBy(_.sample_rate.toLong).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_.n_samples).sum, rs.map(_.sum_abs).sum,
        rs.map(_.zero_crossings).sum)
    }.toMap
    val agg = Audio.q110AudioStats(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(agg == expect)
    assert(agg.keySet == Set(8000L, 16000L))
  }
}
