package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("real ImageIO round-trip agrees with the generating formula pixel-for-pixel (png + bmp)") {
    for (fmt <- Seq("png", "bmp"); (d, w, h) <- Seq((0L, 8, 8), (7L, 15, 13), (123L, 12, 9))) {
      val grid = Multimodal.ImageFixture.grid(d, w, h)
      val bytes = Multimodal.ImageFixture.encode(grid, fmt)
      val back = Multimodal.ImageIoDecoder.decode(bytes)
        .getOrElse(fail(s"$fmt payload did not decode"))
      assert(back.width == w && back.height == h, s"$fmt dims")
      assert(back.gray.toSeq == grid.gray.toSeq, s"$fmt pixels for doc $d")
    }
  }

  test("every generated asset decodes and its stats match the formula (stub/real agreement)") {
    val decoded = Multimodal.decodeImages(Multimodal.imageAssets(spark, sf)).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      // the "stub" path: compute the same stats straight from the formula,
      // no codec — must agree with the ImageIO-decoded numbers exactly
      val grid = Multimodal.ImageFixture.grid(r.doc_id, r.width, r.height)
      assert(r.n_pixels == grid.gray.length.toLong, s"doc ${r.doc_id} n_pixels")
      assert(r.sum_gray == grid.gray.foldLeft(0L)(_ + _), s"doc ${r.doc_id} sum_gray")
    }
  }

  test("undecodable format falls back to FakeDecoder byte stats, real path returns None") {
    // bytes that no JDK ImageIO reader claims (webp magic)
    val webp = "RIFF....WEBPVP8 ".getBytes("US-ASCII")
    assert(Multimodal.ImageIoDecoder.decode(webp).isEmpty)
    val fb = Multimodal.FakeDecoder.decode(
      Multimodal.MediaAsset(1L, webp, "webp", 64L, 64L))
    assert(fb.n_bytes == webp.length.toLong)
    assert(fb.feature.length == Multimodal.FakeDecoder.FeatureDim)
  }

  test("resize fits the target box; sampled sum replays the formula at stride den") {
    val dims = Multimodal.imageAssets(spark, sf).collect()
      .map(a => a.doc_id -> ((a.width, a.height))).toMap
    val out = Multimodal.resizeImages(Multimodal.imageAssets(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = dims(r.doc_id)
      val den = math.max(1, (math.max(w, h) + 7) / 8)
      assert(r.out_w == math.max(1, w / den) && r.out_h == math.max(1, h / den))
      assert(r.out_pixels == r.out_w.toLong * r.out_h && r.out_pixels <= r.n_pixels)
      val expect = (for (y <- 0 until r.out_h; x <- 0 until r.out_w)
        yield Multimodal.ImageFixture.pixel(r.doc_id, x * den, y * den).toLong).sum
      assert(r.sum_sampled == expect, s"doc ${r.doc_id} sampled sum")
    }
  }

  test("frame sampling keeps every 4th row of the decoded raster") {
    val out = Multimodal.sampleFrames(Multimodal.imageAssets(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.n_sampled == (r.n_frames + 3) / 4)
      assert(r.sampled_px > 0 && r.sample_fp >= 0)
    }
  }

  test("animated-GIF round-trip is lossless frame-for-frame") {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    for ((d, w, h, nf) <- Seq((0L, 8, 8, 4), (7L, 15, 13, 8), (123L, 12, 9, 5))) {
      val bytes = Multimodal.VideoFixture.encode(wr, d, w, h, nf)
      val frames = Multimodal.GifFrameDecoder.decode(rd, bytes)
      assert(frames.length == nf, s"doc $d frame count")
      for (f <- 0 until nf) {
        assert(frames(f).width == w && frames(f).height == h, s"doc $d frame $f dims")
        val expect = for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.VideoFixture.pixel(d, f, x, y)
        assert(frames(f).gray.toSeq == expect, s"doc $d frame $f pixels")
      }
    }
  }

  test("video sampling keeps every 2nd frame of the real container") {
    val meta = Multimodal.videoAssets(spark, sf).collect()
      .map(a => a.doc_id -> ((a.width, a.height))).toMap
    val out = Multimodal.sampleVideo(Multimodal.videoAssets(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.n_sampled == (r.n_frames + 1) / 2, s"doc ${r.doc_id} sampled count")
      // replay the formula: total over ALL frames, fp over sampled frames
      val (w, h) = meta(r.doc_id)
      val sums = (0 until r.n_frames.toInt).map { f =>
        (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.VideoFixture.pixel(r.doc_id, f, x, y).toLong).sum
      }
      assert(r.total_gray == sums.sum, s"doc ${r.doc_id} total gray")
      val fp = sums.zipWithIndex.collect { case (s, f) if f % 2 == 0 => s }
        .foldLeft(0L)((acc, s) => (acc * 31 + s) % 1000000007L)
      assert(r.sample_fp == fp, s"doc ${r.doc_id} sample fp")
    }
  }

  test("q33 aggregates the real decoded rasters per format") {
    val decoded = Multimodal.decodeImages(Multimodal.imageAssets(spark, sf)).collect()
    val expect = decoded.groupBy(_.format).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_.n_pixels).sum, rs.map(_.sum_gray).sum)
    }.toMap
    val agg = Multimodal.q33DecodeStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(agg == expect)
    assert(agg.keySet == Set("png", "bmp"))
  }

  test("q139: dHash from decoded pixels equals the formula replay; clusters are real") {
    import Multimodal.ImageFixture
    // driver-side replay of the full dHash from the generating formula
    def dhash(d: Long, w: Int, h: Int): (Long, Long) = {
      def p(x: Int, y: Int): Int = ImageFixture.pixel(d, x * w / 9, y * h / 8)
      var lo = 0L; var hi = 0L
      for (y <- 0 until 8; x <- 0 until 8 if p(x + 1, y) > p(x, y)) {
        if (y < 4) lo |= 1L << (y * 8 + x) else hi |= 1L << ((y - 4) * 8 + x)
      }
      (hi, lo)
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (d, nc) =>
      val (w, h) = ImageFixture.dims(nc)
      (d, dhash(d, w, h))
    }
    val expectedClusters = expected.groupBy(_._2).view
      .mapValues(ms => (ms.length.toLong, ms.map(_._1).min))
      .filter(_._2._1 >= 2).toMap

    val got = Multimodal.q139ImageDhash(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expectedClusters)
    // the fixture corpus genuinely contains perceptual duplicates, so
    // the operator is exercised (not vacuously empty)
    assert(got.nonEmpty, "fixture has no dHash clusters — operator untested")
    assert(got.values.forall(_._1 >= 2))
  }

  test("q158: video fingerprint replays the frame-sum gradient; clusters are cluster-for-cluster exact") {
    import Multimodal.VideoFixture
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side replay from the generating formula
    val expected = docs.map { case (d, nc) =>
      val (w, h) = Multimodal.ImageFixture.dims(nc)
      val nf = VideoFixture.nFrames(nc)
      val sums = (0 until nf).map { f =>
        (for (y <- 0 until h; x <- 0 until w)
          yield VideoFixture.pixel(d, f, x, y).toLong).sum
      }
      val bits = (0 until nf - 1)
        .foldLeft(0L)((acc, f) => if (sums(f + 1) > sums(f)) acc | (1L << f) else acc)
      (d, (nf.toLong, bits))
    }
    val expectedClusters = expected.groupBy(_._2).view
      .mapValues(ms => (ms.length.toLong, ms.map(_._1).min))
      .filter(_._2._1 >= 2).toMap
    val got = Multimodal.q158VideoFpDedup(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got == expectedClusters)
    assert(got.nonEmpty, "fixture has no video fingerprint clusters — operator untested")
    assert(got.values.forall(_._1 >= 2))
  }

  test("q149: incremental dHash lands exactly on the direct v2 rebuild; changed slice is real") {
    val v1 = graft.operators.SnapshotFixture.table(spark, sf, "documents_v1_growth")
    val v2 = graft.operators.SnapshotFixture.table(spark, sf, "documents_v2")
    val inc = Multimodal.incrementalDhash(Multimodal.dhashOfDocs(v1), v1, v2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val rebuild = Multimodal.dhashOfDocs(v2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(inc == rebuild, "incremental maintenance drifted from the rebuild")
    // the trap is armed: some docs genuinely changed geometry between
    // the snapshots (carrying their v1 fingerprints would have failed)
    val v1Map = Multimodal.dhashOfDocs(v1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val changedAndDifferent = rebuild.count { case (d, hi, lo) =>
      v1Map.get(d).exists(_ != ((hi, lo)))
    }
    assert(changedAndDifferent > 0, "no doc changed fingerprint — the stale-carry trap is dead")
  }
}
