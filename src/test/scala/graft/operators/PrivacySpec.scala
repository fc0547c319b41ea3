package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts emails, phones and IPs with per-category counts") {
    val df = Seq(
      (1L, "mail a.b+c@site-x.org or d@e.io tel 555-123-4567 host 192.168.0.1"),
      (2L, "no pii here at all"),
      (3L, "edge 555-12-34567 is not a phone; 300.1.2.3 still matches ip shape")
    ).toDF("doc_id", "text")
    val (ne, np, ni, red) = Privacy.scrub(col("text"))
    val out = df.select(col("doc_id"), ne.as("e"), np.as("p"), ni.as("i"),
      red.as("r")).orderBy("doc_id").collect()

    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 1 && out(0).getLong(3) == 1)
    assert(out(0).getString(4) ==
      "mail <EMAIL> or <EMAIL> tel <PHONE> host <IP>")
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0 && out(1).getLong(3) == 0)
    assert(out(1).getString(4) == "no pii here at all")
    // 555-12-34567: no 3-3-4 word-bounded window → not redacted;
    // 300.1.2.3 matches the conservative dotted-quad shape (no range check)
    assert(out(2).getLong(2) == 0 && out(2).getLong(3) == 1)
    assert(out(2).getString(4).contains("555-12-34567"))
    assert(out(2).getString(4).contains("<IP>"))
  }

  test("q67 plants PII deterministically and scrubs every planted item") {
    val out = Privacy.q67PiiRedact(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every document gains exactly one planted email/phone/ip
    assert(rows.forall(r => r.getLong(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1))
    // rerun is bit-identical (pure function of the corpus)
    assert(out.collect().map(_.getString(5)).toSeq ==
      rows.map(_.getString(5)).toSeq)
  }

  test("q68 repetition signals match a hand computation") {
    val df = Seq(
      (1L, "a a a b"),        // 4 toks: dup=1-2/4=0.5, top=3/4=0.75, bigrams: "a a","a a","a b" → 1-2/3
      (2L, "x y z"),          // all distinct: dup=0, top=1/3, bigrams distinct → 0
      (3L, "w")               // single token: dup=0, top=1, 2gram frac pinned 0
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_rep").toString
    df.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val out = TextOps.q68Repetition(spark, tmp).collect()

    assert(out(0).getDouble(2) == 0.5)
    assert(out(0).getDouble(3) == 0.75)
    assert(out(0).getDouble(4) == math.rint((1.0 - 2.0 / 3) * 1e4) / 1e4)
    assert(out(0).getString(5) == "repetitive")
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(4) == 0.0)
    assert(out(1).getString(5) == "repetitive") // top 1/3 = 0.3333 > 0.2
    assert(out(2).getDouble(3) == 1.0 && out(2).getDouble(4) == 0.0)
  }

  test("q101 k-anonymity: cell populations conserve, flags match the threshold") {
    val rows = Privacy.q101KAnonymity(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == 150) // every customer in one cell
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) < Privacy.KAnonThreshold))
    }
    // the fixture exercises both outcomes
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("q178: the noise draw is a keyed PRF — deterministic, signed by the hash, bounded") {
    val rows = Privacy.q178DpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // replay the uniform draw exactly: 48 bits of md5(salt || source)
    val mdi = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = {
      val hex = mdi.digest((Privacy.DpSalt + s).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    rows.foreach { case (src, n, eps, noise, released) =>
      assert(eps == Privacy.DpEpsilonMicros)
      assert(released == n * 1000000L + noise, "release = count + noise, exactly")
      val t = h48(src) * 2 - (1L << 48)
      // sign rides the hash bit; |noise| is capped by -ln(2^-48)/eps
      if (noise != 0) assert((noise > 0) == (t >= 0), s"$src sign")
      assert(math.abs(noise) <= 34000000L, s"$src noise magnitude")
    }
    // a real two-sided draw across the fixture's sources
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 < 0))
    // determinism: the release is reproducible run-to-run (the anti-
    // averaging property the keyed draw exists for)
    val again = Privacy.q178DpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    assert(again.toSeq == rows.map(r => (r._1, r._5)).toSeq)
  }

  test("l-diversity flags homogeneous cells that k-anonymity passes") {
    import spark.implicits._
    // cell A: 6 members (k-anonymous at k=5) but ONE sensitive value —
    // the homogeneity attack l-diversity exists to catch; cell B: 6
    // members, 3 values — safe under both
    val rows = (1 to 6).map(i => ("A", "x", 100L)) ++
      (1 to 6).map(i => ("B", "x", (i % 3).toLong * 100))
    val df = rows.toDF("seg", "nat", "band")
    val got = Privacy.lDiversity(df, Seq("seg", "nat"),
        org.apache.spark.sql.functions.col("band"), 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got("A") == ((6L, 1L, true)),
      "k-anonymous but homogeneous: l-diversity must flag it")
    assert(got("B") == ((6L, 3L, false)))
  }

  test("q225 shares q101's cell grain and k counts exactly") {
    val k = Privacy.q101KAnonymity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val l = Privacy.q225LDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(k.keySet == l.keySet, "same quasi-identifier cells")
    l.foreach { case (cell, (lk, dist)) =>
      assert(lk == k(cell), s"cell $cell: k differs between q101 and q225")
      assert(dist >= 1 && dist <= lk, s"cell $cell: distinct bands out of range")
    }
  }
}
