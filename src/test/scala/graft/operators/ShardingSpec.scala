package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {

  test("ring successor: below-min maps to the first node, above-max wraps") {
    import spark.implicits._
    val (pos, shards) = Sharding.ring(Sharding.Shards)
    val probes = Seq(
      ("below", pos.head - 1, shards.head),       // first node owns it
      ("at", pos.head, shards.head),              // inclusive boundary
      ("between", pos(3) + 1, shards(4)),         // strictly after node 3
      ("above", pos.last + 1, shards.head))       // wraps to the start
    val df = probes.map { case (n, p, _) => (n, p) }.toDF("name", "p")
      .select(col("name"), Sharding.ringShard(col("p"), Sharding.Shards).as("s"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    probes.foreach { case (n, _, expect) =>
      assert(got(n) == expect, s"probe $n: got ${got(n)}, expected $expect")
    }
  }

  test("every ring-moved doc moves TO the newly added shard") {
    val k = Sharding.Shards
    val placed = graft.core.Tables.documents(spark, sf)
      .select(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("p"))
      .select(Sharding.ringShard(col("p"), k).as("rk"),
        Sharding.ringShard(col("p"), k + 1).as("rk1"))
      .collect()
    val moved = placed.filter(r => r.getInt(0) != r.getInt(1))
    assert(moved.nonEmpty, "growing the ring must move something")
    assert(moved.forall(_.getInt(1) == k),
      "consistent hashing only hands keys to the NEW shard — any other " +
        "move means the ring lookup is wrong")
  }

  test("q222: the ring moves ~1/(K+1), mod moves ~K/(K+1)") {
    val r = Sharding.q222ShardRebalance(spark, sf).collect()(0)
    val (modMicro, ringMicro) = (r.getLong(3), r.getLong(4))
    assert(modMicro > 800000,
      s"mod-K rehash should move ~89% of the corpus, got $modMicro µ")
    assert(ringMicro < 250000,
      s"the ring should move ~11%, got $ringMicro µ")
    assert(r.getLong(5) >= 125000,
      "max ring shard load cannot be below the perfect 1/8 share")
  }
}
