package graft.exec

import java.nio.file.Files

import graft.SparkSpec

class VersionedStoreSpec extends SparkSpec {

  test("overwrites archive the previous version; reads see the current one") {
    val root = Files.createTempDirectory("graft_vstore").toString
    VersionedStore.put(spark, root, "users/data.json", "v1")
    VersionedStore.put(spark, root, "users/data.json", "v2")
    VersionedStore.put(spark, root, "users/data.json", "v3")
    assert(VersionedStore.get(spark, root, "users/data.json").contains("v3"))
    assert(VersionedStore.noncurrentVersions(spark, root, "users/data.json").size == 2)
    assert(VersionedStore.get(spark, root, "missing").isEmpty)
  }

  test("noncurrent expiry reaps only versions past the window, never the current") {
    val root = Files.createTempDirectory("graft_vstore_exp").toString
    VersionedStore.put(spark, root, "k", "old")
    VersionedStore.put(spark, root, "k", "mid")
    VersionedStore.put(spark, root, "k", "cur")
    val stamps = VersionedStore.noncurrentVersions(spark, root, "k")
    assert(stamps.size == 2)
    // pretend 31 days pass for the older stamp only: expire with a `now`
    // 31 days after the OLDEST stamp but within 30 days of the newest.
    // Stamps are milliseconds apart, so drive `now` directly instead of
    // mutating files: first a now that expires nothing…
    val day = 24 * 3600 * 1000L
    assert(VersionedStore.expireNoncurrent(spark, root, 30, now = stamps.max + day).isEmpty)
    // …then one past the window for both
    val reaped = VersionedStore.expireNoncurrent(spark, root, 30, now = stamps.max + 31 * day)
    assert(reaped.size == 2)
    assert(VersionedStore.get(spark, root, "k").contains("cur"))
    assert(VersionedStore.noncurrentVersions(spark, root, "k").isEmpty)
  }
}
