package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UserStatsStreamSpec extends SparkSpec {

  test("mapGroupsWithState running stats equal the batch aggregate") {
    val streamed = UserStatsStream.run(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 100))))
      .toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size} " +
        s"diff=${(streamed.toSet diff batch.toSet).take(3)}")
  }
}
