package graft.ops

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {

  private lazy val events = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("funnel stages are monotonically non-increasing") {
    val r = EventOps.funnel(events).collect()(0)
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1 >= $s2 >= $s3")
    assert(s1 > 0, "no users entered the funnel — degenerate data")
  }

  test("retention: day-0 row counts every user exactly once") {
    val rows = EventOps.retention(events).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUsers = events.select("user_id").distinct().count()
    // every user is active on their own first day by construction
    assert(rows(0) == nUsers, s"day-0 users ${rows(0)} != distinct users $nUsers")
    assert(rows.keys.forall(_ >= 0), "negative day offset is impossible")
    assert(rows.values.forall(_ <= nUsers), "an offset cannot exceed the user population")
  }
}
