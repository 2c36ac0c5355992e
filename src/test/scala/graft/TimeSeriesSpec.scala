package graft

import graft.ext.TimeSeries

/** Gap-fill semantics: grid bounds, forward fill, leading nulls, and
  * the deterministic simultaneous-observation tie-break.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("hourly grid forward-fills, leading points stay null") {
    val events = Seq(
      (1L, "m", ts("2024-01-01 10:05:00"), 1.0),
      (2L, "m", ts("2024-01-01 12:30:00"), 2.0)
    ).toDF("event_id", "key", "ts", "v")
    val out = TimeSeries.forwardFillGrid(events, "key", "ts", "v",
        "event_id")
      .collect().map(r => (r.getTimestamp(1), Option(r.get(2)))).toMap
    assert(out.keySet == Set(ts("2024-01-01 10:00:00"),
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")))
    assert(out(ts("2024-01-01 10:00:00")).isEmpty) // before first event
    assert(out(ts("2024-01-01 11:00:00")).contains(1.0))
    assert(out(ts("2024-01-01 12:00:00")).contains(1.0)) // 12:30 not yet seen
  }

  test("simultaneous observations resolve to the highest event id") {
    val events = Seq(
      (7L, "m", ts("2024-01-01 10:00:00"), 1.0),
      (9L, "m", ts("2024-01-01 10:00:00"), 5.0) // same instant, higher id
    ).toDF("event_id", "key", "ts", "v")
    val out = TimeSeries.forwardFillGrid(events, "key", "ts", "v",
        "event_id")
      .collect().map(r => r.getDouble(2))
    assert(out.toSeq == Seq(5.0))
  }

  test("non-hour steps anchor to their own unit (day grid starts at midnight)") {
    val events = Seq(
      (1L, "m", ts("2024-01-01 10:05:00"), 1.0),
      (2L, "m", ts("2024-01-03 02:00:00"), 2.0)
    ).toDF("event_id", "key", "ts", "v")
    val out = TimeSeries.forwardFillGrid(events, "key", "ts", "v",
        "event_id", step = "1 day")
      .collect().map(r => (r.getTimestamp(1), Option(r.get(2)))).toMap
    // day-aligned grid: midnights, not 10:00-anchored hours
    assert(out.keySet == Set(ts("2024-01-01 00:00:00"),
      ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")))
    assert(out(ts("2024-01-01 00:00:00")).isEmpty)
    assert(out(ts("2024-01-02 00:00:00")).contains(1.0))
    assert(out(ts("2024-01-03 00:00:00")).contains(1.0))
  }

  test("unsupported step unit fails loudly") {
    val events = Seq((1L, "m", ts("2024-01-01 10:00:00"), 1.0))
      .toDF("event_id", "key", "ts", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.forwardFillGrid(events, "key", "ts", "v", "event_id",
        step = "1 fortnight")
    }
  }

  test("keys fill independently") {
    val events = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1.0),
      (2L, "b", ts("2024-01-01 10:30:00"), 9.0),
      (3L, "a", ts("2024-01-01 11:30:00"), 2.0)
    ).toDF("event_id", "key", "ts", "v")
    val out = TimeSeries.forwardFillGrid(events, "key", "ts", "v",
        "event_id")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2))))
      .toSet
    assert(out == Set(
      ("a", ts("2024-01-01 10:00:00"), Some(1.0)),
      ("a", ts("2024-01-01 11:00:00"), Some(1.0)),
      // b's grid floor (10:00) precedes its first observation at 10:30
      ("b", ts("2024-01-01 10:00:00"), None)))
  }
}
