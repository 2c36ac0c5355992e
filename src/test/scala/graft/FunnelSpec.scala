package graft

import graft.ext.Funnel

/** Funnel semantics: first-touch strictly-ordered steps, out-of-order
  * events don't count, and the conversion report's denominators.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  // A completes in order; B clicked BEFORE viewing (click must not
  // count; a later second click does); C views only; D's purchase
  // precedes the click (step 3 not reached)
  private lazy val events = Seq(
    (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:05:00"),
    (1L, "purchase", "2024-01-01 10:10:00"),
    (2L, "click", "2024-01-01 09:00:00"), (2L, "view", "2024-01-01 09:30:00"),
    (2L, "click", "2024-01-01 09:45:00"),
    (3L, "view", "2024-01-01 08:00:00"),
    (4L, "view", "2024-01-01 07:00:00"), (4L, "purchase", "2024-01-01 07:30:00"),
    (4L, "click", "2024-01-01 08:00:00")
  ).map { case (u, t, at) => (u, t, ts(at)) }.toDF("user_id", "event_type", "ts")

  test("stepTimes: earliest strictly-later time per step, nulls cascade") {
    val rows = Funnel.stepTimes(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .select("user_id", "t_1", "t_2", "t_3")
      .collect().map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    assert(rows(1L) == ((ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:05:00"), ts("2024-01-01 10:10:00"))))
    // B: the 09:00 click is before the 09:30 view; the 09:45 click counts
    assert(rows(2L) == ((ts("2024-01-01 09:30:00"),
      ts("2024-01-01 09:45:00"), null)))
    assert(rows(3L) == ((ts("2024-01-01 08:00:00"), null, null)))
    // D: purchase at 07:30 precedes the 08:00 click -> step 3 unreached
    assert(rows(4L) == ((ts("2024-01-01 07:00:00"),
      ts("2024-01-01 08:00:00"), null)))
  }

  test("streaming funnel advances equal the batch step times") {
    import graft.streaming.{FunnelAdvance, FunnelEvent, FunnelStream}
    implicit val sqlCtx = spark.sqlContext
    val all = events.collect()
      .map(r => FunnelEvent(r.getLong(0), r.getTimestamp(2).getTime * 1000,
        r.getString(1)))
      .sortBy(e => (e.ts_micros, e.user_id))
    // batch ground truth: stepTimes rows → (user, step, ts) advances
    val expected = Funnel.stepTimes(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().flatMap { r =>
        (1 to 3).flatMap { i =>
          Option(r.getTimestamp(i)).map(t => (r.getLong(0), i, t.getTime * 1000))
        }
      }.toSet

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelEvent]
    val q = FunnelStream.advances(in.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(all.length / 2) // time-ordered batches
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("funnel_adv").as[FunnelAdvance].collect()
        .map(a => (a.user_id, a.step, a.ts_micros)).toSet
      assert(streamed == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("conversion report: counts and per-step rates") {
    val rep = Funnel.conversion(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rep.toSeq == Seq(
      (1L, "view", 4L, 1.0),      // all four users viewed
      (2L, "click", 3L, 0.75),    // users 1, 2, 4
      (3L, "purchase", 1L, trunc4(1.0 / 3))))
  }

  // floor-truncation, matching Funnel.conversion's boundary-proof rounding
  private def trunc4(d: Double): Double = math.floor(d * 1e4) / 1e4
}
