package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Contract tests for the resample/gap-fill operator — in particular the
  * round-4 cross-day carry (a gap spanning midnight inherits the prior
  * day's close instead of resetting to null). */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gaps inside a day forward-fill; leading buckets before any data are null") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-03-01 10:00:30"), 5.0),
      (ts("2024-03-01 10:03:10"), 7.0))
      .toDF("ts", "value")
    val out = TimeSeries.resample(df, "ts", "value").orderBy($"bucket").collect()
    assert(out.length == 4) // 10:00 .. 10:03
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(5.0, 5.0, 5.0, 7.0))
  }

  test("a gap spanning midnight carries the prior day's close forward") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-03-01 23:58:00"), 3.0),
      (ts("2024-03-02 00:02:00"), 9.0), // 3 empty buckets cross midnight
      (ts("2024-03-03 00:01:00"), 4.0)) // a WHOLE empty day in between
      .toDF("ts", "value")
    val out = TimeSeries.resample(df, "ts", "value").orderBy($"bucket").collect()
    val byBucket = out.map(r => r.getTimestamp(0).toString -> r).toMap
    // before midnight: the observation itself, then its carry
    assert(byBucket("2024-03-01 23:59:00.0").getDouble(2) == 3.0)
    // day 2's head buckets carry day 1's close (previously null)
    assert(byBucket("2024-03-02 00:00:00.0").getDouble(2) == 3.0)
    assert(byBucket("2024-03-02 00:01:00.0").getDouble(2) == 3.0)
    assert(byBucket("2024-03-02 00:02:00.0").getDouble(2) == 9.0)
    // the whole empty day 2->3 stretch carries day 2's close 9.0,
    // including across the SECOND midnight
    assert(byBucket("2024-03-02 23:59:00.0").getDouble(2) == 9.0)
    assert(byBucket("2024-03-03 00:00:00.0").getDouble(2) == 9.0)
    assert(byBucket("2024-03-03 00:01:00.0").getDouble(2) == 4.0)
  }

  test("funnel: strict order, anchor-window deadline, same-instant step rejected; guards refuse") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full clean path
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // user 2: click BEFORE the first view — step 2 never fires
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "view"),
      // user 3: purchase lands beyond the anchor window — steps 1,2 only
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:30:00"), "click"),
      (3L, ts("2024-01-02 00:00:01"), "purchase"),
      // user 4: click at the SAME instant as the view — strictly-after
      // rejects it
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-01 00:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 86400L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L),
      (3, "purchase", 1L)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.funnel(ev, "user_id", "ts", "event_type",
        Seq("view"), windowSeconds = 60L)
    }
    assert(e.getMessage.contains("funnel"))
  }

  test("retention: first-seen week is the cohort; offset 0 is the cohort size; re-activity lands on exact week offsets") {
    import spark.implicits._
    // 2024-01-01 is a Monday (ISO week start)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort W0
      (1L, ts("2024-01-09 10:00:00")), // active W1
      (1L, ts("2024-01-16 10:00:00")), // active W2
      (2L, ts("2024-01-03 10:00:00")), // cohort W0
      (2L, ts("2024-01-04 10:00:00")), // same week — no extra row
      (3L, ts("2024-01-10 10:00:00"))) // cohort W1
      .toDF("user_id", "ts")
    val got = TimeSeries.retention(ev, "user_id", "ts",
        maxOffsetWeeks = 8)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.retention(ev, "user_id", "ts", maxOffsetWeeks = -1)
    }
    assert(e.getMessage.contains("maxOffsetWeeks"))
  }

  test("sessionize: strict-gap boundary (exactly the gap stays in-session), per-user ids, exact durations") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 101L, ts("2024-01-01 00:30:00")), // gap == 1800 s: SAME session
      (1L, 102L, ts("2024-01-01 01:00:01")), // gap 1801 s: NEW session
      (2L, 200L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "ts")
    val got = TimeSeries.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 1800L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 1800000000L), // two events, exactly 30 min apart
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.sessionize(ev, "user_id", "ts", "event_id", 0L)
    }
    assert(e.getMessage.contains("gap"))
  }

  test("transitions: pairs follow the (ts, event_id) total order; conditional p divides within the from-row") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a->b->a ; the ts tie at 00:00 is broken by event_id
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 00:00:00"), "b"),
      (1L, 3L, ts("2024-01-01 00:01:00"), "a"),
      // user 2: a->c — pairs never cross users
      (2L, 4L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 00:01:00"), "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = TimeSeries.transitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "a", 1L, 1.0)))
  }

  test("the day close is the LAST observed bucket's value, not the max") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-03-01 10:00:00"), 100.0), // larger value, earlier bucket
      (ts("2024-03-01 11:00:00"), 2.0),   // the close
      (ts("2024-03-02 05:00:00"), 1.0))
      .toDF("ts", "value")
    val out = TimeSeries.resample(df, "ts", "value", unit = "hour")
      .orderBy($"bucket").collect()
    val byBucket = out.map(r => r.getTimestamp(0).toString -> r).toMap
    assert(byBucket("2024-03-02 00:00:00.0").getDouble(2) == 2.0)
    assert(byBucket("2024-03-02 04:00:00.0").getDouble(2) == 2.0)
    assert(byBucket("2024-03-02 05:00:00.0").getDouble(2) == 1.0)
  }
}
