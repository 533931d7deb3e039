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
