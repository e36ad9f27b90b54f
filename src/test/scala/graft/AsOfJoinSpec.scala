package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  test("asOf matches naive point-in-time lookup, incl. edge cases") {
    import spark.implicits._
    // probes: (id, key, t); updates: (key, t, price)
    val left = Seq(
      (1L, "a", 10L), // before any update → null
      (2L, "a", 20L), // exactly at an update → sees it
      (3L, "a", 25L), // between updates → sees 20
      (4L, "a", 40L), // after last → sees 30
      (5L, "b", 15L), // other key
      (6L, "c", 99L)  // key with no updates at all → null
    ).toDF("id", "key", "t")
    val right = Seq(
      ("a", 20L, 2.0), ("a", 30L, 3.0), ("b", 10L, 7.0)
    ).toDF("key", "pt", "price")

    val got = AsOfJoin.asOf(left, right, Seq("key"), "t", "pt",
        Seq("price"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    assert(got == Map(
      1L -> None, 2L -> Some(2.0), 3L -> Some(2.0), 4L -> Some(3.0),
      5L -> Some(7.0), 6L -> None))
  }

  test("asOf null-valued update wins over older non-null update") {
    import spark.implicits._
    // the update at t=20 has price=null but qty=9: a probe at t=25 must
    // see (null, 9) from THAT update — not price=2.0 carried from t=10
    val left = Seq((1L, "a", 25L), (2L, "a", 15L)).toDF("id", "key", "t")
    val right = Seq(
      ("a", 10L, Some(2.0), Some(5L)),
      ("a", 20L, None, Some(9L))
    ).toDF("key", "pt", "price", "qty")
    val got = AsOfJoin.asOf(left, right, Seq("key"), "t", "pt",
        Seq("price", "qty"))
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(3)) None else Some(r.getDouble(3))),
        r.getLong(4))).toMap
    assert(got == Map(1L -> (None, 9L), 2L -> (Some(2.0), 5L)))
  }

  test("asOf rejects value-column collisions and reserved names") {
    import spark.implicits._
    val l = Seq((1L, "a", 5L)).toDF("id", "key", "t")
    val r = Seq(("a", 1L, 2.0)).toDF("key", "pt", "id")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("key"), "t", "pt", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l.withColumn("_t", lit(1)),
        r.withColumnRenamed("id", "price"),
        Seq("key"), "t", "pt", Seq("price"))
    }
  }

  test("asOf equals join-based reference on real events") {
    val ev = graft.core.Tables.df(spark, sf, "events")
    val left = ev.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("t_ms"))
    val prices = ev.filter(col("event_id") % 10 === 0)
      .groupBy(col("user_id"), unix_millis(col("ts")).as("p_ms"))
      .agg(max(col("value")).as("price"))
    val got = AsOfJoin.asOf(left, prices, Seq("user_id"), "t_ms", "p_ms",
      Seq("price"))

    // reference: point-in-time via conditional left join + argmax
    // (quadratic in updates per key — fine at spec scale, NOT the
    // operator shape). Events with no prior update keep a null price.
    val p2 = prices.withColumnRenamed("user_id", "u2")
    val ref = left.join(p2,
        col("user_id") === col("u2") && col("p_ms") <= col("t_ms"),
        "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("price"), col("p_ms")).as("price"))

    val g = got.select("event_id", "price").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    val want = ref.collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(g.size == want.size)
    assert(g == want)
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import TestSession._

  test("bucketized containment join equals naive inequality join") {
    val ev = graft.core.Tables.df(spark, sf, "events")
    val points = ev.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("t_ms"))
    val intervals = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("window_id"),
        col("user_id").as("u2"),
        (unix_millis(col("ts")) - 300000L).as("w_start"),
        (unix_millis(col("ts")) + 300000L).as("w_end"))
    val naive = points.join(intervals,
        col("user_id") === col("u2") &&
          col("t_ms") >= col("w_start") && col("t_ms") <= col("w_end"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // multiple bin widths, incl. widths larger and smaller than the
    // interval — bin geometry must never change the result
    for (w <- Seq(1000L, 300000L, 600000L, 3600000L)) {
      val got = graft.ops.RangeJoin.pointInInterval(points,
          intervals.withColumnRenamed("u2", "user_id"),
          Seq("user_id"), "t_ms", "w_start", "w_end", w)
        .select("event_id", "window_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binWidth=$w")
    }
  }
}
