package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asOfJoin picks the nearest preceding right row per key") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "l1"), (1L, ts(200), "l2"), (2L, ts(50), "l3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(90), 900L), (1L, ts(150), 1500L), (2L, ts(60), 600L))
      .toDF("k", "rt", "payload")
    val out = AsOf.asOfJoin(left, right, "k", "t", "rt", "payload")
      .select("name", "asof_payload").collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    assert(out == Map("l1" -> 900L, "l2" -> 1500L, "l3" -> null))
  }

  test("asOfJoinForward picks the nearest following right row, inclusive at equal ts") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "l1"), (1L, ts(200), "l2"), (2L, ts(50), "l3"),
      (3L, ts(10), "l4"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(150), 1500L), (1L, ts(300), 3000L),
      (2L, ts(50), 500L), (3L, ts(5), 50L))
      .toDF("k", "rt", "payload")
    val out = AsOf.asOfJoinForward(left, right, "k", "t", "rt", "payload")
      .select("name", "asof_payload").collect()
      .map(r => r.getString(0) -> r.get(1)).toMap
    // l1 → next at 150; l2 → next at 300; l3 → simultaneous (inclusive);
    // l4 → only an EARLIER right row exists → null
    assert(out == Map("l1" -> 1500L, "l2" -> 3000L, "l3" -> 500L, "l4" -> null))
  }

  test("duplicate right timestamps resolve deterministically to max(payload)") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "l1")).toDF("k", "t", "name")
    // three right rows at the same (key, time): the operator must always
    // pick the same one (max payload), never an arbitrary partition order
    val right = Seq((1L, ts(90), 5L), (1L, ts(90), 9L), (1L, ts(90), 7L))
      .toDF("k", "rt", "payload")
    (1 to 3).foreach { _ =>
      val out = AsOf.asOfJoin(left, right.repartition(4), "k", "t", "rt", "payload")
        .select("asof_payload").head().getLong(0)
      assert(out == 9L)
    }
  }
}
