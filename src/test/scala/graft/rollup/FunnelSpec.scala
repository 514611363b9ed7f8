package graft.rollup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // u1 completes in order: view@10, click@20, purchase@30
    (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
    // u2: purchase BEFORE any click -> only stage progression view, click
    (4L, 2L, 10L, "view"), (5L, 2L, 15L, "purchase"), (6L, 2L, 20L, "click"),
    // u3: click first doesn't count; later view->click does
    (7L, 3L, 10L, "click"), (8L, 3L, 20L, "view"), (9L, 3L, 30L, "click"),
    // u4: same ts, tieBreak orders view (id 10) before click (id 11)
    (10L, 4L, 50L, "view"), (11L, 4L, 50L, "click"),
    // u5: never views
    (12L, 5L, 10L, "click"), (13L, 5L, 20L, "purchase")
  ).toDF("event_id", "user_id", "sec", "event_type")
    .select(col("event_id"), col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("event_type"))

  private def run() =
    Funnel
      .ordered(events, "user_id", "ts", "event_type", Seq("view", "click", "purchase"), "event_id")
      .collect()
      .map { r =>
        def t(i: Int) = Option(r.getTimestamp(i)).map(_.getTime / 1000)
        r.getLong(0) -> ((t(1), t(2), t(3), r.getLong(4)))
      }
      .toMap

  test("stages only count after a qualifying earlier stage") {
    val got = run()
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    // u2's purchase precedes the click: funnel stops at click
    assert(got(2L) == ((Some(10L), Some(20L), None, 2L)))
    // u3's first click precedes the view and is ignored
    assert(got(3L) == ((Some(20L), Some(30L), None, 2L)))
    // equal ts: the tie-break row order lets the later-id click qualify
    assert(got(4L) == ((Some(50L), Some(50L), None, 2L)))
    // no entry stage at all
    assert(got(5L) == ((None, None, None, 0L)))
  }

  test("non-null stage times always form a prefix") {
    assert(run().values.forall { case (a, b, c, n) =>
      val flags = Seq(a.isDefined, b.isDefined, c.isDefined)
      flags.count(identity) == n && flags.dropWhile(identity).forall(!_)
    })
  }

  test("degenerate stage lists are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.ordered(events, "user_id", "ts", "event_type", Seq("view"), "event_id")
    }
    intercept[IllegalArgumentException] {
      Funnel.ordered(events, "user_id", "ts", "event_type", Seq("view", "view"), "event_id")
    }
  }
}
