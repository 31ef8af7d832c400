package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventRankingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): Timestamp =
    new Timestamp((day * 86400L + h * 3600L) * 1000L)

  test("asOfCandidates: strictly-before within the forget window only") {
    val queries = Seq((100L, ts(5, 12))).toDF("query_id", "ts")
    val cands = Seq(
      (1L, ts(5, 11)),  // 1h before -> in
      (2L, ts(4, 13)),  // ~23h before -> in (window 2 days)
      (3L, ts(3, 11)),  // ~2d1h before -> out
      (4L, ts(5, 12)),  // simultaneous -> out (strictly before)
      (5L, ts(6, 0))    // after -> out
    ).toDF("item_id", "ts")
    val got = EventRanking.asOfCandidates(queries, cands, forgetDays = 2)
      .select("item_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("asOfCandidatesLastUpdate: active clusters expose ALL pre-query members") {
    val queries = Seq((100L, ts(10))).toDF("query_id", "ts")
    val cands = Seq(
      (1L, ts(0), "A"),     // ancient member of A — back in via A's activity
      (2L, ts(9, 12), "A"), // recent member of A -> activates A
      (3L, ts(2), "B"),     // B's last update is old -> B inactive
      (4L, ts(11), "A")     // after the query -> never a candidate
    ).toDF("item_id", "ts", "cluster_id")
    val lastUpdate = EventRanking.asOfCandidatesLastUpdate(
        queries, cands, forgetDays = 1)
      .select("item_id").as[Long].collect().toSet
    assert(lastUpdate == Set(1L, 2L), s"got $lastUpdate")
    // contrast: the per-report variant admits only the in-window member
    val perReport = EventRanking.asOfCandidates(queries, cands, forgetDays = 1)
      .select("item_id").as[Long].collect().toSet
    assert(perReport == Set(2L))
  }

  test("replayRank lastUpdateWindow widens candidacy to whole active clusters") {
    val events = Seq(
      (1L, "A", ts(0), 10.0),     // ancient A member, value matches the query
      (2L, "A", ts(9, 12), 99.0), // recent A member -> keeps A active
      (3L, "B", ts(2), 50.0),     // stale B -> B out either way
      (100L, "Q", ts(10), 10.0))  // the query event
      .toDF("event_id", "cluster_id", "ts", "value")
    def run(lastUpdate: Boolean) = EventRanking.replayRank(events,
        queryFilter = col("event_id") === 100L,
        score = -abs(col("q_val") - col("c_val")),
        forgetDays = 1, retrievalTopN = 10, k = 2, minScore = -1000.0,
        lastUpdateWindow = lastUpdate)
      .select("cluster_id", "cluster_score").as[(String, Double)].collect().toMap
    val wide = run(lastUpdate = true)
    assert(wide("A") == 0.0, s"old member's perfect score must win: $wide")
    assert(!wide.contains("B"), "stale cluster must stay out")
    val narrow = run(lastUpdate = false)
    assert(narrow("A") == -89.0, s"per-report variant must see only the recent member: $narrow")
  }

  test("asOfCandidates matches a naive range-join oracle on random data") {
    val r = new scala.util.Random(7)
    val ev = (1 to 300).map { i =>
      (i.toLong, new Timestamp(r.between(0L, 10L * 86400L) * 1000L))
    }
    val evDf = ev.toDF("id", "ts")
    val got = EventRanking.asOfCandidates(
        evDf.withColumnRenamed("id", "query_id"),
        evDf.withColumnRenamed("id", "item_id"), forgetDays = 1)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (qi, qt) <- ev
      (ci, ct) <- ev
      if ct.getTime < qt.getTime &&
        (qt.getTime - ct.getTime) / 1000 <= 86400
    } yield (qi, ci)).toSet
    assert(got == want)
  }

  test("rankClustersWithDefault: unscored in-window clusters rank last at minScore") {
    val pairScores = Seq((1L, 10L, 0.9), (1L, 11L, 0.4)).toDF("query_id", "item_id", "score")
    val assignments = Seq((10L, 100L), (11L, 200L)).toDF("item_id", "cluster_id")
    // cluster 300 exists in the window but none of its members were retrieved
    val universe = Seq((1L, 100L), (1L, 200L), (1L, 300L)).toDF("query_id", "cluster_id")
    val got = EventRanking.rankClustersWithDefault(
        pairScores, assignments, universe, k = 10, minScore = -1.0)
      .select("cluster_id", "cluster_score", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(got.toSeq == Seq((100L, 0.9, 1), (200L, 0.4, 2), (300L, -1.0, 3)))
  }

  test("replayRank end to end: retrieval cap + min-score + rank truncation") {
    // two clusters; query at day 5 sees only day-4+ events
    val events = Seq(
      (1L, 100L, ts(4, 1), 1.0, "add"),
      (2L, 100L, ts(4, 2), 5.0, "add"),
      (3L, 200L, ts(4, 3), 9.0, "add"),
      (4L, 300L, ts(1, 0), 1.0, "add"),  // too old: outside forget window
      (5L, 999L, ts(5, 0), 5.0, "query")
    ).toDF("event_id", "cluster_id", "ts", "value", "kind")
    val got = EventRanking.replayRank(events,
        queryFilter = col("kind") === "query",
        score = -abs(col("q_val") - col("c_val")),
        forgetDays = 2, retrievalTopN = 2, k = 10, minScore = -100.0,
        idCol = "event_id", clusterCol = "cluster_id")
      .select("cluster_id", "cluster_score", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // retrieval keeps items 2 (|5-5|=0) and 3 (|5-9|=4... vs item 1 |5-1|=4,
    // tie broken by item_id -> item 1); cluster 100 max = 0, cluster 200
    // dropped by retrieval -> minScore; cluster 300 out of window entirely
    assert(got.map(_._1).toSeq == Seq(100L, 200L))
    assert(got.head == ((100L, 0.0, 1)))
    assert(got(1) == ((200L, -100.0, 2)))
  }
}
