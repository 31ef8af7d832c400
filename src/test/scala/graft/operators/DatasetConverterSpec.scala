package graft.operators

import graft.SparkSpec

class DatasetConverterSpec extends SparkSpec {
  import spark.implicits._

  test("converts a corpus with dup_id fallback and tolerant parsing") {
    val raw = Seq(
      """{"id": 1, "ts": "2024-01-01 10:00:00", "text": "first report", "dup_id": 7}""",
      """{"id": 2, "ts": "2024-01-02 10:00:00", "text": "second report"}""", // no dup_id
      """{"id": 3, "text": "no timestamp", "dup_id": 7}""",                  // no ts
      """not json at all"""                                                  // dropped
    ).toDF("json")
    val (records, eventsDf) = DatasetConverter.convert(raw)

    assert(records.count() == 3)
    val recs = records.select("record_id", "text").as[(Long, String)].collect().toMap
    assert(recs == Map(1L -> "first report", 2L -> "second report", 3L -> "no timestamp"))

    val ev = eventsDf.select("record_id", "cluster_id").as[(Long, Long)].collect().toMap
    // dup_id maps to cluster; absent dup_id falls back to the record's own id
    // (reference helpers/dataset_converter.py dup_id -> iid else self)
    assert(ev == Map(1L -> 7L, 2L -> 2L, 3L -> 7L))
    assert(eventsDf.where("label").count() == 3)
  }

  test("converted events replay through EventReplay") {
    val raw = Seq(
      """{"id": 1, "ts": "2024-01-01 10:00:00", "text": "x", "dup_id": 5}""",
      """{"id": 2, "ts": "2024-01-02 10:00:00", "text": "y", "dup_id": 5}""").toDF("json")
    val (_, eventsDf) = DatasetConverter.convert(raw)
    val asg = EventReplay.currentAssignments(eventsDf, idCol = "record_id")
      .select("record_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(asg == Map(1L -> 5L, 2L -> 5L))
  }
}
