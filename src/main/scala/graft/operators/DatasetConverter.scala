package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * External-corpus on-ramp — the Spark form of the reference's dataset
 * converter (reference: helpers/dataset_converter.py:7-58), which denormalizes
 * a downloaded bug-report corpus into the engine's two input tables: the
 * record store and the chronological attach-event log (`state.csv` there).
 *
 * Input: one JSON document per row (a raw-string column), tolerant of missing
 * keys like the reference's parser (reference: parsers/parser_v1.py:52-60 uses
 * `.get(..., None)` — here `from_json` yields nulls for absent fields).
 * `dup_id` maps to the cluster id with a self-id fallback
 * (dataset_converter.py's `dup_id -> iid, else own id`).
 */
object DatasetConverter {

  /** Tolerant corpus schema: absent fields parse as null. */
  val corpusSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", StringType),
    StructField("text", StringType),
    StructField("dup_id", LongType)))

  /**
   * @param raw one JSON string per row in `jsonCol`
   * @return (records, events): records = (record_id, ts, text);
   *         events = (event_id, record_id, cluster_id, ts, label) with
   *         cluster_id = dup_id if present else the record's own id, ordered
   *         semantics identical to the reference's state.csv (ts, rid, iid)
   */
  def convert(raw: DataFrame, jsonCol: String = "json"): (DataFrame, DataFrame) = {
    val parsed = raw
      .select(from_json(col(jsonCol), corpusSchema).as("j"))
      .select(
        col("j.id").as("record_id"),
        col("j.ts").cast("timestamp").as("ts"),
        col("j.text").as("text"),
        coalesce(col("j.dup_id"), col("j.id")).as("cluster_id"))
      .where(col("record_id").isNotNull) // unparseable rows drop, as in ref
    val records = parsed.select("record_id", "ts", "text")
    val events = parsed.select(
      col("record_id").as("event_id"), // one attach per record: id doubles as event id
      col("record_id"),
      col("cluster_id"),
      col("ts"),
      lit(true).as("label"))
    (records, events)
  }
}
