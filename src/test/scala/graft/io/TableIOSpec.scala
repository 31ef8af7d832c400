package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  private def freshIO() = {
    val dir = Files.createTempDirectory("graft-tio").toString
    (new ParquetTableIO(spark, dir), dir)
  }

  test("write/read/append round-trip") {
    val (io, _) = freshIO()
    io.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    assert(io.read("t").count() == 2)
    io.append(Seq((3L, "c")).toDF("id", "v"), "t")
    assert(io.read("t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("upsert replaces matched keys, inserts new, and is idempotent") {
    val (io, _) = freshIO()
    io.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    val up = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    io.upsert(up, "t", Seq("id"))
    val want = Seq((1L, "a"), (2L, "B"), (3L, "c"))
    assert(io.read("t").orderBy("id").as[(Long, String)].collect().toSeq == want)
    io.upsert(up, "t", Seq("id")) // idempotent: same frame again, no change
    assert(io.read("t").orderBy("id").as[(Long, String)].collect().toSeq == want)
  }

  test("upsert onto a missing table creates it; composite keys honored") {
    val (io, _) = freshIO()
    io.upsert(Seq((1L, 1L, "x")).toDF("a", "b", "v"), "t2", Seq("a", "b"))
    io.upsert(Seq((1L, 2L, "y"), (1L, 1L, "X")).toDF("a", "b", "v"), "t2", Seq("a", "b"))
    assert(io.read("t2").orderBy("a", "b").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "X"), (1L, 2L, "y")))
  }

  test("resolve picks parquet for paths") {
    val (_, dir) = freshIO()
    assert(TableIO.resolve(spark, dir).isInstanceOf[ParquetTableIO])
  }

  test("signatures-table incremental insert (faiss.py:40-51 analogue)") {
    // index only ids not already present: upsert keyed by image_id
    val (io, _) = freshIO()
    val sig1 = Seq(("img1", 11L), ("img2", 22L)).toDF("image_id", "simhash")
    io.upsert(sig1, "signatures", Seq("image_id"))
    // second batch overlaps img2 (recomputed, same value) and adds img3
    val sig2 = Seq(("img2", 22L), ("img3", 33L)).toDF("image_id", "simhash")
    io.upsert(sig2, "signatures", Seq("image_id"))
    val got = io.read("signatures").as[(String, Long)].collect().toMap
    assert(got == Map("img1" -> 11L, "img2" -> 22L, "img3" -> 33L))
  }

  test("bucketed write/read round-trip; layout visible to the planner") {
    val (io, _) = freshIO()
    val rows = (1L to 200L).map(k => (k % 17, k))
    io.writeBucketed(rows.toDF("key", "v"), "bk", "key", 4)
    val back = io.readBucketed("bk", "key", 4)
    assert(back.as[(Long, Long)].collect().sorted.toSeq == rows.sorted)
    // the whole point: an aggregation on the bucket column plans WITHOUT an
    // exchange — the scan is already hash-partitioned on the key
    val aggPlan = back.groupBy("key").count()
      .queryExecution.executedPlan.toString
    assert(aggPlan.contains("Bucketed: true"), aggPlan.take(2000))
    assert(!aggPlan.contains("Exchange"),
      s"bucketed-column aggregation must not shuffle:\n${aggPlan.take(2000)}")
  }

  test("bucketed layout survives a catalog that forgot the registration") {
    // a NEW session's in-memory catalog has no memory of writeBucketed's
    // table — readBucketed must re-register the spec over the files
    val (io, dir) = freshIO()
    io.writeBucketed((1L to 50L).map(k => (k % 5, k)).toDF("key", "v"),
      "bk2", "key", 3)
    spark.catalog.listTables()
      .filter(t => t.name.startsWith("graft_bkt_") && t.name.contains("bk2"))
      .collect().foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val io2 = new ParquetTableIO(spark, dir) // fresh handle, same root
    val back = io2.readBucketed("bk2", "key", 3)
    assert(back.count() == 50)
    val plan = back.groupBy("key").count().queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true") && !plan.contains("Exchange"),
      plan.take(2000))
  }

  test("bucketed upsert preserves the layout and the merge semantics") {
    val (io, _) = freshIO()
    io.writeBucketed(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("key", "id", "v"),
      "bk3", "key", 2)
    // replace id=b (new key AND value), insert id=c
    io.upsertBucketed(Seq((7L, "b", 21L), (3L, "c", 30L)).toDF("key", "id", "v"),
      "bk3", "key", 2, Seq("id"))
    val got = io.readBucketed("bk3", "key", 2)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (7L, "b", 21L), (3L, "c", 30L)))
    val plan = io.readBucketed("bk3", "key", 2).groupBy("key").count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true") && !plan.contains("Exchange"),
      plan.take(2000))
  }
}
