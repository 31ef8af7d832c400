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
}
