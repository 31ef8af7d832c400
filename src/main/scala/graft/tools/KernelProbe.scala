package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-profile the scalar text kernels over the documents table — times
  * each sub-expression of quality_score in isolation (noop sink, warm
  * second pass): `runMain graft.tools.KernelProbe [sfDir] [cpus]`. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(cpus).select(col("doc_id"), col("text")).cache()
    docs.count()
    def time(name: String, c: Column): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        docs.select(xxhash64(c.cast("string")).as("h"))
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 2) println(f"[kernel] $name%-28s ${dt}%7.3f s")
      }
    }
    time("length", length(col("text")))
    time("lower", lower(col("text")))
    time("regex_strip(nonalnum)", regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "))
    time("normalize_text", graft.functions.normalize_text(col("text")))
    time("token_count(regexp)", regexp_count(col("text"), lit("[^ ]+")))
    time("token_count(split)", size(array_remove(split(col("text"), " "), "")))
    time("punct_count(regexp)", regexp_count(col("text"), lit("[.!?,;:]")))
    time("punct_count(replace)",
      length(regexp_replace(col("text"), "[^.!?,;:]", "")))
    time("stopword_regexp_count", regexp_count(graft.functions.normalize_text(col("text")),
      lit("\\b(the|a|an|and|or|of|to|in|is|it|that|for|on|with|as|was|at|by)\\b")))
    time("stopword_ratio", graft.functions.stopword_ratio(col("text")))
    time("quality_score", graft.functions.quality_score(col("text")))
    time("char_entropy", graft.functions.char_entropy(col("text")))
    time("distinct_token_ratio", graft.functions.distinct_token_ratio(col("text")))
    spark.stop()
  }
}
