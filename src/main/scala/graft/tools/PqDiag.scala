package graft.tools

import graft.operators.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stage-by-stage timing of the PQ/ADC path. Historical note: the original
 * pqTopK formulation (encoded corpus crossJoin broadcast(lut queries))
 * measured ~107 s on the 2000 x 2000 sf0.1 cross score because whole-stage
 * codegen defers the stream-side encode projection into the nested-loop
 * inner loop — the equi-join shape (id-only pairs + build-side
 * materialization) runs the same score in ~2 s. This main pins the fast
 * numbers so a regression of that shape is visible.
 */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("pq-diag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[pqdiag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    println(s"[pqdiag] corpus rows = ${emb.count()}")

    val t0 = System.nanoTime()
    val books = Ann.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    books.count()
    println(f"[pqdiag] train                        ${(System.nanoTime() - t0) / 1e9}%8.2f s")

    timed("encode")(Ann.pqEncode(emb, books, "vec_id", "embedding"))
    timed("cross score, agg") {
      val pairs = emb.select(col("vec_id").as("item_id"))
        .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"))))
      Ann.pqScorePairs(pairs, emb, queries, books, "vec_id", "embedding")
        .groupBy("query_id").agg(sum("adc").as("s"))
    }
    timed("full pqTopK k=1")(
      Ann.pqTopK(emb, queries, books, "vec_id", "embedding", k = 1))
    timed("full pqTopK k=1 (2nd)")(
      Ann.pqTopK(emb, queries, books, "vec_id", "embedding", k = 1))
    spark.stop()
  }
}
