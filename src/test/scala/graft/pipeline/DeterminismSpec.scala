package graft.pipeline

import graft.SparkSpec
import graft.config.DedupConfig
import graft.synth.ImageGen
import org.apache.spark.sql.functions._

/** The pipeline identity (`nid`) is content-derived (xxhash64 of image_id),
  * so recomputing features — partition loss, cache eviction, resumed run —
  * must reproduce byte-identical nids and assignments. The round-1 identity
  * (monotonically_increasing_id) failed exactly this property. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = DedupConfig.default

  test("features recomputed twice carry identical nids") {
    val images = ImageGen.generate(spark, bases = 40, seed = 7L).toDF()
    // two independent computations, different physical layouts
    val f1 = DedupPipeline.features(images, cfg)
      .select("id", "nid").as[(String, Long)].collect().toMap
    val f2 = DedupPipeline.features(images.repartition(7), cfg)
      .select("id", "nid").as[(String, Long)].collect().toMap
    assert(f1 == f2)
    assert(f1.values.toSet.size == f1.size, "nid collision in test corpus")
  }

  test("pipeline run twice produces identical assignments") {
    val images = ImageGen.generate(spark, bases = 40, seed = 7L).toDF()
    def assignments() =
      DedupPipeline.run(spark, images, cfg)
        .assignments.as[(String, Long)].collect().toMap
    val a1 = assignments()
    val a2 = assignments()
    assert(a1 == a2)
    // cluster labels are content-derived too: independent of run order
    assert(a1.values.toSet == a2.values.toSet)
  }
}
