package graft

import org.apache.spark.sql.functions._

/** Proves the co-located join story SCALE.md claims: two tables bucketed
  * on the join key by the same bucket count join WITHOUT any Exchange on
  * either side — the disk-layout analog of the reference pre-partitioning
  * both join inputs (thrill/api/inner_join.hpp hash-scatter). At 100 TB
  * this is the difference between re-shuffling both fact tables per join
  * and reading them join-ready.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-join-key tables join with zero Exchange") {
    // bucketed writes require the (in-memory) catalog, i.e. saveAsTable;
    // warehouse.dir is a static conf, so tables land in the default
    // ./spark-warehouse — dropped (and the dir removed) in the finally
    val wh = java.nio.file.Paths.get("spark-warehouse")
    val facts = (0L until 5000L).map(i => (i % 613, i))
    val dims = (0L until 613L).map(k => (k, s"name_$k"))
    spark.createDataset(facts).toDF("k", "v")
      .write.bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("graft_fact_bkt")
    spark.createDataset(dims).toDF("k", "name")
      .write.bucketBy(8, "k").sortBy("k")
      .mode("overwrite").saveAsTable("graft_dim_bkt")
    try {
      // disable auto-broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_fact_bkt")
        .join(spark.table("graft_dim_bkt"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan was:\n$plan")
      // and of course it is correct
      val got = joined.agg(count(lit(1)), sum($"v")).head()
      assert(got.getLong(0) === 5000L)
      assert(got.getLong(1) === (0L until 5000L).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_fact_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_dim_bkt")
      if (java.nio.file.Files.exists(wh)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(wh).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}
