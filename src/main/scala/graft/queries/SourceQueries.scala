package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Source/sink format breadth beyond parquet + text: CSV, JSON-lines, and
  * ORC round-trips (write from the canonical tables, read back, aggregate —
  * the aggregate proves losslessness and lets the DuckDB oracle compute the
  * same answer from the original parquet).
  *
  * Reference analog: the reference reads delimited text and raw binary only
  * (SURVEY.md §2.1 — thrill/api/read_lines.hpp:41-523,
  * read_binary.hpp:47-297); columnar/self-describing formats are a declared
  * Spark-side superset.
  *
  * 100 TB posture, per format:
  *  - every reader gets an EXPLICIT schema — schema inference is a full
  *    extra pass over the data (and samples nondeterministically on JSON);
  *    at cluster scale the schema comes from the catalog, never the files;
  *  - CSV/JSON-lines are splittable when uncompressed (line-oriented input
  *    format), so parallelism survives; money crosses the text formats as
  *    integer cents because a double→decimal-string→double round-trip is
  *    not identity;
  *  - ORC keeps min/max stride stats, so predicate pushdown skips row
  *    groups exactly like parquet (asserted on the plan in SourcesSpec);
  *  - all three writes shard one file per partition (no single-writer
  *    bottleneck), and the read side re-splits by
  *    spark.sql.files.maxPartitionBytes independent of write sharding.
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV round trip: orders → sharded headered CSV → explicit-schema read
    // → per-priority aggregate. Cents-as-long before the write keeps the
    // text round-trip exact.
    "q_read_csv" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_csv_")
      val tmp = base.resolve("out").toString
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_orderpriority",
          round($"o_totalprice" * 100, 0).cast("long").as("price_cents"))
        .write.option("header", "true").csv(tmp)
      val back = s.read
        .schema("o_orderkey LONG, o_orderpriority STRING, price_cents LONG")
        .option("header", "true").csv(tmp)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"price_cents").as("cents_sum"))
        .orderBy($"o_orderpriority")
      val out = FacadeQueries.collectEager(back)
      FacadeQueries.deleteRecursively(base)
      out
    }),

    // JSON-lines round trip: events → sharded JSON → explicit-schema read
    // → per-type aggregate. Timestamps cross as epoch micros (a JSON
    // timestamp string re-parse is locale/precision-fragile; integers are
    // not), and the min/max micros prove field-level losslessness.
    "q_read_json" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_json_")
      val tmp = base.resolve("out").toString
      Tables.events(s, d)
        .select($"event_id", $"event_type", unix_micros($"ts").as("ts_us"),
          round($"value" * 100, 0).cast("long").as("value_cents"))
        .write.json(tmp)
      val back = s.read
        .schema("event_id LONG, event_type STRING, ts_us LONG, value_cents LONG")
        .json(tmp)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"value_cents").as("cents_sum"),
          min($"ts_us").as("min_us"), max($"ts_us").as("max_us"))
        .orderBy($"event_type")
      val out = FacadeQueries.collectEager(back)
      FacadeQueries.deleteRecursively(base)
      out
    }),

    // BUCKETED co-located join: orders and customer are written as
    // EXTERNAL bucketed tables (8 buckets on the join key, catalog entry
    // + files at an explicit tmpdir — no warehouse lands in the cwd),
    // re-read through the catalog, and joined with auto-broadcast
    // disabled. The executed join plan must contain NO Exchange — the
    // bucket layout IS the shuffle, paid once at write time; at 100 TB
    // this is the difference between re-shuffling both fact tables per
    // join and reading them join-ready (the disk analog of the reference
    // pre-partitioning both join inputs —
    // thrill/api/inner_join.hpp:45-210's hash scatter). The zero-Exchange
    // assert rides the gate, so a planner regression fails CORRECTNESS,
    // not just BucketedJoinSpec.
    "q_bucketed_join" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_bkt_")
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        Tables.orders(s, d)
          .select($"o_custkey", $"o_orderkey",
            round($"o_totalprice" * 100, 0).cast("long").as("cents"))
          .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", base.resolve("orders_bkt").toString)
          .mode("overwrite").saveAsTable("graft_orders_bkt")
        Tables.customer(s, d)
          .select($"c_custkey", $"c_mktsegment")
          .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", base.resolve("customer_bkt").toString)
          .mode("overwrite").saveAsTable("graft_customer_bkt")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = s.table("graft_orders_bkt")
          .join(s.table("graft_customer_bkt"),
            $"o_custkey" === $"c_custkey")
        val joinPlan = joined.queryExecution.executedPlan.toString
        require(!joinPlan.contains("Exchange"),
          s"bucketed join must be shuffle-free; plan was:\n$joinPlan")
        FacadeQueries.collectEager(
          joined.groupBy($"c_mktsegment")
            .agg(count(lit(1)).as("n"), sum($"cents").as("cents_sum"))
            .orderBy($"c_mktsegment"))
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        s.sql("DROP TABLE IF EXISTS graft_orders_bkt")
        s.sql("DROP TABLE IF EXISTS graft_customer_bkt")
        FacadeQueries.deleteRecursively(base)
      }
    }),

    // BZ2 round trip: the reference decompresses .bz2 transparently by
    // extension (thrill/vfs/bzip2_filter.cpp; recognized schemes at
    // thrill/vfs/file_io.cpp:48-51) alongside .gz (gated in DIASpec).
    // Hadoop's BZip2Codec gives Spark the same extension-inferred read —
    // and unlike gzip, bzip2 is block-SPLITTABLE, so a 100 TB .bz2 text
    // corpus still fans out across executors instead of one task per
    // file. The *.bz2 glob makes the codec path explicit; the aggregate
    // proves losslessness against the original parquet.
    "q_read_bz2" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_bz2_")
      val tmp = base.resolve("out").toString
      Tables.orders(s, d)
        .select(concat_ws("|", $"o_orderkey", $"o_orderpriority").as("value"))
        .write.option("compression", "bzip2").text(tmp)
      val back = s.read.textFile(s"$tmp/part-*.bz2").toDF("value")
        .select(split($"value", "\\|").getItem(0).cast("long").as("o_orderkey"),
          split($"value", "\\|").getItem(1).as("o_orderpriority"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("key_sum"))
        .orderBy($"o_orderpriority")
      val out = FacadeQueries.collectEager(back)
      FacadeQueries.deleteRecursively(base)
      out
    }),

    // EXPLICIT URI-scheme source: the reference routes reads by URI
    // scheme — file:, s3:, hdfs: (thrill/vfs/file_io.cpp:48-57,140-220).
    // Spark delegates the same resolution to Hadoop's FileSystem
    // registry, so a file:// glob here is the SAME code path a cluster
    // uses for s3a:// / hdfs:// — swapping the scheme is a string
    // change, not a code change (COVERAGE.md "Remote VFS" row; the
    // sandbox has no remote FS to gate against). The glob carries the
    // scheme end-to-end through the text source.
    "q_read_file_scheme" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_uri_")
      val tmp = base.resolve("out")
      Tables.nation(s, d)
        .select(concat_ws("|", $"n_nationkey", $"n_name").as("value"))
        .write.text(tmp.toString)
      val uri = "file://" + tmp.toAbsolutePath + "/part-*"
      val back = s.read.textFile(uri).toDF("value")
        .select(split($"value", "\\|").getItem(0).cast("int").as("n_nationkey"),
          split($"value", "\\|").getItem(1).as("n_name"))
        .orderBy($"n_nationkey")
      val out = FacadeQueries.collectEager(back)
      FacadeQueries.deleteRecursively(base)
      out
    }),

    // ORC round trip: lineitem → ORC → filtered read → aggregate. The
    // l_quantity >= 30 predicate reaches the ORC scan as a pushed filter
    // (stride stats skip row groups — SourcesSpec asserts the plan);
    // quantities are integer-valued so the double sum is exact in any
    // order (< 2^53).
    "q_read_orc" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_orc_")
      val tmp = base.resolve("out").toString
      Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_quantity",
          round($"l_extendedprice" * 100, 0).cast("long").as("price_cents"))
        .write.orc(tmp)
      val back = s.read
        .schema("l_orderkey LONG, l_quantity DOUBLE, price_cents LONG")
        .orc(tmp)
        .filter($"l_quantity" >= 30)
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty_sum"),
          sum($"price_cents").as("cents_sum"))
      val out = FacadeQueries.collectEager(back)
      FacadeQueries.deleteRecursively(base)
      out
    })
  )

  val oracles: Map[String, String] = Map(
    "q_read_csv" ->
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
        |   AS cents_sum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_read_json" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS cents_sum,
        | min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // bucket layout changes nothing semantically: the oracle is the
    // plain join + aggregate over the original parquet
    "q_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
        |   AS cents_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_read_bz2" ->
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_read_file_scheme" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
    "q_read_orc" ->
      """SELECT count(*) AS n, sum(l_quantity) AS qty_sum,
        | CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT)
        |   AS cents_sum
        |FROM lineitem WHERE l_quantity >= 30""".stripMargin
  )
}
