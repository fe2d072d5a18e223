package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scaleops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join") {
    val events = Queries.events(spark, sf)
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(3)))
    val plain = events.join(dim, Seq("user_id"))
      .select(col("event_id"), col("segment")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val salted = ScaleOps.saltedJoin(events, dim, "user_id", 8, "event_id")
      .select(col("event_id"), col("segment")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted fact spreads a hot key over saltFactor partitions' worth of salts") {
    val events = Queries.events(spark, sf)
    val salts = events.filter(col("user_id") === 1)
      .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(8L)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts > 1, "hot key must not collapse to a single salt")
  }

  test("bucketed join on the bucket key plans without an Exchange") {
    val li = Queries.table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Queries.table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    ScaleOps.writeBucketed(li, "li_b", "l_orderkey", 8)
    ScaleOps.writeBucketed(o, "o_b", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = ScaleOps.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle\n${plan.take(1500)}")
      assert(joined.count() == 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
