package graft

import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all ten testdata tables load with rows (via the typed accessors)") {
    // events MUST go through Tables.events — its accessor owns the
    // TIMESTAMP(NANOS) legacy-read handling that a raw read lacks
    val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (() => Tables.region(spark, dir)),
      "nation" -> (() => Tables.nation(spark, dir)),
      "customer" -> (() => Tables.customer(spark, dir)),
      "supplier" -> (() => Tables.supplier(spark, dir)),
      "part" -> (() => Tables.part(spark, dir)),
      "orders" -> (() => Tables.orders(spark, dir)),
      "lineitem" -> (() => Tables.lineitem(spark, dir)),
      "events" -> (() => Tables.events(spark, dir)),
      "documents" -> (() => Tables.documents(spark, dir)),
      "embeddings" -> (() => Tables.embeddings(spark, dir)))
    loaders.foreach { case (name, load) =>
      assert(load().limit(1).count() == 1, s"$name should load")
    }
  }

  test("events.ts survives the nanos conversion as a usable timestamp") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    val hours = ev.select(hour(col("ts")).as("h")).distinct()
      .collect().map(_.getInt(0))
    assert(hours.forall(h => h >= 0 && h <= 23))
    // values align with DuckDB's microsecond truncation: non-null everywhere
    assert(ev.filter(col("ts").isNull).count() == 0)
  }

  test("embeddings vectors are fixed-width float arrays") {
    val e = Tables.embeddings(spark, dir)
      .select(size(col("embedding")).as("d")).distinct().collect()
    assert(e.length == 1 && e.head.getInt(0) > 0)
  }
}
