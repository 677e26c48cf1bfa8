package graft.sources

import graft.{SparkSpec, Tables}

class TableSourcesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("schema'd CSV round-trips equal to the parquet dims") {
    for (name <- Seq("region", "nation", "supplier")) {
      val parquet = Tables.load(spark, sf, name)
      val dir = tmpDir(s"csv_$name")
      parquet.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(dir)
      val csv = name match {
        case "region" => TableSources.region(spark, dir)
        case "nation" => TableSources.nation(spark, dir)
        case "supplier" => TableSources.supplier(spark, dir)
      }
      assert(csv.schema.fieldNames.toSeq === parquet.schema.fieldNames.toSeq)
      assert(csv.collect().map(_.toString).sorted.toSeq ===
        parquet.collect().map(_.toString).sorted.toSeq, s"table $name")
    }
  }

  test("events CSV ingest parses timestamps with the explicit format") {
    val parquet = Tables.events(spark, sf)
    val dir = tmpDir("csv_events")
    parquet.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(dir)
    val csv = TableSources.events(spark, dir)
    assert(csv.count() === parquet.count())
    val a = csv.selectExpr("event_id", "cast(ts as string)").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = parquet.selectExpr("event_id", "cast(ts as string)").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }
}
