package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of one
  * registered query (or all). Usage:
  *   runMain graft.Explain <query_name|all> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (name == "all") Queries.all else Queries.all.filter(_.name == name)
    qs.foreach { q =>
      println(s"==== ${q.name} ====")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
