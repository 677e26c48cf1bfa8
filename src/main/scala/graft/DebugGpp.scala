package graft
import org.apache.spark.sql.functions._
import graft.sources.DataSkipping
object DebugGpp {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val pred = col("ts") >= expr("timestamp'2024-01-10 00:00:00'") &&
      col("ts") < expr("timestamp'2024-01-13 00:00:00'")
    val tree = org.apache.spark.sql.graft.ColumnBridge.expression(pred)
    println("TREE: " + tree.getClass.getName + " :: " + tree)
    tree.children.foreach(c => println("  CHILD: " + c.getClass.getName + " :: " + c))
    val parsed = s.sessionState.sqlParser.parseExpression("to_date(ts)")
    println("GEN: " + parsed.getClass.getName + " :: " + parsed)
    s.stop()
  }
}
