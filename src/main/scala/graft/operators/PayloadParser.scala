package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON payload parsing (bronze -> silver).
  *
  * Re-expresses the reference's silver transform
  * (pos-dlt `03_Bronze-to-Silver ETL.py:283-324`): cast the raw
  * payload to string, `from_json` with an explicit schema, project
  * the event fields, and `explode_outer` any nested item list so one
  * output row = one item.
  *
  * All of this is pure Catalyst expression work — it stays inside
  * whole-stage codegen and needs no shuffle.
  */
object PayloadParser {

  /** The reference's transaction payload schema
    * (pos-dlt `03_Bronze-to-Silver ETL.py:285-296`).
    */
  val txnSchema: StructType = StructType(Seq(
    StructField("trans_id", StringType),
    StructField("store_id", IntegerType),
    StructField("date_time", TimestampType),
    StructField("change_type_id", IntegerType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item_id", IntegerType),
      StructField("quantity", IntegerType)))))))

  /** Parse a binary/string `payloadCol` with `schema`, flatten the
    * top-level fields, and explode `itemsField` (if present) to
    * item-level rows — the exact bronze->silver shape of the
    * reference.
    */
  def parseAndExplode(
      df: DataFrame,
      payloadCol: String,
      schema: StructType,
      itemsField: Option[String] = None): DataFrame = {
    val parsed = df
      .withColumn("__event", from_json(col(payloadCol).cast(StringType), schema))
    val topNames = schema.fieldNames.toSeq.filterNot(itemsField.contains)
    val top = topNames.map(f => col(s"__event.$f").as(f))
    itemsField match {
      case None => parsed.select(top: _*)
      case Some(items) =>
        val itemType = schema(items).dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType]
        parsed
          .select(top :+ explode_outer(col(s"__event.$items")).as("__item"): _*)
          .select(topNames.map(col) ++
            itemType.fieldNames.toSeq.map(f => col(s"__item.$f").as(f)): _*)
    }
  }
}
