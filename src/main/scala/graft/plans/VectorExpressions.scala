package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates higher-order
  * lambdas per element outside whole-stage codegen — at 64 dims x
  * hundreds of thousands of candidate pairs that interpreter overhead
  * dominates the entire similarity workload. This expression compiles
  * to a tight primitive loop inside codegen instead.
  *
  * Summation is sequential left-to-right in double precision — the
  * exact order the DuckDB oracle (`list_reduce(list_transform(...))`)
  * uses, so results stay bit-identical.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType]
  // conforms to the expected Seq[AbstractDataType].
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  /** Element nulls are not expected (embedding vectors are dense);
    * dimensions are paired up to the shorter array.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  def register(spark: SparkSession): Unit = GraftFunctions.register(spark)

  /** Codegen'd float-vector dot product (double result). The session
    * owning the calling DataFrame must have called [[register]].
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}

/** The `spark.sql.extensions` injection path: add
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `builder.withExtensions(new GraftExtensions)`) and every
  * graft expression is available in SQL and `call_function` from
  * session construction — no runtime registration call needed.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach(ext.injectFunction)
}

/** Idempotently registers every graft custom expression in a
  * session's function registry. Works on any classic (JVM)
  * SparkSession, including one the caller created without
  * extensions; [[graft.Tables.load]] calls this, so every query
  * built on the test tables has the functions available.
  */
object GraftFunctions {

  /** (identifier, info, builder) triple per function — shared by the
    * runtime registrar and the extensions injector.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      children => DotProductFloat(children(0), children(1))),
    (FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStats].getName, "graft_text_stats"),
      children => TextStats(children(0), children(1))),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      children => TopKPairs(children(0), children(1), children(2))))
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    descriptions.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
