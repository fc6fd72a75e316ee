package graft.plans

import graft.functions.{PointInPolygon, ShingleArray, VectorDot}
import graft.geo.Geo
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType}

/** Optimizer rule: fold [[PointInPolygon]] over literal coordinates into
  * a boolean literal. A UDF-based classify (the reference's shape,
  * `Task3.py:57-74`) is an optimization barrier; a native expression plus
  * this rule lets Catalyst erase constant classifications entirely —
  * e.g. `classify_hq(lit, lit)` inside a filter collapses to
  * `WHERE true/false` and the whole branch can be pruned. */
object FoldPointInPolygon extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case PointInPolygon(Literal(lon: java.lang.Double, DoubleType),
                          Literal(lat: java.lang.Double, DoubleType), poly) =>
        Literal(Geo.contains(poly, lon, lat), BooleanType)
    }
}

/** SQL surface for the native expressions. */
object GraftFunctions {

  private def classifyExpr(lon: Expression, lat: Expression): Expression =
    CaseWhen(Seq(
      (PointInPolygon(lon, lat, Geo.goldman), Literal("goldman")),
      (PointInPolygon(lon, lat, Geo.citigroup), Literal("citigroup"))),
      Literal("none"))

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    (FunctionIdentifier("classify_hq"),
      new ExpressionInfo(classOf[PointInPolygon].getName, "classify_hq"),
      (es: Seq[Expression]) => classifyExpr(es(0), es(1))),
    (FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      (es: Seq[Expression]) => ShingleArray(es(0))))

  /** Register on an existing session (temp function registry). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}

/** Session-builder installer:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * injects the constant-fold rule and the SQL functions at session
  * creation; [[GraftFunctions.register]] covers already-running sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldPointInPolygon)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
    GraftFunctions.all.foreach(e.injectFunction)
  }
}
