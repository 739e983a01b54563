package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) evaluates its lambdas
  * interpreted — ~1µs per element — which dominates similarity
  * scoring at millions of candidate pairs. This expression generates
  * a tight primitive loop via `doGenCode` (whole-stage codegen), with
  * an identical left-to-right summation order so results are
  * bit-equal to the HOF version (and to a sequential SQL oracle).
  *
  * Float inputs are implicitly cast to double (ImplicitCastInputTypes)
  * so products round in double precision, matching DuckDB DOUBLE[]
  * math.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    // mismatched dimensions are an upstream bug (corrupt embedding,
    // wrong literal): fail loudly instead of silently truncating
    if (x.length != y.length) throw DotProduct.mismatch(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |if ($x.length != $y.length) {
         |  throw graft.functions.DotProduct.mismatch($x.length, $y.length);
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $y[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(
      DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Shared by eval and generated code. */
  def mismatch(na: Int, nb: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_dot: mismatched array lengths ($na vs $nb) — upstream dimension bug")
}
