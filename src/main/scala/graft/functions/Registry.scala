package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** SQL surface for the native kernels: registers `graft_dot`,
  * `graft_dot_long`, `graft_lut_sum`, `graft_md5_prefix`,
  * `graft_rolling_hash_min`, and `graft_stopword_hits` in a session's
  * FunctionRegistry, so SQL / PySpark / JDBC users reach the same
  * codegen'd expressions the Scala Column API binds — a serving or
  * exploration layer should not need Scala to call the engine's own
  * kernels.
  *
  * Two entry points, one description list:
  *  - [[graft.plans.GraftExtensions]] injects these at session build
  *    (`spark.sql.extensions=graft.plans.GraftExtensions` — the
  *    config-only path a PySpark user has);
  *  - [[register]] adds them to a LIVE session (notebook attach).
  *
  * Shape parameters (prefix length, hash constants, stopword lists)
  * must be FOLDABLE literals — they parameterize the generated code
  * itself, exactly like the Scala API's plain-Scala arguments; a
  * non-literal argument fails analysis loudly rather than planning a
  * per-row interpreted fallback.
  */
object Registry {

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  // any FOLDABLE integer expression qualifies (`7 + 8`, `CAST(3 AS
  // INT)`), matching the documented contract and listsLit's behavior
  // — not just bare Literal nodes
  private def longLit(fn: String, arg: String, e: Expression): Long = e match {
    case f if f.foldable && (f.dataType == IntegerType || f.dataType == LongType) =>
      f.eval() match {
        case v: Int => v.toLong
        case v: Long => v
        case null => throw new IllegalArgumentException(
          s"$fn: $arg must not be null")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def intLit(fn: String, arg: String, e: Expression): Int = {
    val v = longLit(fn, arg, e)
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$fn: $arg out of int range: $v")
    v.toInt
  }

  private def listsLit(fn: String, e: Expression): Seq[Seq[String]] = e match {
    case l if l.foldable => l.dataType match {
      case ArrayType(ArrayType(StringType, _), _) =>
        val outer = l.eval().asInstanceOf[ArrayData]
        require(outer != null, s"$fn: lists must not be null")
        (0 until outer.numElements()).map { i =>
          require(!outer.isNullAt(i), s"$fn: list $i is null")
          val inner = outer.getArray(i)
          (0 until inner.numElements()).map { j =>
            require(!inner.isNullAt(j), s"$fn: word $j of list $i is null")
            inner.getUTF8String(j).toString
          }
        }
      case dt => throw new IllegalArgumentException(
        s"$fn: lists must be array<array<string>>, got ${dt.sql}")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: lists must be a foldable array<array<string>> literal, got ${other.sql}")
  }

  type FunctionDescription = (FunctionIdentifier, ExpressionInfo, FunctionBuilder)

  private def desc(name: String, clazz: Class[_], usage: String)(
      b: Seq[Expression] => Expression): FunctionDescription =
    // the 5-arg constructor: the 11-arg one VALIDATES group/source
    // against Spark's internal whitelists (built-in docs machinery) —
    // external functions use the plain usage form
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
      (args: Seq[Expression]) => b(args))

  /** Every registered kernel; consumed by GraftExtensions and
    * [[register]].
    */
  val all: Seq[FunctionDescription] = Seq(
    desc("graft_dot", classOf[DotProduct],
      "_FUNC_(a, b) - dot product of two array<double> (codegen'd loop; " +
        "mismatched lengths fail loudly).") { args =>
      arity("graft_dot", 2, args)
      DotProduct(args(0), args(1))
    },
    desc("graft_dot_long", classOf[DotProductLong],
      "_FUNC_(a, b) - integer dot product of two array<bigint> " +
        "(two's-complement wrap; the int8-quantized scan kernel).") { args =>
      arity("graft_dot_long", 2, args)
      DotProductLong(args(0), args(1))
    },
    desc("graft_lut_sum", classOf[LutSum],
      "_FUNC_(codes, lut) - sum_i lut[i][codes[i]] over array<int> codes and " +
        "array<array<double>> lut (the PQ ADC serving kernel).") { args =>
      arity("graft_lut_sum", 2, args)
      LutSum(args(0), args(1))
    },
    desc("graft_md5_prefix", classOf[Md5Prefix],
      "_FUNC_(expr, nHexChars) - first nHexChars hex digits of md5(expr) as a " +
        "non-negative BIGINT (nHexChars <= 15; the 60-bit content fingerprint).") { args =>
      arity("graft_md5_prefix", 2, args)
      Md5Prefix(args(0), intLit("graft_md5_prefix", "nHexChars", args(1)))
    },
    desc("graft_rolling_hash_min", classOf[RollingHashMin],
      "_FUNC_(str, k, base, mod) - min Rabin-Karp hash over all k-byte windows " +
        "of str (NULL if shorter than k; the document fingerprint kernel).") { args =>
      arity("graft_rolling_hash_min", 4, args)
      RollingHashMin(args(0),
        intLit("graft_rolling_hash_min", "k", args(1)),
        longLit("graft_rolling_hash_min", "base", args(2)),
        longLit("graft_rolling_hash_min", "mod", args(3)))
    },
    desc("graft_stopword_hits", classOf[StopwordHits],
      "_FUNC_(str, lists) - array<int> of per-list token hit counts in one pass " +
        "over the text bytes (lists: array<array<string>> literal; the " +
        "language-ID kernel).") { args =>
      arity("graft_stopword_hits", 2, args)
      StopwordHits(args(0), listsLit("graft_stopword_hits", args(1)))
    })

  /** Register every kernel on a live session. Idempotent (re-register
    * replaces the identical builder).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
