package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint via a Rabin–Karp ROLLING
  * hash: the minimum over all k-byte windows of the polynomial hash
  * `Σ b_j · base^(k-1-j) mod p`. The roll makes it O(n) per document
  * — each window reuses the previous window's hash with one multiply,
  * one subtract, one add — versus O(n·k) for recomputing every
  * window, and the whole scan happens inside whole-stage codegen with
  * zero allocation.
  *
  * Engine-portable: with base 31, k ≤ 8 the per-window polynomial
  * stays below 2^53, so a SQL twin can compute each window EXACTLY in
  * double arithmetic (`list_sum(list_transform(range(k), j ->
  * ascii(...) * POW(base, k-1-j)))::BIGINT % p`) and hash-match this
  * expression — the oracle recomputes windows naively, which also
  * cross-checks the rolling update. Byte-level (`getByte & 0xFF`):
  * equal to the SQL `ascii()` form on ASCII text.
  *
  * Returns NULL for strings shorter than k.
  */
case class RollingHashMin(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && base > 1 && mod > 1, "need k >= 1, base > 1, mod > 1")

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_rolling_hash_min"

  override def nullSafeEval(input: Any): Any =
    RollingHashMin.minHash(input.asInstanceOf[UTF8String], k, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { s =>
      // freshName, not a fixed identifier: with a NON-nullable child,
      // nullSafeExec inlines this snippet unwrapped, so two of these
      // expressions in one generated function would redeclare the same
      // local -> janino error -> silent interpreted fallback
      val r = ctx.freshName("rhmR")
      s"""
         |Object $r = graft.functions.RollingHashMin.minHash($s, $k, ${base}L, ${mod}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHashMin {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Shared by eval and generated code: one O(n) pass, the classic
    * Rabin–Karp roll. All intermediates stay far below 2^63
    * (mod ~1e9 ⇒ products ≤ ~2.6e11).
    */
  def minHash(s: UTF8String, k: Int, base: Long, mod: Long): java.lang.Long = {
    val n = s.numBytes
    if (n < k) return null
    // base^(k-1) mod p, for rolling the outgoing byte off
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * base % mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * base + (s.getByte(i) & 0xFF)) % mod; i += 1 }
    var min = h
    while (i < n) {
      val out = (s.getByte(i - k) & 0xFF).toLong
      h = ((h - out * bk % mod + mod) % mod * base + (s.getByte(i) & 0xFF)) % mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-API entry point. */
  def rollingHashMin(c: Column, k: Int = 8, base: Long = 31L,
                     mod: Long = 1000000007L): Column =
    ColumnShim.column(RollingHashMin(ColumnShim.expression(c), k, base, mod))
}
