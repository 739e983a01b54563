package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** First `nHexChars` hex digits of md5(input) as a BIGINT — the
  * engine-portable hash underlying [[graft.ext.Hashing]].
  *
  * Bit-identical to `conv(substring(md5(x), 1, n), 16, 10)` (and to
  * DuckDB's `CAST('0x' || substr(md5(x),1,n) AS BIGINT)`), but without
  * that formulation's per-row cost: the built-in chain materializes a
  * 32-char hex UTF8String, substrings it, then string-parses the
  * radix-16 digits — two allocations and a parse per hash, which
  * profiling showed dominated every shingle/minhash/fingerprint
  * pipeline (ext_dedup_fingerprint spent 48× DuckDB's time computing
  * the same md5). Here the digest's leading nibbles go straight to a
  * long inside whole-stage codegen; the hex string never exists.
  *
  * `nHexChars` ≤ 15 keeps the value within 60 bits (non-negative
  * BIGINT on both engines). String inputs cast to UTF-8 bytes via
  * ImplicitCastInputTypes, exactly as Spark's own `md5` does.
  */
case class Md5Prefix(child: Expression, nHexChars: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nHexChars >= 1 && nHexChars <= 15,
    s"nHexChars must be in [1, 15] (60-bit max), got $nHexChars")

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.prefix(input.asInstanceOf[Array[Byte]], nHexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      // one MessageDigest per generated class instance; digest() resets
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e);
                |}""".stripMargin)
      val d = ctx.freshName("digest")
      val v = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      s"""
         |byte[] $d = $md.digest($bytes);
         |long $v = 0L;
         |for (int $j = 0; $j < $nHexChars; $j++) {
         |  int $b = $d[$j >> 1] & 0xFF;
         |  $v = ($v << 4) | ((($j & 1) == 0) ? ($b >>> 4) : ($b & 0xF));
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  import org.apache.spark.sql.graftshim.ColumnShim

  private val localMd = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Interpreted twin of the generated loop (fallback eval path). */
  def prefix(bytes: Array[Byte], nHexChars: Int): Long = {
    val d = localMd.get().digest(bytes)
    var v = 0L
    var j = 0
    while (j < nHexChars) {
      val b = d(j >> 1) & 0xFF
      v = (v << 4) | (if ((j & 1) == 0) b >>> 4 else b & 0xF)
      j += 1
    }
    v
  }

  /** Column-API entry point. */
  def md5Prefix(c: Column, nHexChars: Int): Column =
    ColumnShim.column(Md5Prefix(ColumnShim.expression(c), nHexChars))
}
