package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** SQL surface of the native kernels ([[graft.functions.Registry]]):
  * every registered function must evaluate — through SQL text, not
  * the Scala Column API — to the exact values of its Column
  * counterpart, and a gated query must be replayable end-to-end in
  * pure SQL through them. Same second-session discipline as
  * BandedRangeJoinRuleSpec (extensions applied over the shared
  * context; the shared session stays extension-free and doubles as
  * the oracle).
  */
class GraftFunctionsSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("registered scalar kernels evaluate to their Column-API values in pure SQL") {
    withExtSession { s =>
      val row = s.sql(
        """SELECT graft_md5_prefix('hello world', 15)                          AS fp,
          |       graft_rolling_hash_min('hello world', 3, 257, 1000000007)   AS rh,
          |       graft_stopword_hits('ab cd ab', array(array('ab'), array('cd', 'xx'))) AS sw,
          |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))             AS dp,
          |       graft_dot_long(array(2L, 3L), array(5L, 7L))                AS dl,
          |       graft_lut_sum(array(0, 1), array(array(1.5d, 2.5d), array(3.0d, 4.0d))) AS ls
          |""".stripMargin).head()
      // oracle: the same expressions through the Scala entry points on
      // the EXTENSION-FREE shared session
      import graft.functions.{DotProduct, DotProductLong, LutSum, Md5Prefix, RollingHashMin, StopwordHits}
      val want = spark.range(1).select(
        Md5Prefix.md5Prefix(lit("hello world"), 15).as("fp"),
        RollingHashMin.rollingHashMin(lit("hello world"), 3, 257L, 1000000007L).as("rh"),
        StopwordHits.stopwordHits(lit("ab cd ab"),
          Seq(Seq("ab"), Seq("cd", "xx"))).as("sw"),
        DotProduct.dot(array(lit(1.0d), lit(2.0d)), array(lit(3.0d), lit(4.0d))).as("dp"),
        DotProductLong.dot(array(lit(2L), lit(3L)), array(lit(5L), lit(7L))).as("dl"),
        LutSum.lutSum(array(lit(0), lit(1)),
          array(array(lit(1.5d), lit(2.5d)), array(lit(3.0d), lit(4.0d)))).as("ls")
      ).head()
      assert(row.getLong(0) == want.getLong(0), "graft_md5_prefix")
      assert(row.getLong(1) == want.getLong(1), "graft_rolling_hash_min")
      assert(row.getSeq[Int](2) == want.getSeq[Int](2), "graft_stopword_hits")
      assert(row.getSeq[Int](2) == Seq(2, 1))
      assert(row.getDouble(3) == want.getDouble(3) && row.getDouble(3) == 11.0, "graft_dot")
      assert(row.getLong(4) == want.getLong(4) && row.getLong(4) == 31L, "graft_dot_long")
      assert(row.getDouble(5) == want.getDouble(5) && row.getDouble(5) == 5.5, "graft_lut_sum")
    }
  }

  test("a gated query replays end-to-end in pure SQL through the registered kernels") {
    // ext_dedup_exact_rows, re-expressed as SQL text a PySpark/JDBC
    // user could type: graft_md5_prefix IS Hashing.h60, so the SQL
    // twin must reproduce the gated row bit-for-bit
    val want = SparkEntry.queries("ext_dedup_exact_rows")(spark, "/root/testdata/sf0.001")
      .head()
    withExtSession { s =>
      Tables.documents(s, "/root/testdata/sf0.001").createOrReplaceTempView("docs")
      val got = s.sql(
        """WITH keep AS (SELECT MIN(doc_id) AS id FROM docs
          |              GROUP BY graft_md5_prefix(text, 15))
          |SELECT COUNT(*) AS n_kept, CAST(SUM(id) AS BIGINT) AS sum_kept_ids,
          |       COUNT(*) AS n_exact
          |FROM keep""".stripMargin).head()
      assert(got.getLong(0) == want.getLong(0) && got.getLong(0) > 0)
      assert(got.getLong(1) == want.getLong(1))
      assert(got.getLong(2) == want.getLong(2))
    }
  }

  test("live-session register() adds the kernels without extensions") {
    graft.functions.Registry.register(spark)
    val got = spark.sql("SELECT graft_md5_prefix('x', 2) AS fp").head().getLong(0)
    val want = spark.range(1)
      .select(graft.functions.Md5Prefix.md5Prefix(lit("x"), 2)).head().getLong(0)
    assert(got == want)
  }

  test("shape parameters must be literals: a non-foldable argument fails analysis loudly") {
    withExtSession { s =>
      import s.implicits._
      Seq(("a", 3)).toDF("t", "n").createOrReplaceTempView("bad")
      val e = intercept[Exception] {
        s.sql("SELECT graft_md5_prefix(t, n) FROM bad").collect()
      }
      assert(e.getMessage.contains("integer literal"),
        s"expected a loud literal-contract error, got: ${e.getMessage.take(200)}")
    }
  }
}
