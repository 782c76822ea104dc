package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds its own session (extensions are session-construction-time), so
  * not part of the shared SparkSpec fixture. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers graft_* for SQL") {
    // extensions apply at session construction; other suites in this JVM may
    // hold a default session, so clear (and later restore) rather than
    // stop() — the underlying SparkContext is shared
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // `.config("spark.sql.extensions", ...)` is a STATIC conf — honored
      // only when the SparkContext itself is built (true in a fresh
      // deployment; this JVM's context belongs to the shared fixture).
      // `withExtensions` drives the exact same GraftExtensions.apply.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-extensions-spec")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = spark.sql(
        "SELECT graft_simhash('hello world hello') AS sh, " +
          "size(graft_shingles('a b c d')) AS n, " +
          "graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c").head()
      assert(r.getLong(0) != 0L)
      assert(r.getInt(1) == 2) // shingles of 4 tokens = 2 distinct 3-grams
      assert(r.getDouble(2) == 1.0)
      // EVERY builder resolves through the extensions path — the review
      // find was exactly this drift (the extension shipped 9 of 11
      // functions); resolving each name pins the shared-list fix
      graft.functions.HashExpressions.builders.foreach { case (name, _) =>
        // type-correct args per signature: the surfaced Spark Bloom
        // expressions type-check at analysis (long hash / binary sketch),
        // unlike the graft_* string family
        val args = name match {
          case "graft_cosine" => "'x', 'x'"
          case "graft_sorted_inter" => "array(1), array(1)"
          case "graft_bloom_agg" => "xxhash64('x'), 1000L, 8192L"
          case "graft_might_contain" => "CAST(NULL AS BINARY), xxhash64('x')"
          case "graft_srp" => "array(1.0f), 8"
          case _ => "'x'"
        }
        // analysis only — no execution needed to prove resolution
        spark.sql(s"SELECT $name($args)").queryExecution.analyzed
      }
      // wrong arity fails analysis with the builder's message, not an
      // IndexOutOfBoundsException
      val e = intercept[Exception](
        spark.sql("SELECT graft_cosine(array(1.0f))").queryExecution.analyzed)
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("requires exactly 2 argument")),
        s"unexpected failure shape: $e")
      // nullable-element arrays are rejected at ANALYSIS: the merge walk
      // has no null semantics (toIntArray would read null slots as
      // garbage), so the SQL surface must refuse rather than miscount
      val en = intercept[Exception](spark.sql(
        "SELECT graft_sorted_inter(array(1, CAST(NULL AS INT)), array(1))")
        .queryExecution.analyzed)
      assert(messages(en).exists(_.contains("nullable elements")),
        s"unexpected failure shape: $en")
      // and the documented remedy (array_compact narrows containsNull)
      // passes analysis
      spark.sql("SELECT graft_sorted_inter(" +
        "array_compact(array(1, CAST(NULL AS INT))), array(1))")
        .queryExecution.analyzed
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
