package graft

/** The driver's smoke gate: `SparkEntry.entry` must produce rows > 0 at
  * sf0.001, and every registry entry must expose a runnable fn plus —
  * when SQL-expressible — an oracle whose text names the same tables the
  * fixtures provide. */
class EntrySpec extends SparkSpec {

  test("entry() (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle references only fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val lower = sql.toLowerCase
      assert(tables.exists(t => lower.contains(t)),
        s"$name's oracle references no known fixture table")
    }
  }

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }
}
