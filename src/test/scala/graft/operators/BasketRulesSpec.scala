package graft.operators

import graft.SparkSpec

/** basket_rules: support/confidence/lift pinned by hand on a constructed
  * basket set, plus the prune knobs (min-support, mega-basket drop) and
  * the duplicate-row collapse. Cross-engine exactness is the DuckDB
  * oracle's job at sf0.01.
  */
class BasketRulesSpec extends SparkSpec {

  private def baskets(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("basket", "item")
  }

  test("support, confidence and lift replay the hand computation") {
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{a} -> nb = 4
    // pairs >= 2: (a,b)=2, (a,c)=2; (b,c)=1 pruned
    // marginals: a=4, b=2, c=2
    val got = Extras.basketRules(baskets(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"), (4L, "a")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // all four rules share lift = 2*4*1e6/(4*2) = 1e6; order by (ante, cons)
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 500L, 1000000L),
      ("a", "c", 2L, 500L, 1000000L),
      ("b", "a", 2L, 1000L, 1000000L),
      ("c", "a", 2L, 1000L, 1000000L)))
  }

  test("lift separates the dependent pair from the popular one") {
    // x,y always co-occur (2 of 6 baskets); p,q each in 4 baskets but
    // co-occur only at independence rate
    val rows = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "p"), (3L, "q"), (4L, "p"), (4L, "q"),
      (5L, "p"), (6L, "q"), (5L, "z"), (6L, "z"), (3L, "z"), (4L, "z"))
    val got = Extras.basketRules(baskets(rows: _*)).collect()
    val lift = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // x->y: 2*6e6/(2*2) = 3e6 ; p->q: 2*6e6/(3*3) = 1333333
    assert(lift(("x", "y")) == 3000000L)
    assert(lift(("p", "q")) == 1333333L)
    assert(got(0).getString(0) == "x", "the dependent pair ranks first")
  }

  test("min-support prunes, duplicates collapse, mega-baskets drop whole") {
    // basket 9 repeats (9, a) three times -> still one membership;
    // basket 7 exceeds maxBasket and must produce NO rule at all
    val mega = (1L to 5L).map(i => (7L, s"m$i"))
    val rows = Seq((9L, "a"), (9L, "a"), (9L, "a"), (9L, "b"),
      (10L, "a"), (10L, "b")) ++ mega
    val got = Extras.basketRules(baskets(rows: _*), maxBasket = 4).collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("a", "b", 2L), ("b", "a", 2L)))
    // nb excludes the dropped basket: lift = 2*2e6/(2*2) = 1e6
    assert(got.forall(_.getLong(4) == 1000000L))
    val none = Extras.basketRules(baskets(rows: _*), minSupport = 3L).collect()
    assert(none.isEmpty, "support 2 < minSupport 3 prunes every rule")
  }

  test("topK bounds the output deterministically") {
    val rows = (1L to 20L).flatMap(b => Seq((b, "h"), (b, s"i${b % 7}")))
    val got = Extras.basketRules(baskets(rows: _*), topK = 3).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(4)).toSeq.sorted.reverse == got.map(_.getLong(4)).toSeq,
      "descending lift")
  }
}
