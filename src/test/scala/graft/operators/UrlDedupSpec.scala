package graft.operators

import graft.SparkSpec

/** Pins urlCanonicalize's rule set on production-shaped crawl URLs —
  * the reusable surface behind dedup_url (the registry entry's fixture
  * construction is oracle-checked; THIS pins the rules on real shapes). */
class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    Dedup.urlCanonicalize(urls.toDF("url"))
      .collect().map(_.getAs[String]("url_canon")).toSeq

  test("every canonicalization rule, one production URL each") {
    assert(canon(
      "https://WWW.Example.COM/a/b/?utm_source=tw&x=2&id=9#frag",
      "HTTP://example.com/a/b",
      "http://example.com/",
      "https://example.com/p?utm_campaign=z",
      "http://example.com/p/?id=1&utm_medium=email#top"
    ) == Seq(
      "http://example.com/a/b?id=9&x=2", // frag gone, lowered, www gone, https->http, utm gone, params SORTED, slash gone
      "http://example.com/a/b",          // untouched content survives
      "http://example.com",              // root trailing slash
      "http://example.com/p",            // all params tracking -> no '?'
      "http://example.com/p?id=1"        // mixed tracking + real param
    ))
  }

  test("crawl variants of one page collapse to one canonical form") {
    val variants = Seq(
      "https://www.news.example.org/story/42?utm_source=feed",
      "http://news.example.org/story/42/",
      "HTTPS://NEWS.EXAMPLE.ORG/story/42#comments",
      "http://www.news.example.org/story/42")
    assert(canon(variants: _*).distinct.size == 1)
  }

  test("canonicalization is idempotent and scrubbed on 300 seeded-random URLs") {
    val rnd = new scala.util.Random(1711)
    val schemes = Seq("http://", "https://", "HTTP://", "HTTPS://")
    val hosts = Seq("a.example.com", "B.Example.ORG", "www.c.example.net", "d.io")
    val paths = Seq("", "/", "/x", "/x/y", "/x/y/", "/x//")
    val params = Seq("", "?id=1", "?utm_source=a", "?b=2&a=1", "?utm_x=1&z=9&a=0")
    val frags = Seq("", "#top", "#a/b?c=1")
    val urls = Seq.fill(300)(
      schemes(rnd.nextInt(4)) + hosts(rnd.nextInt(4)) + paths(rnd.nextInt(6)) +
        params(rnd.nextInt(5)) + frags(rnd.nextInt(3)))
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    assert(once == twice, "canon(canon(u)) must equal canon(u)")
    once.foreach { c =>
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("://www.") &&
        !c.startsWith("https://") && c == c.toLowerCase && !c.endsWith("/"),
        s"residual non-canonical content in '$c'")
      // params, when present, are sorted
      val qi = c.indexOf('?')
      if (qi >= 0) {
        val ps = c.substring(qi + 1).split("&").toSeq
        assert(ps == ps.sorted && ps.forall(_.nonEmpty), s"unsorted params in '$c'")
      }
    }
  }

  test("rewrites are scoped to the authority: paths and values keep case/content") {
    assert(canon(
      // case-significant path survives; host still lowers
      "https://Example.COM/Case/Sensitive/Path",
      // embedded URL in a query value is NOT rewritten (no https->http,
      // no www-strip inside the value)
      "https://example.com/r?redirect=https://www.x.com/Y&utm_source=a",
      // '?' before any '/' — the authority still ends correctly
      "HTTP://WWW.EXAMPLE.COM?id=3",
      // no scheme at all: query/slash rules apply, nothing else rewrites
      "example.com/p/?b=2&a=1&utm_z=1"
    ) == Seq(
      "http://example.com/Case/Sensitive/Path",
      "http://example.com/r?redirect=https://www.x.com/Y",
      "http://example.com?id=3",
      "example.com/p?a=1&b=2"
    ))
  }

  test("the query string is content-bearing: different ids never collapse") {
    val cs = canon(
      "http://example.com/p?id=1",
      "http://example.com/p?id=2",
      "http://example.com/p")
    assert(cs.distinct.size == 3)
  }
}
