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

  test("the query string is content-bearing: different ids never collapse") {
    val cs = canon(
      "http://example.com/p?id=1",
      "http://example.com/p?id=2",
      "http://example.com/p")
    assert(cs.distinct.size == 3)
  }
}
