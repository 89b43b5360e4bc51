package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  private def domain(hosts: String*): Seq[String] =
    hosts.toDF("h").select(Urls.registrableDomainOf(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalUrl lowercases scheme+host, strips userinfo/default port/fragment") {
    assert(canon(
      "HTTPS://User:Pw@WWW.Example.COM:443/Path/Q?id=1#frag",
      "http://example.com:80/a",
      "http://example.com:8080/a",
      "https://example.com/a?x=1#two#three") == Seq(
      "https://www.example.com/Path/Q?id=1",
      "http://example.com/a",
      "http://example.com:8080/a",  // non-default port kept
      "https://example.com/a?x=1")) // fragment to end of string
  }

  test("canonicalUrl drops tracking params, keeps the rest in original order") {
    assert(canon(
      "https://e.com/p?utm_source=feed&b=2&a=1&gclid=xyz&fbclid",
      "https://e.com/p?utm_campaign=x",
      "https://e.com/p",
      // ref is content-bearing (e.g. ?ref=<branch> on code hosts) and
      // must SURVIVE canonicalization — it is not in the drop set
      "https://e.com/repo?ref=main&utm_source=x") == Seq(
      "https://e.com/p?b=2&a=1",  // NOT resorted
      "https://e.com/p",          // all-tracking query -> no '?'
      "https://e.com/p",
      "https://e.com/repo?ref=main"))
  }

  test("canonicalUrl passes scheme-less input through unchanged") {
    assert(canon("not a url", "www.example.com/x?utm_source=1") ==
      Seq("not a url", "www.example.com/x?utm_source=1"))
  }

  test("hostOf extracts lowercased host without userinfo or port") {
    val got = Seq("HTTP://u@Sub.Ex.ORG:8080/p?q#f", "plain text")
      .toDF("url").select(Urls.hostOf(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("sub.ex.org", ""))
  }

  test("canonicalUrl edge shapes: path-less URLs and bracketed IPv6 hosts survive") {
    assert(canon(
      "HTTPS://Example.COM",            // no path, no query
      "http://[2001:DB8::1]:8080/a",    // IPv6: brackets kept, port kept
      "http://[::1]:80/a") == Seq(      // IPv6 + default port stripped
      "https://example.com",
      "http://[2001:db8::1]:8080/a",
      "http://[::1]/a"))
  }

  test("canonicalUrl is idempotent: canon(canon(u)) == canon(u)") {
    val urls = Seq(
      "HTTPS://User:Pw@WWW.Example.COM:443/Path/Q?id=1#frag",
      "http://example.com:80/a?utm_source=x&b=2",
      "https://e.com/p?utm_campaign=x", "not a url",
      "HTTP://u@Sub.Ex.ORG:8080/p?q#f")
    val once = urls.toDF("url")
      .select(Urls.canonicalUrl(col("url")).as("c"))
    val twice = once.select(col("c"),
      Urls.canonicalUrl(col("c")).as("c2")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("registrable domain: 2-label default, 3-label for pinned suffixes") {
    assert(domain(
      "www.site3.co.uk", "a.b.site.com.au", "www.example.com",
      "example.org", "localhost", "co.uk") == Seq(
      "site3.co.uk", "site.com.au", "example.com",
      "example.org", "localhost", "co.uk"))
  }
}
