package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-built edge shapes for the URL canonicalizer — the cases the
  * derived-corpus oracle replay can't isolate: non-default ports must
  * survive, utm-only queries must collapse the '?', empty paths normalize
  * to '/', and fragments vanish regardless of what follows them.
  */
class UrlCanonSpec extends SparkSuite with Matchers {

  private def canon(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select($"url", UrlCuration.canonUrl($"url").as("c"),
        UrlCuration.canonHost($"url").as("h"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }

  test("case, www, default port, utm and fragment all normalize away") {
    canon("HTTPS://WWW.Ex.COM:443/A/b?utm_x=1&id=2#frag") shouldBe
      Seq(("https://ex.com/A/b?id=2", "ex.com"))
    canon("http://Host.Example.org:80/p/3?utm_source=feed&utm_campaign=x") shouldBe
      Seq(("http://host.example.org/p/3", "host.example.org"))
  }

  test("what must survive, survives") {
    // non-default port is MEANING, not noise
    canon("http://host.com:8080/x") shouldBe
      Seq(("http://host.com:8080/x", "host.com:8080"))
    // :443 is only default for https
    canon("http://host.com:443/x") shouldBe
      Seq(("http://host.com:443/x", "host.com:443"))
    // path case and non-utm param order are preserved
    canon("https://a.com/Page?b=2&a=1") shouldBe
      Seq(("https://a.com/Page?b=2&a=1", "a.com"))
    // www elsewhere than the prefix stays
    canon("http://wwwhost.com/") shouldBe
      Seq(("http://wwwhost.com/", "wwwhost.com"))
  }

  test("empty path and empty query normalize") {
    canon("HTTP://EX.COM") shouldBe Seq(("http://ex.com/", "ex.com"))
    canon("http://ex.com?utm_only=1") shouldBe Seq(("http://ex.com/", "ex.com"))
    canon("http://ex.com/#only-frag") shouldBe Seq(("http://ex.com/", "ex.com"))
    canon("http://ex.com/p?") shouldBe Seq(("http://ex.com/p", "ex.com"))
  }

  test("a '?' inside the fragment is NOT a query") {
    // The fragment is client-side only — '#f?x=1' must vanish wholesale,
    // not resurrect 'x=1' as a query string.
    canon("http://h.com/p#f?x=1") shouldBe Seq(("http://h.com/p", "h.com"))
    // ...while a real query before the fragment still survives
    canon("http://h.com/p?a=1#f?x=2") shouldBe
      Seq(("http://h.com/p?a=1", "h.com"))
  }

  test("url-level dup classes collapse and distinct urls do not") {
    import spark.implicits._
    val variants = Seq(
      "http://www.site.com:80/p?utm_a=1", // all three collapse to
      "HTTP://SITE.COM/p",                //   http://site.com/p
      "http://site.com/p#f",
      "http://site.com/q")                // distinct: different path
    val n = variants.toDF("url")
      .select(UrlCuration.canonUrl($"url").as("c")).distinct().count()
    n shouldBe 2
  }
}
