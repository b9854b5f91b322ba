package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Crawl

/** Crawl-ingestion operators: HTML extraction on adversarial literals, URL
  * canonicalization edge cases, boilerplate predicate arms, and the bounded
  * per-domain cap. */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Crawl.mainContent(col("h"))).collect().head.getString(0)

  test("mainContent drops script/style subtrees wholesale") {
    val s = extract(
      "<html><body><script>\nvar x = '<p>not text</p>';\n</script>" +
        "<style>p { color: red }</style><p>real text here</p></body></html>")
    assert(s == "real text here")
  }

  test("mainContent turns block boundaries into line breaks, inline tags into nothing") {
    val s = extract("<div>first block</div><p>second <b>bold</b> block</p>third<br/>fourth")
    assert(s == "first block\nsecond bold block\nthird\nfourth")
  }

  test("mainContent decodes entities after tag stripping, &amp; last") {
    val s = extract("<p>a &amp;lt; b &middot; c &copy; d &mdash; e &#39;f&#39;</p>")
    // &amp;lt; must decode to the literal text "&lt;", not to "<"
    assert(s == "a &lt; b · c © d — e 'f'")
  }

  test("mainContent collapses whitespace and drops empty lines") {
    val s = extract("<p>  a   b  </p><p>   </p><p>c</p>")
    assert(s == "a b\nc")
  }

  test("escape/extract round-trips document text through the synthetic page") {
    val texts = Seq("plain words", "a < b > c & d", "5 &amp; 6")
    val r = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(Crawl.mainContent(Crawl.synthHtml(col("doc_id"), col("text"))).as("c"))
      .collect().map(_.getString(0))
    // content line 4 of the synthetic page is the document text, restored
    texts.zip(r).foreach { case (t, page) =>
      assert(page.split("\n")(3) == t, s"round-trip failed for: $t")
    }
  }

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Crawl.canonicalizeUrl(col("u"))).collect().head.getString(0)

  test("canonicalizeUrl lowercases authority, keeps path case") {
    assert(canon("HTTPS://News.Example.COM/Articles/X") ==
      "https://news.example.com/Articles/X")
  }

  test("canonicalizeUrl drops default ports only") {
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    assert(canon("https://example.com:8080/a") == "https://example.com:8080/a")
    // :443 is only a default for https
    assert(canon("http://example.com:443/a") == "http://example.com:443/a")
  }

  test("canonicalizeUrl strips www, fragment, tracking params; sorts the rest") {
    assert(canon("https://www.example.com/p?utm_source=x&b=2&a=1&fbclid=z#frag") ==
      "https://example.com/p?a=1&b=2")
    assert(canon("https://example.com/p?utm_campaign=x") == "https://example.com/p")
    assert(canon("https://example.com/p") == "https://example.com/p")
  }

  test("registeredDomain takes the last two host labels, ignoring port") {
    val r = Seq("https://a.b.news.example.com:8080/x", "https://example.org/")
      .toDF("u").select(Crawl.registeredDomain(col("u"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("example.com", "example.org"))
  }

  test("boilerplate predicate: long prose kept, stopworded mid block kept, nav dropped") {
    val prose = (1 to 20).map(i => s"w$i").mkString(" ")            // long, no stopwords
    val mid = "the quick brown fox jumps"                           // 5 toks, 1 stopword
    val nav = "Home About Contact Privacy Terms"                    // 5 toks, 0 stopwords
    val r = Seq(Seq(prose, mid, nav).mkString("\n")).toDF("t")
      .select(Crawl.dropBoilerplate(col("t")).as("b"))
      .select("b.content", "b.n_blocks", "b.n_kept").collect().head
    assert(r.getInt(1) == 3 && r.getInt(2) == 2)
    assert(r.getString(0) == s"$prose\n$mid")
  }

  test("domainCap keeps k best per domain, score desc then id asc") {
    val df = Seq(
      ("a.com", 1L, 0.9), ("a.com", 2L, 0.5), ("a.com", 3L, 0.9), ("a.com", 4L, 0.1),
      ("b.com", 5L, 0.2)).toDF("domain", "id", "score")
    val r = Crawl.domainCap(df, "domain", "id", "score", k = 2)
      .orderBy("domain", "rank")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      ("a.com", 1, 1L, 0.9), ("a.com", 2, 3L, 0.9), ("b.com", 1, 5L, 0.2)))
  }

  test("dropRepeatedLines drops only corpus-hot lines, preserving order and blanks") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique one\n\nshared tail"),
      (2L, "cookie banner\nunique two\nshared tail"),
      (3L, "Cookie Banner \nunique three\nshared tail"),
      (4L, "no banner here\nunique four")).toDF("id", "text")
    val r = Crawl.dropRepeatedLines(docs, "text", "id", minDocs = 3L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      .sortBy(_._1)
    // "cookie banner" normalizes equal across case/trim variants (df=3 →
    // hot); "shared tail" df=3 → hot; blanks and unique lines survive in
    // original order with original casing
    assert(r.toSeq == Seq(
      (1L, 4L, 2L, "unique one\n"),
      (2L, 3L, 2L, "unique two"),
      (3L, 3L, 2L, "unique three"),
      (4L, 2L, 0L, "no banner here\nunique four")))
  }
}
