package graft.operators

import graft.SparkSpec

class HtmlOpsSpec extends SparkSpec {

  private def extract(pages: Seq[(Long, String)]) = {
    import spark.implicits._
    HtmlOps.htmlTextOf(pages.toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("tag strip, entity decode, and whitespace collapse on a full page") {
    val r = extract(Seq((1L,
      """<html><head><title>A &amp; B</title></head><body>
        |<h1>Head</h1><p>one   two</p><p>three &lt;tag&gt; &#39;q&#39;&nbsp;x</p>
        |</body></html>""".stripMargin)))(1L)
    assert(r.getAs[String]("title") === "A & B")
    assert(r.getAs[String]("main_text") === "one two three <tag> 'q' x")
    assert(r.getAs[String]("full_text") === "A & B Head one two three <tag> 'q' x")
  }

  test("script and style blocks vanish even when they contain tags and comparisons") {
    val r = extract(Seq((1L,
      "<body><script>if (1 < 2) { x = \"<b>no</b>\"; }</script>" +
        "<style>p { color: red; }</style><p>kept</p></body>")))(1L)
    assert(r.getAs[String]("full_text") === "kept")
    assert(r.getAs[String]("main_text") === "kept")
  }

  test("comments are stripped BEFORE tag removal: a commented-out <p> is not content") {
    val r = extract(Seq((1L,
      "<body><!-- <p>ghost</p> --><p>real</p></body>")))(1L)
    assert(r.getAs[String]("main_text") === "real")
    assert(!r.getAs[String]("full_text").contains("ghost"))
  }

  test("a commented-out <script> open tag never swallows the content after it") {
    // the round-8 trap, pinned as a unit test: comment-first stripping
    // means the lazy script regex sees no unmatched <script> here
    val r = extract(Seq((1L,
      "<body><!-- <script> --><p>real</p><script>x</script></body>")))(1L)
    assert(r.getAs[String]("main_text") === "real")
    assert(r.getAs[String]("full_text") === "real")
  }

  test("&amp;lt; decodes to the literal &lt;, never to <") {
    val r = extract(Seq((1L, "<p>a &amp;lt; b</p>")))(1L)
    assert(r.getAs[String]("full_text") === "a &lt; b")
  }

  test("link-text ratio flags a nav page; paragraph page passes the content gate") {
    val nav = "<body><a href=\"/a\">aaaa aaaa</a><a href=\"/b\">bbbb bbbb</a></body>"
    val art = "<body><div>nav</div><p>" + ("word " * 50).trim + "</p></body>"
    val m = extract(Seq((1L, nav), (2L, art)))
    assert(m(1L).getAs[Long]("n_links") === 2L)
    assert(m(1L).getAs[Long]("link_ppm") === 1000000L)
    assert(!m(1L).getAs[Boolean]("is_content"))
    assert(m(2L).getAs[Boolean]("is_content"))
    assert(m(2L).getAs[Long]("main_ppm") > 900000L)
  }

  test("anchors with inner markup count their text, not their tags") {
    val r = extract(Seq((1L,
      "<p>xx</p><a href=\"/x\"><b>bold</b> link</a>")))(1L)
    // full_text = "xx bold link" (12), link text = "bold link" (9)
    assert(r.getAs[Long]("link_ppm") === 9L * 1000000L / 12L)
  }

  test("no title, no paragraphs, empty page: empty strings and zero ratios, never nulls") {
    val m = extract(Seq((1L, "<div>bare</div>"), (2L, "")))
    assert(m(1L).getAs[String]("title") === "")
    assert(m(1L).getAs[String]("main_text") === "")
    assert(m(1L).getAs[Long]("main_ppm") === 0L)
    assert(m(2L).getAs[String]("full_text") === "")
    assert(m(2L).getAs[Long]("text_len") === 0L)
    assert(m(2L).getAs[Long]("density_ppm") === 0L)
  }

  test("tag-name prefixes never match: <article>/<aside>/<pre> are not <a>/<p>") {
    // regression: '<a[^>]*>' would swallow everything from <article> to
    // the first </a>, flagging a genuine content page as link-dominated
    val r = extract(Seq((1L,
      "<article><p>real body text of the article here</p>" +
        "<a href=\"/x\">more</a></article>" +
        "<aside>sidebar</aside><pre>code block</pre><abbr>ib.</abbr>")))(1L)
    assert(r.getAs[Long]("n_links") === 1L)
    assert(r.getAs[String]("main_text") === "real body text of the article here")
    // link text is just "more" (4 chars), not the swallowed article
    assert(r.getAs[Long]("link_ppm") < 150000L)
    assert(r.getAs[Boolean]("is_content"))
    // bare (attribute-less) anchors and paragraphs still match
    val bare = extract(Seq((2L, "<p>body</p><a>go</a>")))(2L)
    assert(bare.getAs[Long]("n_links") === 1L)
    assert(bare.getAs[String]("main_text") === "body")
  }

  test("density penalizes markup-heavy pages") {
    val lean = extract(Seq((1L, "<p>abcdefghij</p>")))(1L)
    val heavy = extract(Seq((1L,
      "<div class=\"a\"><div class=\"b\"><span><p>abcdefghij</p></span></div></div>")))(1L)
    assert(lean.getAs[Long]("density_ppm") > heavy.getAs[Long]("density_ppm"))
  }

  test("driver row: one record per document, deterministic, titles carry the decoded entity") {
    val a = HtmlOps.htmlExtract(spark, sfDir).collect()
    val b = HtmlOps.htmlExtract(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === graft.Tables.documents(spark, sfDir).count())
    assert(a.forall(_.getAs[String]("title").contains(" & ")))
    // every synthesized page has 3 anchors (nav ×2 + footer)
    assert(a.forall(_.getAs[Long]("n_links") === 3L))
  }
}
