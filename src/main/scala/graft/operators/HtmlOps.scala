package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** HTML → text boilerplate extraction — the web-crawl analog of the
  * reference's blob-in/features-out extractor suite
  * (`tests/test_extractors.py:152-338` is the shape: opaque payload in,
  * typed record out, empty record for unparsable input).
  *
  * A crawl-scale pipeline runs this on every fetched page before any
  * dedup or quality gate, so the whole family is ONE codegen'd string
  * projection per document — regex/array expressions only, no UDF, no
  * shuffle, nothing but the scan: the shape that runs over billions of
  * pages unchanged. Stages, in the order a boilerplate pipeline wants
  * them:
  *
  *  1. comment removal (`<!-- … -->` may hide tags — stripped FIRST so
  *     a commented-out `<p>` never counts as content AND a
  *     commented-out `<script>` open tag never fools the lazy script
  *     regex into swallowing real content up to the next real
  *     `</script>`; the fixture plants exactly that trap);
  *  2. script/style removal — lazy-quantifier block strip, one pass per
  *     tag kind (NO backreferences: the oracle engine's RE2 has none,
  *     and two anchored passes codegen tighter anyway);
  *  3. tag strip + entity decode (the five core entities; `&amp;`
  *     decoded LAST so `&amp;lt;` survives as the literal `&lt;`) +
  *     whitespace collapse — yields `full_text`;
  *  4. main-content heuristic: body text = the `<p>` block contents
  *     (template chrome — nav bars, footers, headings — lives outside
  *     paragraphs in template HTML), ratio reported as `main_ppm`;
  *  5. link-text ratio: anchor-text chars over total text chars
  *     (`link_ppm`) — the classic nav/list-page discriminator;
  *  6. text density: extracted chars over raw HTML chars
  *     (`density_ppm`) — markup-heavy pages score low;
  *  7. the keep verdict `is_content`: paragraph-dominated and not
  *     link-dominated, the gate a crawl curation pass consumes.
  *
  * Ratios are exact integer ppm (floor division) — no FP in the
  * hash-checked output, same discipline as [[DedupOps.dupProfile]].
  */
object HtmlOps {

  /** Deterministic HTML wrapper over the documents table — the fixture
    * generator for the driver row (the corpus carries plain text, so
    * the page structure is synthesized from table columns exactly like
    * [[ExtractOps.cifFiles]] synthesizes CIF payloads). Exercises every
    * stage: title with an entity, style + script blocks (the script
    * contains a `<` comparison and tag-bearing string literals), a nav
    * and a footer of anchors, an attributed `<p>`, an entity-bearing
    * second paragraph, and a comment hiding a fake `<p>`. */
  def htmlPages(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit(" &amp; "), col("source"), lit("</title>"),
        lit("<style type=\"text/css\">body { margin: 0; }</style></head>"),
        lit("<body><div class=\"nav\"><a href=\"/home\">home</a> "),
        lit("<a href=\"/s/"), col("source"), lit("\">all "), col("source"),
        lit(" docs</a></div><h1>"), upper(col("source")), lit("</h1>"),
        lit("<p id=\"m1\">"), col("text"), lit("</p>"),
        lit("<!-- <script> trap --><p>lang: "), col("lang"), lit("&nbsp;&#39;rated&#39;</p>"),
        lit("<script type=\"text/javascript\">if (1 < 2) { x = \"<b>y</b>\"; }</script>"),
        lit("<!-- hidden <p>comment</p> -->"),
        lit("<div class=\"footer\"><a href=\"/terms\">terms</a></div></body></html>"))
        .as("html"))

  private def normWs(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\n\\r]+", " "))

  /** The five core entities; `&amp;` last so `&amp;lt;` decodes to the
    * literal `&lt;`, not `<`. */
  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
  }

  private def stripTags(c: Column): Column =
    regexp_replace(c, "<[^>]*>", " ")

  /** Generic API: the full extraction record for any (idCol, htmlCol)
    * frame. One projection — every column below is derived from the
    * same three string passes, and whole-stage codegen fuses them. */
  def htmlTextOf(pages: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val raw = col(htmlCol)
    // Comments strip FIRST so a commented-out <script> open tag cannot
    // make the lazy script regex swallow real content. The deliberate
    // tradeoff (any regex HTML pass has one): a bare `<!--` literal
    // inside live JS now eats to the next `-->` elsewhere in the page.
    // That's the conventional order (browsers also treat `<!--` inside
    // scripts as historical comment syntax); do not swap it back.
    val noComment = regexp_replace(raw, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script(?:\\s[^>]*)?>.*?</script>", " ")
    val clean = regexp_replace(noScript, "(?is)<style(?:\\s[^>]*)?>.*?</style>", " ")
    val fullText = normWs(decodeEntities(stripTags(clean)))
    val anchors = regexp_extract_all(clean, lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1))
    val linkText = normWs(decodeEntities(stripTags(array_join(anchors, " "))))
    val paras = regexp_extract_all(clean, lit("(?is)<p(?:\\s[^>]*)?>(.*?)</p>"), lit(1))
    val mainText = normWs(decodeEntities(stripTags(array_join(paras, " "))))
    val title = normWs(decodeEntities(
      regexp_extract(raw, "(?is)<title(?:\\s[^>]*)?>(.*?)</title>", 1)))
    pages.select(
      col(idCol),
      title.as("title"),
      fullText.as("full_text"),
      mainText.as("main_text"),
      size(anchors).cast("long").as("n_links"),
      length(fullText).cast("long").as("text_len"),
      linkText.as("lt"), raw.as("raw"))
      .withColumn("density_ppm",
        expr("length(full_text) * 1000000L div greatest(length(raw), 1)"))
      .withColumn("link_ppm",
        expr("length(lt) * 1000000L div greatest(text_len, 1)"))
      .withColumn("main_ppm",
        expr("length(main_text) * 1000000L div greatest(text_len, 1)"))
      .withColumn("is_content",
        col("main_ppm") >= 500000 && col("link_ppm") <= 300000)
      .drop("lt", "raw")
  }

  def htmlExtract(s: SparkSession, dir: String): DataFrame =
    htmlTextOf(htmlPages(s, dir), "doc_id", "html").orderBy("doc_id")

  /** Oracle: the identical wrapper + passes in DuckDB SQL (RE2 needs
    * the explicit 'g' flag where Java replaces globally by default). */
  val htmlExtractSql: String =
    s"""WITH pages AS (
       |  SELECT doc_id,
       |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; ' ||
       |    source || '</title>' ||
       |    '<style type="text/css">body { margin: 0; }</style></head>' ||
       |    '<body><div class="nav"><a href="/home">home</a> ' ||
       |    '<a href="/s/' || source || '">all ' || source ||
       |    ' docs</a></div><h1>' || upper(source) || '</h1>' ||
       |    '<p id="m1">' || text || '</p>' ||
       |    '<!-- <script> trap --><p>lang: ' || lang || '&nbsp;&#39;rated&#39;</p>' ||
       |    '<script type="text/javascript">if (1 < 2) { x = "<b>y</b>"; }</script>' ||
       |    '<!-- hidden <p>comment</p> -->' ||
       |    '<div class="footer"><a href="/terms">terms</a></div></body></html>'
       |    AS html
       |  FROM documents),
       |cleaned AS (
       |  SELECT doc_id, html,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?s)<!--.*?-->', ' ', 'g'),
       |      '(?is)<script(?:\\s[^>]*)?>.*?</script>', ' ', 'g'),
       |      '(?is)<style(?:\\s[^>]*)?>.*?</style>', ' ', 'g') AS clean
       |  FROM pages),
       |fields AS (
       |  SELECT doc_id, html, clean,
       |    regexp_extract_all(clean, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1) AS anchors,
       |    regexp_extract_all(clean, '(?is)<p(?:\\s[^>]*)?>(.*?)</p>', 1) AS paras,
       |    regexp_extract(html, '(?is)<title(?:\\s[^>]*)?>(.*?)</title>', 1) AS raw_title
       |  FROM cleaned),
       |norm AS (
       |  SELECT doc_id, html,
       |    trim(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |        regexp_replace(regexp_replace(regexp_replace(clean,
       |        '<[^>]*>', ' ', 'g'),
       |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
       |      '[ \\t\\n\\r]+', ' ', 'g')) AS full_text,
       |    trim(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |        regexp_replace(regexp_replace(regexp_replace(raw_title,
       |        '<[^>]*>', ' ', 'g'),
       |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
       |      '[ \\t\\n\\r]+', ' ', 'g')) AS title,
       |    trim(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |        regexp_replace(regexp_replace(regexp_replace(
       |        array_to_string(paras, ' '), '<[^>]*>', ' ', 'g'),
       |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
       |      '[ \\t\\n\\r]+', ' ', 'g')) AS main_text,
       |    trim(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |        regexp_replace(regexp_replace(regexp_replace(
       |        array_to_string(anchors, ' '), '<[^>]*>', ' ', 'g'),
       |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
       |      '[ \\t\\n\\r]+', ' ', 'g')) AS link_text,
       |    CAST(len(anchors) AS BIGINT) AS n_links
       |  FROM fields)
       |SELECT doc_id, title, full_text, main_text, n_links,
       |  CAST(length(full_text) AS BIGINT) AS text_len,
       |  CAST(length(full_text) AS BIGINT) * 1000000
       |    // greatest(CAST(length(html) AS BIGINT), 1) AS density_ppm,
       |  CAST(length(link_text) AS BIGINT) * 1000000
       |    // greatest(CAST(length(full_text) AS BIGINT), 1) AS link_ppm,
       |  CAST(length(main_text) AS BIGINT) * 1000000
       |    // greatest(CAST(length(full_text) AS BIGINT), 1) AS main_ppm,
       |  (CAST(length(main_text) AS BIGINT) * 1000000
       |    // greatest(CAST(length(full_text) AS BIGINT), 1) >= 500000
       |   AND CAST(length(link_text) AS BIGINT) * 1000000
       |    // greatest(CAST(length(full_text) AS BIGINT), 1) <= 300000)
       |    AS is_content
       |FROM norm ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (htmlExtract _))

  def oracles: Map[String, String] = Map(
    "q_html_extract" -> htmlExtractSql)
}
