package graft

import graft.operators.WebOps

/** Pins the web-ingest tier's parsers on crafted fixtures: closed
  * forms for every emitted count, and fail-loud behavior on each
  * corruption class (sheared tags, bogus entities, malformed robots
  * lines, truncated percent escapes, stray CSV quotes, bad sitemap
  * grammar). The sf0.01 oracle gate checks the arithmetic end to end;
  * these rows check the PARSERS reject what they must. */
class WebOpsSpec extends SparkSpecBase {

  // ------------------------------------------------------ q281 html

  private def parsedHtml(id: Long, toks: Array[String]) =
    WebOps.parseHtml(id, WebOps.encodeHtml(id, toks))

  test("html: closed forms at n=20 (all residue classes hit)") {
    val toks = (1 to 20).map(i => s"w$i").toArray
    val p = parsedHtml(42L, toks)
    assert(p.n_elements == 7 + 20 + 20 / 17 + 20 / 13) // 29
    assert(p.n_comments == 1) // i=11
    assert(p.n_entities == 2) // i=7,14
    assert(p.n_selfclosing == 1) // i=13
    assert(p.n_text_tokens == 2 + 20 + 2)
    // i=7 -> (7/7)%5=1 -> '<'; i=14 -> 2 -> '>'
    assert(p.extracted_text ==
      "doc 42 " + (1 to 20).map { i =>
        s"w$i" + (if (i == 7) " <" else if (i == 14) " >" else "")
      }.mkString(" "))
  }

  test("html: script body with bare > does not close the tag") {
    val p = parsedHtml(1L, Array("a"))
    assert(p.extracted_text == "doc 1 a") // no var/x leakage
  }

  test("html: text content is escaped and round-trips") {
    val p = parsedHtml(7L, Array("a&b", "c<d"))
    assert(p.extracted_text == "doc 7 a&b c<d")
    assert(p.n_entities == 2) // the two escapes decode back
  }

  test("html: corruption classes fail loud") {
    val good = WebOps.encodeHtml(3L, Array("x", "y", "z"))
    // shear the final close tag
    intercept[IllegalArgumentException] {
      WebOps.parseHtml(3L, good.dropRight("</html>".length))
    }
    // mismatched nesting
    intercept[IllegalArgumentException] {
      WebOps.parseHtml(3L, good.replace("</body>", "</div>"))
    }
    // bogus entity
    intercept[IllegalArgumentException] {
      WebOps.parseHtml(3L, good.replace("<body>", "<body>&bogus;"))
    }
    // unterminated comment
    intercept[IllegalArgumentException] {
      WebOps.parseHtml(3L, good.replace("<body>", "<body><!-- x"))
    }
    // malformed attribute (unquoted value)
    intercept[IllegalArgumentException] {
      WebOps.parseHtml(3L, good.replace("id=\"main\"", "id=main"))
    }
  }

  // ---------------------------------------------------- q282 robots

  test("robots: group selection — specific beats *, no merge") {
    val txt = WebOps.encodeRobots(3L, "nation_3.example") // 3%3==0
    val (rules, delay) = WebOps.parseRobots("d", txt, "GraftBot")
    assert(rules == List((false, "/"))) // only the bot group's rule
    assert(delay == 0) // bot group has no crawl-delay
    val (star, d2) = WebOps.parseRobots("d", txt, "OtherBot")
    assert(star.length == 3 && d2 == 4) // 1 + 3%5
  }

  test("robots: longest-match semantics live in the rule set") {
    val txt = WebOps.encodeRobots(1L, "x") // odd: no /search rule
    val (rules, _) = WebOps.parseRobots("x", txt, "GraftBot")
    val m = rules.filter { case (_, p) =>
      "/private/public/y.html".startsWith(p) }
    // both /private/ (disallow) and /private/public/ (allow) match;
    // the longer one is the allow
    assert(m.map(_._2).sorted == List("/private/", "/private/public/"))
    assert(m.maxBy(_._2.length)._1)
  }

  test("robots: malformed lines fail loud") {
    intercept[IllegalArgumentException] {
      WebOps.parseRobots("d", "Disallow: /x\n", "a") // rule before UA
    }
    intercept[IllegalArgumentException] {
      WebOps.parseRobots("d", "User-agent: *\nNosuch: /x\n", "a")
    }
    intercept[IllegalArgumentException] {
      WebOps.parseRobots("d", "User-agent: *\njunk line\n", "a")
    }
  }

  // ------------------------------------------------------- q283 url

  test("url: all five variants canonicalize identically") {
    val cs = (0L to 4L).map(v => WebOps.canonicalizeUrl(
      WebOps.encodeUrl(5 * 7 + v))) // g=7
    assert(cs.toSet ==
      Set("https://shop7.example/cat0/item7"))
  }

  test("url: kept query params survive, tracking ones do not") {
    assert(WebOps.canonicalizeUrl(
      "https://a.example/p?utm_source=x&id=1&fbclid=z#f") ==
      "https://a.example/p?id=1")
    assert(WebOps.canonicalizeUrl("HTTP://A.Example:80/p") ==
      "http://a.example/p")
    assert(WebOps.canonicalizeUrl("https://a.example:8443/p") ==
      "https://a.example:8443/p") // non-default port kept
    assert(WebOps.canonicalizeUrl("https://a.example/a/b/../../c") ==
      "https://a.example/c")
    assert(WebOps.canonicalizeUrl("https://a.example/%7Euser/%2Fx") ==
      "https://a.example/~user/%2Fx") // unreserved decoded, / kept
  }

  test("url: malformed escapes and missing scheme fail loud") {
    intercept[IllegalArgumentException] {
      WebOps.canonicalizeUrl("https://a.example/p%G1")
    }
    intercept[IllegalArgumentException] {
      WebOps.canonicalizeUrl("https://a.example/p%2")
    }
    intercept[IllegalArgumentException] {
      WebOps.canonicalizeUrl("no-scheme-here")
    }
  }

  // ------------------------------------------------------- q287 csv

  test("csv: closed forms at 36 fields (12 rows; every class hit)") {
    val toks = (1 to 36).map(i => s"t$i").toArray
    val p = WebOps.parseCsv(9L, WebOps.encodeCsv(toks), toks)
    val m = 36L
    assert(p.n_rows == 12 && p.n_fields == m)
    assert(p.n_quoted == m / 4 + m / 6 - m / 12 + m / 9 - m / 18)
    assert(p.n_escaped_quotes == m / 6 - m / 12)
    assert(p.n_embedded_crlf == m / 9 - m / 18)
  }

  test("csv: corruption classes fail loud") {
    val toks = (1 to 6).map(i => s"t$i").toArray
    val good = WebOps.encodeCsv(toks)
    intercept[IllegalArgumentException] { // stray quote
      WebOps.parseCsv(1L, good.replaceFirst("t1", "t\"1"), toks)
    }
    intercept[IllegalArgumentException] { // bare CR
      WebOps.parseCsv(1L, good.replace("\r\n", "\r"), toks)
    }
    intercept[IllegalArgumentException] { // truncated record
      WebOps.parseCsv(1L, good.dropRight(2), toks)
    }
    intercept[IllegalArgumentException] { // field tampering
      WebOps.parseCsv(1L, good.replaceFirst("t2", "tX"), toks)
    }
  }

  // --------------------------------------------------- q288 sitemap

  test("sitemap: closed forms for a 10-token doc") {
    val p = WebOps.parseSitemap(5L, WebOps.encodeSitemap(5L, 10))
    assert(p.n_urls == 11) // 1 + 10 % 47
    // daily when (5+i)%7==2 for i in 1..11 -> i=4,11
    assert(p.n_daily == 2)
    assert(p.priority_sum == (1 to 11).map(i => (5 + i) % 10).sum)
  }

  test("sitemap: grammar violations fail loud") {
    val good = WebOps.encodeSitemap(5L, 10)
    intercept[IllegalArgumentException] {
      WebOps.parseSitemap(5L, good.replace("</urlset>\n", ""))
    }
    intercept[IllegalArgumentException] { // bad date shape
      WebOps.parseSitemap(5L, good.replaceFirst("2026-", "2026/"))
    }
    intercept[IllegalArgumentException] { // unknown changefreq
      WebOps.parseSitemap(5L,
        good.replaceFirst("<changefreq>[a-z]+", "<changefreq>often"))
    }
  }

  // ---------------------------------------------- q306 http chunked

  test("http chunked: framing round-trip; shear classes fail loud") {
    val payload = Array.tabulate(250)(i => ((i % 91) + 32).toByte)
    val good = WebOps.encodeChunked(payload)
    val p = WebOps.parseChunked(1L, good)
    assert(p.n_chunks == 3 && p.body_bytes == 250)
    assert(p.framed_bytes == good.length && p.trailer_count == 1)
    assert(p.byte_sum == payload.map(_ & 0xff).map(_.toLong).sum)
    // shear the CRLF after the first chunk's data — every later
    // chunk would misparse; the walk stops loudly instead
    val sheared = good.clone()
    sheared("64\r\n".length + 100) = ' '.toByte
    intercept[IllegalArgumentException] {
      WebOps.parseChunked(2L, sheared)
    }
    // a non-hex size character
    val badHex = good.clone(); badHex(0) = 'G'.toByte
    intercept[IllegalArgumentException] {
      WebOps.parseChunked(3L, badHex)
    }
    // tamper the carried trailer count -> cross-check trips
    val badTrailer = new String(good, "US-ASCII")
      .replace("x-chunk-count: 3", "x-chunk-count: 2")
      .getBytes("US-ASCII")
    intercept[IllegalArgumentException] {
      WebOps.parseChunked(4L, badTrailer)
    }
    // trailing junk after the trailer section
    intercept[IllegalArgumentException] {
      WebOps.parseChunked(5L, good ++ "zz".getBytes("US-ASCII"))
    }
  }

  // -------------------------------------------------- q305 data uri

  test("data-uri: padding classes round-trip; strictness bites") {
    for (len <- Seq(3, 4, 5, 6, 1)) {
      val payload = Array.tabulate(len)(i => (i * 37 + 5).toByte)
      val p = WebOps.parseDataUri(1L, WebOps.encodeDataUri(payload))
      assert(p.decoded_bytes == len)
      assert(p.b64_chars == 4 * ((len + 2) / 3))
      assert(p.pad_chars == (3 - len % 3) % 3)
      assert(p.byte_sum == payload.map(_ & 0xff).map(_.toLong).sum)
    }
    // the canonical-form channel: QQ== is 'A', QR== smuggles bits
    assert(WebOps.parseDataUri(2L,
      "data:text/plain;base64,QQ==").byte_sum == 'A'.toLong)
    intercept[IllegalArgumentException] {
      WebOps.parseDataUri(3L, "data:text/plain;base64,QR==")
    }
    intercept[IllegalArgumentException] { // invalid alphabet char
      WebOps.parseDataUri(4L, "data:text/plain;base64,QUJ*")
    }
    intercept[IllegalArgumentException] { // length not mod 4
      WebOps.parseDataUri(5L, "data:text/plain;base64,QUJ")
    }
    intercept[IllegalArgumentException] { // padding before the end
      WebOps.parseDataUri(6L, "data:text/plain;base64,Q=JD")
    }
    intercept[IllegalArgumentException] { // not base64-marked
      WebOps.parseDataUri(7L, "data:text/plain,hello")
    }
  }

  // -------------------------------------------- end-to-end plumbing

  test("web queries run end-to-end at sf0.001 with rows > 0") {
    Seq("q281_html_extract", "q282_robots_rules",
      "q283_url_canonicalize", "q287_csv_strict",
      "q288_sitemap_parse").foreach { q =>
      assert(WebOps.queries(q)(spark, sfDir).count() > 0, q)
    }
  }
}
