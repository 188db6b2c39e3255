package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Web-corpus ingest operators — the tier between a crawl dump and a
  * text pipeline (SURVEY.md §7.4 north-star): HTML boilerplate
  * extraction, robots.txt rule evaluation, URL canonicalization for
  * crawl-level dedup, strict RFC 4180 CSV round-trip, and sitemap XML
  * parsing. Every fixture is synthesized deterministically from the
  * TPC-H-ish tables (same doc/text bytes the oracle sees), every
  * parser is REAL and fail-loud, and every emitted column is
  * closed-form arithmetic the DuckDB oracle replays exactly.
  *
  * Scale shape: all five are narrow per-row (or per-small-group)
  * transforms — the parse work rides whole-stage-adjacent typed
  * mapPartitions, joins are broadcast (25-domain rule tables), and
  * the only shuffles are keyed aggs on bounded domains. At 100 TB the
  * unit of parallelism is the document / the domain, exactly how a
  * production extraction fleet shards.
  */
object WebOps {

  type Q = (SparkSession, String) => DataFrame

  // ----------------------------------------------------------------
  // q281 — HTML text extraction
  // ----------------------------------------------------------------

  private val HtmlTags = Array("p", "b", "i", "span", "div")
  private val EntNames = Array("&amp;", "&lt;", "&gt;", "&quot;", "&#x41;")
  private val EntChars = Array("&", "<", ">", "\"", "A")

  /** Escape text content the way any conformant HTML writer must.
    * The synthetic corpus contains no `&<>` (verified), so the
    * closed-form entity counts hold; if upstream data ever grows
    * them, the counts move and the oracle catches it. */
  private def escHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** HTML fixture encoder — a full page around the doc's tokens:
    * DOCTYPE, head with title/script/style (script body contains a
    * bare `>` — the classic naive-scanner trap), a nested body div,
    * one element per token with class attributes, comments every
    * 11th token, an `<em>` nesting every 17th, a self-closed
    * `<img/>` every 13th, and a standalone entity text node every
    * 7th (cycling named, quoted and numeric forms). */
  private[graft] def encodeHtml(docId: Long, toks: Array[String])
      : String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>")
    sb.append("<html><head><title>doc ").append(docId)
      .append("</title>")
    sb.append("<script type=\"text/javascript\">var x = 1; ")
      .append("if (x > 0) { x = x * 2; }</script>")
    sb.append("<style>p { color: red; }</style>")
    sb.append("</head><body><div id=\"main\">")
    var i = 1
    while (i <= toks.length) {
      if (i % 11 == 0) sb.append("<!-- skip ").append(i).append(" -->")
      val tag = HtmlTags(i % 5)
      val wrapped = i % 17 == 0
      if (wrapped) sb.append("<em>")
      sb.append('<').append(tag).append(" class=\"k").append(i % 3)
        .append("\">").append(escHtml(toks(i - 1)))
        .append("</").append(tag).append('>')
      if (wrapped) sb.append("</em>")
      if (i % 13 == 0)
        sb.append("<img src=\"i").append(i).append(".png\" alt=\"\"/>")
      if (i % 7 == 0) sb.append(EntNames((i / 7) % 5))
      i += 1
    }
    sb.append("</div></body></html>")
    sb.toString
  }

  final case class HtmlParsed(doc_id: Long, n_elements: Long,
      n_comments: Long, n_entities: Long, n_selfclosing: Long,
      n_text_tokens: Long, extracted_text: String)

  /** REAL strict HTML walk — tag stack with matched-close
    * enforcement, raw-text handling for script/style (a `>` inside
    * script must NOT close the tag), comment and DOCTYPE grammar,
    * quoted attributes, self-closing syntax, and strict entity
    * decoding (named, decimal, hex — anything else throws). Text
    * nodes outside script/style/comments are entity-decoded,
    * whitespace-tokenized and joined — the boilerplate-stripping
    * pass every web corpus runs first. */
  private[graft] def parseHtml(docId: Long, html: String)
      : HtmlParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"html parse [$docId]: $why")
    val n = html.length
    var i = 0
    var elements = 0L; var comments = 0L; var entities = 0L
    var selfClosing = 0L
    val stack = new scala.collection.mutable.ArrayDeque[String]()
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val text = new StringBuilder
    def flushText(): Unit = {
      val parts = text.toString.split("\\s+")
      parts.foreach(p => if (p.nonEmpty) toks += p)
      text.setLength(0)
    }
    def isNameChar(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    def readName(from: Int): (String, Int) = {
      var j = from
      while (j < n && isNameChar(html(j))) j += 1
      if (j == from) fail(s"empty tag name at $from")
      (html.substring(from, j), j)
    }
    while (i < n) {
      val c = html(i)
      if (c == '<') {
        flushText()
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          if (e < 0) fail("unterminated comment")
          comments += 1; i = e + 3
        } else if (html.startsWith("<!", i)) {
          val e = html.indexOf('>', i + 2)
          if (e < 0) fail("unterminated declaration")
          if (!html.substring(i + 2, e).toUpperCase.startsWith("DOCTYPE"))
            fail("unknown <! declaration")
          i = e + 1
        } else if (html.startsWith("</", i)) {
          val (name, j) = readName(i + 2)
          if (j >= n || html(j) != '>') fail(s"malformed close </$name")
          if (stack.isEmpty) fail(s"close </$name> with empty stack")
          val top = stack.removeLast()
          if (top != name) fail(s"close </$name> but open <$top>")
          i = j + 1
        } else {
          val (name, j0) = readName(i + 1)
          var j = j0
          var closed = false
          var done = false
          while (!done) {
            while (j < n && html(j) == ' ') j += 1
            if (j >= n) fail(s"unterminated tag <$name")
            if (html(j) == '/') {
              if (j + 1 >= n || html(j + 1) != '>')
                fail(s"bad self-close in <$name")
              closed = true; j += 2; done = true
            } else if (html(j) == '>') { j += 1; done = true }
            else {
              var k = j
              while (k < n && (isNameChar(html(k)) || html(k) == '-'))
                k += 1
              if (k == j || k >= n || html(k) != '=' ||
                  k + 1 >= n || html(k + 1) != '"')
                fail(s"malformed attribute in <$name> at $j")
              val vEnd = html.indexOf('"', k + 2)
              if (vEnd < 0) fail(s"unterminated attribute in <$name>")
              j = vEnd + 1
            }
          }
          elements += 1
          i = j
          if (closed) selfClosing += 1
          else if (name == "script" || name == "style") {
            val marker = s"</$name>"
            val e = html.indexOf(marker, j)
            if (e < 0) fail(s"unterminated raw-text <$name>")
            i = e + marker.length
          } else stack.append(name)
        }
      } else if (c == '&') {
        val e = html.indexOf(';', i + 1)
        if (e < 0 || e - i > 12) fail(s"bad entity at $i")
        val body = html.substring(i + 1, e)
        val decoded = body match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case _ if body.startsWith("#x") || body.startsWith("#X") =>
            val cp = Integer.parseInt(body.substring(2), 16)
            new String(Character.toChars(cp))
          case _ if body.startsWith("#") =>
            val cp = Integer.parseInt(body.substring(1), 10)
            new String(Character.toChars(cp))
          case other => fail(s"unknown entity &$other;")
        }
        entities += 1
        text.append(decoded)
        i = e + 1
      } else { text.append(c); i += 1 }
    }
    flushText()
    if (stack.nonEmpty) fail(s"unclosed <${stack.last}> at EOF")
    HtmlParsed(docId, elements, comments, entities, selfClosing,
      toks.length.toLong, toks.mkString(" "))
  }

  /** q281's pipeline: tokenize → synthesize the page → strict parse
    * back; narrow per-row work, no shuffle. */
  def htmlExtract(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+")
        parseHtml(id, encodeHtml(id, toks))
      })
      .toDF()
  }

  // ----------------------------------------------------------------
  // q282 — robots.txt evaluation
  // ----------------------------------------------------------------

  private val UrlPaths = Array("/", "/private/x.html",
    "/private/public/y.html", "/search?q=q", "/tmp/f.txt",
    "/docs/d.html")

  /** robots.txt fixture per nation k: a `*` group with overlapping
    * Allow/Disallow prefixes (longest-match is load-bearing for the
    * /private/public/ path), an even-k /search rule, a crawl-delay,
    * and for k % 3 == 0 a bot-specific group in UPPERCASE field
    * names (case-insensitive grammar is part of the spec). */
  private[graft] def encodeRobots(k: Long, domain: String): String = {
    val sb = new StringBuilder
    sb.append("# robots for ").append(domain).append('\n')
    sb.append("User-agent: *\n")
    sb.append("Disallow: /private/\n")
    sb.append("Disallow: /tmp/\n")
    sb.append("Allow: /private/public/\n")
    if (k % 2 == 0) sb.append("Disallow: /search\n")
    sb.append("Crawl-delay: ").append(1 + k % 5).append('\n')
    if (k % 3 == 0) {
      sb.append('\n')
      sb.append("USER-AGENT: GraftBot\n")
      sb.append("DISALLOW: /\n")
    }
    sb.toString
  }

  private final case class RobotGroup(
      agents: List[String],
      rules: List[(Boolean, String)],
      delay: Option[Int])

  /** REAL RFC 9309-shaped parse + group selection: line grammar
    * (blank / # comment / field: value, unknown fields fail loud on
    * this fixture), user-agent lines open a group (consecutive UA
    * lines share it), and the agent's group is the specific-name
    * match if one exists, else the `*` group — rules from the two
    * are never merged, which is the mistake naive crawlers make.
    * Returns (selected rules, crawl-delay or 0). */
  private[graft] def parseRobots(domain: String, txt: String,
      agent: String): (List[(Boolean, String)], Int) = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"robots parse [$domain]: $why")
    val groups = scala.collection.mutable.ArrayBuffer.empty[RobotGroup]
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var delay: Option[Int] = None
    var inAgents = false
    var open = false
    def close(): Unit = {
      if (open) {
        if (agents.isEmpty) fail("rules before any user-agent")
        groups += RobotGroup(agents.reverse, rules.reverse, delay)
      }
      agents = Nil; rules = Nil; delay = None; open = false
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) ()
      else line.split(":", 2) match {
        case Array(f, v) =>
          val field = f.trim.toLowerCase
          val value = v.trim
          field match {
            case "user-agent" =>
              if (!inAgents) { close(); open = true }
              agents = value.toLowerCase :: agents
              inAgents = true
            case "allow" =>
              if (!open) fail("allow before user-agent")
              rules = (true, value) :: rules; inAgents = false
            case "disallow" =>
              if (!open) fail("disallow before user-agent")
              rules = (false, value) :: rules; inAgents = false
            case "crawl-delay" =>
              if (!open) fail("crawl-delay before user-agent")
              delay = Some(value.toInt); inAgents = false
            case other => fail(s"unknown field '$other'")
          }
        case _ => fail(s"malformed line '$line'")
      }
    }
    close()
    val a = agent.toLowerCase
    val specific = groups.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    val sel = chosen.flatMap(_.rules).toList
    val d = chosen.flatMap(_.delay).headOption.getOrElse(0)
    (sel, d)
  }

  /** q282's pipeline: parse 25 per-domain robots files, broadcast
    * the selected rule table, evaluate every customer URL by RFC
    * longest-match (allow wins ties) — the rule join is broadcast,
    * the verdict is one keyed max(struct) agg, default-allow rides
    * the left join. At 100 TB the URL side is the big table and
    * this exact shape holds. */
  def robotsEvaluate(nation: DataFrame, customer: DataFrame)
      : DataFrame = {
    val spark = nation.sparkSession
    import spark.implicits._
    val rules = nation
      .select(col("n_nationkey").cast("long"), lower(col("n_name")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (k, nm) =>
        val domain = nm + ".example"
        val (sel, d) = parseRobots(domain,
          encodeRobots(k, domain), "GraftBot")
        sel.map { case (allow, p) =>
          (domain, p, allow, p.length, d)
        }
      })
      .toDF("domain", "rule", "is_allow", "rlen", "delay")
    val delays = rules.select("domain", "delay").distinct()
    val urls = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").cast("long").as("c_custkey"),
        concat(lower(col("n_name")), lit(".example")).as("domain"),
        element_at(typedLit(UrlPaths),
          (col("c_custkey") % 6 + 1).cast("int")).as("path"))
    val r2 = rules.drop("delay").withColumnRenamed("domain", "r_domain")
    urls
      .join(broadcast(r2),
        urls("domain") === col("r_domain") &&
          expr("startswith(path, rule)"), "left")
      .drop("r_domain")
      .groupBy("c_custkey", "domain", "path")
      .agg(max(struct(col("rlen"), col("is_allow"), col("rule")))
        .as("m"))
      .join(broadcast(delays), "domain")
      .select(col("c_custkey"), col("domain"), col("path"),
        coalesce(col("m.is_allow"), lit(true)).as("allowed"),
        coalesce(col("m.rule"), lit("")).as("matched_rule"),
        coalesce(col("m.rlen"), lit(0)).cast("int").as("rule_len"),
        col("delay").cast("int").as("crawl_delay"))
      .orderBy("c_custkey")
  }

  // ----------------------------------------------------------------
  // q283 — URL canonicalization
  // ----------------------------------------------------------------

  /** Messy-variant fixture: five raw spellings of the same logical
    * URL per canonical group g = orderkey div 5 — clean, cased +
    * default port, www-prefixed, dot-segmented, percent-encoded +
    * tracking query + fragment. */
  private[graft] def encodeUrl(k: Long): String = {
    val g = k / 5
    val host = s"shop${g % 50}.example"
    val path = s"/cat${g % 7}/item$g"
    (k % 5) match {
      case 0 => s"https://$host$path"
      case 1 => s"HTTPS://${host.toUpperCase}:443$path"
      case 2 => s"https://www.$host$path"
      case 3 =>
        val p = s"/a/../cat${g % 7}/./item$g"
        s"https://$host$p"
      case _ =>
        val p = s"/cat${g % 7}/%69tem$g"
        s"https://$host$p?utm_source=feed&utm_id=$k#sec$k"
    }
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' ||
      c == '~'

  /** REAL RFC 3986 normalizer: scheme/host lowercasing, default-port
    * strip, percent-decoding of unreserved octets (other escapes
    * uppercased), the §5.2.4 remove-dot-segments algorithm, tracking
    * parameter removal (utm_* / gclid / fbclid — the corpus-dedup
    * rule), fragment strip, and a documented www-strip corpus rule.
    * Malformed escapes and missing scheme/host fail loud. */
  private[graft] def canonicalizeUrl(raw: String): String = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"url canonicalize [$raw]: $why")
    val si = raw.indexOf("://")
    if (si <= 0) fail("missing scheme")
    val scheme = raw.substring(0, si).toLowerCase
    var rest = raw.substring(si + 3)
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) rest = rest.substring(0, hashAt)
    val qAt = rest.indexOf('?')
    val query = if (qAt >= 0) rest.substring(qAt + 1) else ""
    if (qAt >= 0) rest = rest.substring(0, qAt)
    val slashAt = rest.indexOf('/')
    val (auth, path0) =
      if (slashAt < 0) (rest, "/")
      else (rest.substring(0, slashAt), rest.substring(slashAt))
    if (auth.isEmpty) fail("empty authority")
    val (host0, port) = auth.lastIndexOf(':') match {
      case -1 => (auth, -1)
      case p =>
        val ps = auth.substring(p + 1)
        if (!ps.forall(_.isDigit) || ps.isEmpty)
          fail(s"bad port '$ps'")
        (auth.substring(0, p), ps.toInt)
    }
    var host = host0.toLowerCase
    if (host.startsWith("www.") && host.length > 4)
      host = host.substring(4)
    val defaultPort = scheme match {
      case "http" => 80
      case "https" => 443
      case _ => -1
    }
    val portPart =
      if (port < 0 || port == defaultPort) "" else s":$port"
    // percent-decode unreserved, uppercase surviving escapes
    def decodeEscapes(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '%') {
          if (i + 2 >= s.length + 1 || i + 3 > s.length)
            fail("truncated percent escape")
          val hex = s.substring(i + 1, i + 3)
          val v =
            try Integer.parseInt(hex, 16)
            catch { case _: NumberFormatException =>
              fail(s"bad percent escape %$hex") }
          if (isUnreserved(v.toChar)) sb.append(v.toChar)
          else sb.append('%').append(hex.toUpperCase)
          i += 3
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }
    // RFC 3986 §5.2.4 remove_dot_segments
    def removeDotSegments(p: String): String = {
      var in = p
      val out = new StringBuilder
      while (in.nonEmpty) {
        if (in.startsWith("../")) in = in.substring(3)
        else if (in.startsWith("./")) in = in.substring(2)
        else if (in.startsWith("/./")) in = "/" + in.substring(3)
        else if (in == "/.") in = "/"
        else if (in.startsWith("/../") || in == "/..") {
          in = if (in == "/..") "/" else "/" + in.substring(4)
          val cut = out.lastIndexOf("/")
          out.setLength(if (cut < 0) 0 else cut)
        } else if (in == "." || in == "..") in = ""
        else {
          val from = if (in.startsWith("/")) 1 else 0
          val next = in.indexOf('/', from)
          val seg = if (next < 0) in else in.substring(0, next)
          out.append(seg)
          in = if (next < 0) "" else in.substring(next)
        }
      }
      out.toString
    }
    val path = removeDotSegments(decodeEscapes(path0))
    val keptQuery = query.split("&").filter(_.nonEmpty).filterNot { p =>
      val name = p.split("=", 2)(0).toLowerCase
      name.startsWith("utm_") || name == "gclid" || name == "fbclid"
    }
    val queryPart =
      if (keptQuery.isEmpty) "" else "?" + keptQuery.mkString("&")
    s"$scheme://$host$portPart$path$queryPart"
  }

  /** q283's pipeline: canonicalize every frontier URL (narrow map),
    * then ONE groupBy on the canonical key — the crawl-level dedup
    * that must precede content fetch at 100 TB (5 raw spellings
    * collapse to 1 fetch). */
  def urlCanonicalize(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders.select(col("o_orderkey").cast("long"))
      .as[Long]
      .mapPartitions(_.map { k =>
        (k, canonicalizeUrl(encodeUrl(k)), k % 5)
      })
      .toDF("k", "canonical_url", "variant")
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("variant")).as("n_variants"),
        min(col("k")).as("first_orderkey"))
      .orderBy("canonical_url")
  }

  // ----------------------------------------------------------------
  // q287 — strict RFC 4180 CSV round-trip
  // ----------------------------------------------------------------

  /** Field value for global 1-based field index m over token t —
    * mutations plant the three quoting triggers on disjoint index
    * classes (%4 comma, %6 quote, %9 CRLF; earlier class wins) so
    * every count is floor arithmetic in the field total. */
  private[graft] def csvField(t: String, m: Long): String =
    if (m % 4 == 0) t + ",z"
    else if (m % 6 == 0) t + "\"z"
    else if (m % 9 == 0) t + "\r\nz"
    else t

  private def needsQuote(s: String): Boolean =
    s.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n')

  /** RFC 4180 writer: 3 fields per record, CRLF terminators, quote
    * when needed, double embedded quotes. */
  private[graft] def encodeCsv(toks: Array[String]): String = {
    val rows = toks.length / 3
    val sb = new StringBuilder
    var r = 0
    while (r < rows) {
      var j = 0
      while (j < 3) {
        val m = 3L * r + j + 1
        val v = csvField(toks(3 * r + j), m)
        if (needsQuote(v))
          sb.append('"').append(v.replace("\"", "\"\"")).append('"')
        else sb.append(v)
        if (j < 2) sb.append(',')
        j += 1
      }
      sb.append("\r\n")
      r += 1
    }
    sb.toString
  }

  final case class CsvParsed(doc_id: Long, n_rows: Long,
      n_fields: Long, n_quoted: Long, n_escaped_quotes: Long,
      n_embedded_crlf: Long, total_field_chars: Long)

  /** REAL RFC 4180 state machine: quoted fields (embedded comma /
    * doubled quote / CRLF), strict structure (3 fields per record,
    * CR always followed by LF, a quote opening a field only at
    * field start, after a closing quote only `,` or CRLF). The
    * parsed fields are verified against the mutated originals —
    * a reader that mis-handles any corner fails loud. */
  private[graft] def parseCsv(docId: Long, csv: String,
      toks: Array[String]): CsvParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"csv parse [$docId]: $why")
    var i = 0
    val n = csv.length
    var rows = 0L; var fields = 0L; var quoted = 0L
    var escQuotes = 0L; var crlf = 0L; var chars = 0L
    var fieldInRow = 0
    val sb = new StringBuilder
    def endField(wasQuoted: Boolean): Unit = {
      val v = sb.toString
      val m = fields + 1
      val expect = csvField(toks(fields.toInt), m)
      if (v != expect)
        fail(s"field $m round-trip mismatch: '$v' != '$expect'")
      if (wasQuoted) quoted += 1
      chars += v.length
      fields += 1
      fieldInRow += 1
      sb.setLength(0)
    }
    def endRow(): Unit = {
      if (fieldInRow != 3) fail(s"row $rows has $fieldInRow fields")
      rows += 1; fieldInRow = 0
    }
    while (i < n) {
      if (csv(i) == '"') {
        if (sb.nonEmpty) fail(s"quote inside unquoted field at $i")
        i += 1
        var closed = false
        while (!closed) {
          if (i >= n) fail("unterminated quoted field")
          val c = csv(i)
          if (c == '"') {
            if (i + 1 < n && csv(i + 1) == '"') {
              sb.append('"'); escQuotes += 1; i += 2
            } else { closed = true; i += 1 }
          } else {
            if (c == '\r') {
              if (i + 1 >= n || csv(i + 1) != '\n')
                fail("bare CR in quoted field")
              crlf += 1
            }
            sb.append(c); i += 1
          }
        }
        endField(wasQuoted = true)
        if (i >= n) fail("record missing CRLF terminator")
        csv(i) match {
          case ',' => i += 1
          case '\r' =>
            if (i + 1 >= n || csv(i + 1) != '\n')
              fail("CR not followed by LF")
            endRow(); i += 2
          case other => fail(s"unexpected '$other' after quote close")
        }
      } else {
        var done = false
        while (!done) {
          if (i >= n) fail("record missing CRLF terminator")
          csv(i) match {
            case ',' => endField(wasQuoted = false); i += 1; done = true
            case '\r' =>
              if (i + 1 >= n || csv(i + 1) != '\n')
                fail("CR not followed by LF")
              endField(wasQuoted = false); endRow(); i += 2; done = true
            case '"' => fail(s"stray quote at $i")
            case c => sb.append(c); i += 1
          }
        }
      }
    }
    if (fieldInRow != 0) fail("trailing partial record")
    CsvParsed(docId, rows, fields, quoted, escQuotes, crlf, chars)
  }

  /** q287's pipeline: tokenize → write strict CSV → parse back with
    * per-field round-trip verification; narrow per-row work. */
  def csvRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+")
        val used = toks.take(toks.length / 3 * 3)
        if (used.isEmpty) Iterator.empty
        else Iterator(parseCsv(id, encodeCsv(used), used))
      })
      .toDF()
  }

  // ----------------------------------------------------------------
  // q288 — sitemap XML parse
  // ----------------------------------------------------------------

  private val ChangeFreqs = Array("always", "hourly", "daily",
    "weekly", "monthly", "yearly", "never")

  /** Sitemap fixture for doc d: 1 + (n_tokens % 47) url entries,
    * every per-url feature arithmetic in (doc_id + i). */
  private[graft] def encodeSitemap(docId: Long, nToks: Int): String = {
    val nUrls = 1 + nToks % 47
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/")
      .append("sitemap/0.9\">\n")
    var i = 1
    while (i <= nUrls) {
      val v = docId + i
      sb.append("  <url><loc>https://d").append(docId)
        .append(".example/p").append(i).append("</loc>")
      sb.append("<lastmod>2026-")
        .append(f"${1 + v % 12}%02d-${1 + v % 28}%02d")
        .append("</lastmod>")
      sb.append("<changefreq>").append(ChangeFreqs((v % 7).toInt))
        .append("</changefreq>")
      sb.append("<priority>0.").append(v % 10).append("</priority>")
      sb.append("</url>\n")
      i += 1
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  final case class SitemapParsed(doc_id: Long, n_urls: Long,
      n_daily: Long, priority_sum: Long, latest_lastmod: String,
      loc_chars: Long)

  private val UrlEntryRe =
    ("""<url><loc>([^<]+)</loc><lastmod>(\d{4}-\d{2}-\d{2})""" +
      """</lastmod><changefreq>([a-z]+)</changefreq>""" +
      """<priority>0\.(\d)</priority></url>""").r

  /** Strict sitemap-protocol parse: XML prolog, one urlset with the
    * sitemaps.org namespace, url entries in the canonical child
    * order with typed lastmod/changefreq/priority grammars — any
    * deviation (bad date shape, unknown changefreq, stray markup)
    * fails loud. */
  private[graft] def parseSitemap(docId: Long, xml: String)
      : SitemapParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"sitemap parse [$docId]: $why")
    val lines = xml.split("\n", -1)
    if (lines.length < 4) fail("too short")
    if (lines(0) != "<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
      fail("bad prolog")
    if (lines(1) !=
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">")
      fail("bad urlset open")
    var li = 2
    var urls = 0L; var daily = 0L; var pSum = 0L; var locChars = 0L
    var latest = ""
    while (li < lines.length && lines(li).trim.startsWith("<url>")) {
      lines(li).trim match {
        case UrlEntryRe(loc, lastmod, cf, pr) =>
          if (!ChangeFreqs.contains(cf)) fail(s"bad changefreq '$cf'")
          urls += 1
          if (cf == "daily") daily += 1
          pSum += pr.toLong
          locChars += loc.length
          if (lastmod > latest) latest = lastmod
        case other => fail(s"bad url entry '$other'")
      }
      li += 1
    }
    if (li >= lines.length || lines(li) != "</urlset>")
      fail("missing </urlset>")
    if (urls == 0) fail("no url entries")
    SitemapParsed(docId, urls, daily, pSum, latest, locChars)
  }

  /** q288's pipeline: synthesize + strict-parse one sitemap per doc;
    * narrow per-row work. */
  def sitemapParse(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val n = text.trim.toLowerCase.split("\\s+").length
        parseSitemap(id, encodeSitemap(id, n))
      })
      .toDF()
  }

  // ----------------------------------------------------------------
  // q305 — base64 data: URI round-trip (RFC 2397 + strict RFC 4648)
  // ----------------------------------------------------------------

  private val B64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  /** data: URI fixture — the inline-resource form crawled HTML embeds
    * by the million: `data:text/plain;base64,` + the doc bytes. */
  private[graft] def encodeDataUri(payload: Array[Byte]): String = {
    val sb = new StringBuilder("data:text/plain;base64,")
    var i = 0
    while (i + 2 < payload.length) {
      val v = ((payload(i) & 0xff) << 16) | ((payload(i + 1) & 0xff) << 8) |
        (payload(i + 2) & 0xff)
      sb.append(B64(v >>> 18)).append(B64((v >>> 12) & 63))
        .append(B64((v >>> 6) & 63)).append(B64(v & 63))
      i += 3
    }
    (payload.length - i) match {
      case 1 =>
        val v = (payload(i) & 0xff) << 16
        sb.append(B64(v >>> 18)).append(B64((v >>> 12) & 63))
          .append("==")
      case 2 =>
        val v = ((payload(i) & 0xff) << 16) | ((payload(i + 1) & 0xff) << 8)
        sb.append(B64(v >>> 18)).append(B64((v >>> 12) & 63))
          .append(B64((v >>> 6) & 63)).append('=')
      case _ => ()
    }
    sb.toString
  }

  final case class DataUriParsed(doc_id: Long, media_type: String,
      b64_chars: Int, pad_chars: Int, decoded_bytes: Int,
      byte_sum: Long)

  /** REAL strict base64 + RFC 2397 walk: the `data:` scheme, a
    * mediatype, the `;base64,` marker, then RFC 4648 §3.5 CANONICAL
    * decoding — alphabet enforced, length ≡ 0 mod 4, padding only in
    * the final quantum, and the trailing-bit check most decoders
    * skip (`QQ==` decodes to 'A' but `QR==` carries nonzero spill
    * bits and MUST be rejected — the non-canonical-form smuggling
    * channel). */
  private[graft] def parseDataUri(docId: Long, uri: String)
      : DataUriParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"data-uri parse [$docId]: $why")
    if (!uri.startsWith("data:")) fail("missing data: scheme")
    val comma = uri.indexOf(',')
    if (comma < 0) fail("missing comma")
    val meta = uri.substring(5, comma)
    if (!meta.endsWith(";base64")) fail("not base64-encoded")
    val mediaType = meta.substring(0, meta.length - 7)
    if (mediaType.isEmpty || !mediaType.contains("/"))
      fail(s"bad mediatype '$mediaType'")
    val b64 = uri.substring(comma + 1)
    if (b64.length % 4 != 0) fail("base64 length not a multiple of 4")
    var pads = 0
    var i = 0
    var sum = 0L
    var decoded = 0
    var acc = 0
    var bits = 0
    while (i < b64.length) {
      val c = b64(i)
      if (c == '=') {
        if (i < b64.length - 2) fail(s"padding before final quantum")
        pads += 1
      } else {
        if (pads > 0) fail("data after padding")
        val v = B64.indexOf(c)
        if (v < 0) fail(s"invalid base64 char '$c'")
        acc = (acc << 6) | v
        bits += 6
        if (bits >= 8) {
          bits -= 8
          val b = (acc >>> bits) & 0xff
          sum += b
          decoded += 1
        }
      }
      i += 1
    }
    if (pads > 2) fail("more than two padding chars")
    // canonical-form check: bits left in the accumulator must be zero
    if (bits > 0 && (acc & ((1 << bits) - 1)) != 0)
      fail("non-canonical trailing bits")
    if ((pads == 1 && bits != 2) || (pads == 2 && bits != 4) ||
        (pads == 0 && bits != 0))
      fail("padding inconsistent with payload length")
    DataUriParsed(docId, mediaType, b64.length, pads, decoded, sum)
  }

  /** q305's pipeline: encode + strict-parse one data: URI per doc. */
  def dataUriRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        parseDataUri(id, encodeDataUri(b))
      })
      .toDF()
  }

  // ----------------------------------------------------------------
  // q306 — HTTP/1.1 chunked transfer-encoding (RFC 9112 §7.1)
  // ----------------------------------------------------------------

  /** Chunked-body fixture: the doc bytes framed as 100-byte chunks —
    * lowercase-hex size line CRLF data CRLF per chunk, the
    * terminating zero chunk, and a trailer field (the part naive
    * dechunkers drop or mis-append to the body). */
  private[graft] def encodeChunked(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    var i = 0
    while (i < payload.length) {
      val n = math.min(100, payload.length - i)
      w(Integer.toHexString(n)); w("\r\n")
      out.write(payload, i, n); w("\r\n")
      i += n
    }
    w("0\r\n")
    w("x-chunk-count: " + ((payload.length + 99) / 100) + "\r\n")
    w("\r\n")
    out.toByteArray
  }

  final case class ChunkedParsed(doc_id: Long, n_chunks: Int,
      body_bytes: Int, framed_bytes: Int, trailer_count: Int,
      byte_sum: Long)

  /** REAL strict dechunker: hex size lines (lowercase, bounded),
    * exact CRLF discipline after every size line AND every data
    * block (the off-by-two that shears all later chunks), the
    * terminating zero chunk, trailer fields parsed — and the
    * carried x-chunk-count trailer CROSS-CHECKED against the walk. */
  private[graft] def parseChunked(docId: Long, bytes: Array[Byte])
      : ChunkedParsed = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"chunked parse [$docId]: $why")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= bytes.length) fail(s"unterminated line at $start")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 2
      s
    }
    var chunks = 0
    var body = 0
    var sum = 0L
    var done = false
    while (!done) {
      val sz = line()
      if (sz.isEmpty || sz.length > 8 ||
          !sz.forall(c => (c >= '0' && c <= '9') ||
            (c >= 'a' && c <= 'f')))
        fail(s"bad chunk-size line '$sz'")
      val n = Integer.parseInt(sz, 16)
      if (n == 0) done = true
      else {
        if (pos + n + 2 > bytes.length) fail("chunk overruns stream")
        var i = pos
        while (i < pos + n) { sum += bytes(i) & 0xff; i += 1 }
        pos += n
        if (bytes(pos) != '\r' || bytes(pos + 1) != '\n')
          fail(s"missing CRLF after chunk $chunks data")
        pos += 2
        chunks += 1
        body += n
      }
    }
    var trailers = 0
    var carried = -1
    var blank = false
    while (!blank) {
      val t = line()
      if (t.isEmpty) blank = true
      else {
        trailers += 1
        val kv = t.split(": ", 2)
        if (kv.length != 2) fail(s"malformed trailer '$t'")
        if (kv(0) == "x-chunk-count") carried = kv(1).toInt
      }
    }
    if (pos != bytes.length) fail("bytes after the trailer section")
    if (carried != chunks)
      fail(s"trailer chunk count $carried != walked $chunks")
    ChunkedParsed(docId, chunks, body, bytes.length, trailers, sum)
  }

  /** q306's pipeline: frame + strictly dechunk each doc. */
  def chunkedRoundTrip(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        parseChunked(id, encodeChunked(b))
      })
      .toDF()
  }

  // ----------------------------------------------------------------
  // q300 — the web-pipeline YIELD capstone
  // ----------------------------------------------------------------

  /** The end-to-end funnel every crawl-to-corpus pipeline reports:
    * ingest → HTML extraction (the REAL q281 parser runs on every
    * page) → length-band quality filter → exact dedup (q44's
    * fingerprint rule, min-doc_id canonical) → GPT-style packing
    * (docs concatenated then split at the context boundary, so
    * sequences = ceil(Σ tokens / ctx)). One row per stage with doc
    * and token counts — the "where did my data go" dashboard.
    * Shape: one parse pass (narrow), one fingerprint groupBy; every
    * stage count is an aggregate, nothing re-scans the corpus. */
  def pipelineYield(docs: DataFrame, ctx: Long = 2048L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val norm = text.trim.toLowerCase
        val toks = norm.split("\\s+")
        val p = parseHtml(id, encodeHtml(id, toks))
        (id, norm, toks.length.toLong, p.n_text_tokens)
      })
      .toDF("doc_id", "norm", "n", "extracted")
      .localCheckpoint(true) // feeds every stage once
    val s12 = parsed.agg(count(lit(1)).as("docs"), sum("n").as("toks"),
      sum("extracted").as("etoks")).head()
    val kept = parsed.filter(col("n") >= 30 && col("n") <= 120)
      .localCheckpoint(true)
    val s3 = kept.agg(count(lit(1)), sum("n")).head()
    val surv = kept
      .groupBy(md5(col("norm").cast("binary")).as("fp"))
      .agg(min("doc_id").as("doc_id"), first("n").as("n"))
    val s4 = surv.agg(count(lit(1)), sum("n")).head()
    val (sDocs, sToks) = (s4.getLong(0), s4.getLong(1))
    Seq(
      ("1_ingest", s12.getLong(0), s12.getLong(1)),
      ("2_extract", s12.getLong(0), s12.getLong(2)),
      ("3_quality", s3.getLong(0), s3.getLong(1)),
      ("4_dedup", sDocs, sToks),
      ("5_pack", (sToks + ctx - 1) / ctx, sToks))
      .toDF("stage", "docs", "tokens")
  }

  val queries: Map[String, Q] = Map(
    // Pipeline YIELD capstone — the crawl-to-corpus funnel: real
    // HTML extraction, length-band quality filter, exact dedup,
    // context-window packing; one row per stage.
    "q300_pipeline_yield" -> ((s, d) =>
      pipelineYield(Tables.load(s, d, "documents"))),

    // HTML text extraction — the FIRST pass of every web-corpus
    // pipeline: strip tags/script/style/comments, decode entities,
    // keep the text. The fixture page plants the classic traps (a
    // bare > inside script, nested elements, self-closing tags,
    // named + numeric entities) and every count is closed-form.
    "q281_html_extract" -> ((s, d) =>
      htmlExtract(Tables.load(s, d, "documents"))),

    // robots.txt evaluation — crawl admission control: 25 per-domain
    // rule files parsed with the RFC 9309 group/longest-match/
    // allow-wins-ties semantics, applied to every customer URL via
    // a broadcast rule join + one keyed max(struct) agg.
    "q282_robots_rules" -> ((s, d) =>
      robotsEvaluate(Tables.load(s, d, "nation"),
        Tables.load(s, d, "customer"))),

    // URL canonicalization — crawl-frontier dedup: five raw
    // spellings per logical URL (case, default port, www, dot
    // segments, percent-encoding + tracking params + fragment)
    // collapse to one canonical via a real RFC 3986 normalizer.
    "q283_url_canonicalize" -> ((s, d) =>
      urlCanonicalize(Tables.load(s, d, "orders"))),

    // Strict RFC 4180 CSV round-trip — the interchange format half
    // of all tabular corpus drops arrive in: quoted fields with
    // embedded commas/quotes/CRLFs, written then parsed back with
    // per-field equality enforced.
    "q287_csv_strict" -> ((s, d) =>
      csvRoundTrip(Tables.load(s, d, "documents"))),

    // HTTP/1.1 chunked transfer decoding — the wire framing half of
    // all crawled responses arrive under: strict hex size lines,
    // CRLF discipline, zero-chunk termination, trailer fields with
    // the carried chunk count cross-checked.
    "q306_http_chunked" -> ((s, d) =>
      chunkedRoundTrip(Tables.load(s, d, "documents"))),

    // base64 data: URI round-trip — the inline-resource form crawled
    // HTML embeds everywhere: RFC 2397 grammar + strict CANONICAL
    // RFC 4648 decoding (alphabet, mod-4 length, final-quantum-only
    // padding, and the trailing-bit check that rejects smuggled
    // non-canonical forms).
    "q305_data_uri" -> ((s, d) =>
      dataUriRoundTrip(Tables.load(s, d, "documents"))),

    // Sitemap XML parse — the crawl SEED format: strict
    // sitemaps.org grammar (prolog, namespace, typed lastmod/
    // changefreq/priority), per-doc url inventories with
    // closed-form features.
    "q288_sitemap_parse" -> ((s, d) =>
      sitemapParse(Tables.load(s, d, "documents")))
  )

  val oracles: Map[String, String] = Map(
    // q300: the extraction stage's token count is q281's closed form
    // (2 + n + n//7); quality/dedup/pack replay as plain SQL
    "q300_pipeline_yield" ->
      """WITH f AS (
        |  SELECT doc_id, lower(trim(text)) AS norm,
        |    len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT
        |      AS n
        |  FROM documents
        |), k AS (SELECT * FROM f WHERE n BETWEEN 30 AND 120),
        |sv AS (
        |  SELECT norm, min(doc_id) AS doc_id, min(n) AS n
        |  FROM k GROUP BY norm
        |), s4 AS (
        |  SELECT count(*)::BIGINT AS docs,
        |    CAST(coalesce(sum(n), 0) AS BIGINT) AS toks
        |  FROM sv
        |)
        |SELECT '1_ingest' AS stage, count(*)::BIGINT AS docs,
        |  CAST(sum(n) AS BIGINT) AS tokens FROM f
        |UNION ALL
        |SELECT '2_extract', count(*)::BIGINT,
        |  CAST(sum(2 + n + n // 7) AS BIGINT) FROM f
        |UNION ALL
        |SELECT '3_quality', count(*)::BIGINT,
        |  CAST(coalesce(sum(n), 0) AS BIGINT) FROM k
        |UNION ALL
        |SELECT '4_dedup', docs, toks FROM s4
        |UNION ALL
        |SELECT '5_pack', (toks + 2047) // 2048, toks FROM s4""".stripMargin,

    // q281: element/comment/entity/token counts are floor arithmetic
    // in n; the extracted text is the title tokens + the token
    // stream with the (i/7 mod 5)-cycled entity characters spliced
    // after every 7th token — replayed with a list comprehension
    "q281_html_extract" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, t, len(t)::BIGINT AS n FROM tk
        |)
        |SELECT doc_id,
        |  7 + n + n // 17 + n // 13 AS n_elements,
        |  n // 11 AS n_comments,
        |  n // 7 AS n_entities,
        |  n // 13 AS n_selfclosing,
        |  2 + n + n // 7 AS n_text_tokens,
        |  'doc ' || doc_id || ' ' || list_aggregate(
        |    [t[i] || CASE WHEN i % 7 = 0 THEN ' ' ||
        |        CASE (i // 7) % 5 WHEN 0 THEN '&' WHEN 1 THEN '<'
        |          WHEN 2 THEN '>' WHEN 3 THEN '"' ELSE 'A' END
        |      ELSE '' END
        |     for i in range(1, (n + 1)::INT)],
        |    'string_agg', ' ') AS extracted_text
        |FROM f""".stripMargin,

    // q282: the oracle replays group selection + longest-match as
    // CASE arithmetic over (nationkey mod 3/2, custkey mod 6) — the
    // parser and the broadcast-join evaluation are what the match
    // pins
    "q282_robots_rules" ->
      """SELECT c_custkey::BIGINT AS c_custkey,
        |  lower(n_name) || '.example' AS domain,
        |  CASE c_custkey % 6
        |    WHEN 0 THEN '/' WHEN 1 THEN '/private/x.html'
        |    WHEN 2 THEN '/private/public/y.html'
        |    WHEN 3 THEN '/search?q=q' WHEN 4 THEN '/tmp/f.txt'
        |    ELSE '/docs/d.html' END AS path,
        |  CASE WHEN n_nationkey % 3 = 0 THEN FALSE
        |    ELSE CASE c_custkey % 6
        |      WHEN 1 THEN FALSE WHEN 4 THEN FALSE
        |      WHEN 3 THEN n_nationkey % 2 <> 0 ELSE TRUE END
        |    END AS allowed,
        |  CASE WHEN n_nationkey % 3 = 0 THEN '/'
        |    ELSE CASE c_custkey % 6
        |      WHEN 1 THEN '/private/'
        |      WHEN 2 THEN '/private/public/'
        |      WHEN 3 THEN CASE WHEN n_nationkey % 2 = 0
        |        THEN '/search' ELSE '' END
        |      WHEN 4 THEN '/tmp/' ELSE '' END
        |    END AS matched_rule,
        |  CASE WHEN n_nationkey % 3 = 0 THEN 1
        |    ELSE CASE c_custkey % 6
        |      WHEN 1 THEN 9 WHEN 2 THEN 16
        |      WHEN 3 THEN CASE WHEN n_nationkey % 2 = 0
        |        THEN 7 ELSE 0 END
        |      WHEN 4 THEN 5 ELSE 0 END
        |    END::INT AS rule_len,
        |  CASE WHEN n_nationkey % 3 = 0 THEN 0
        |    ELSE 1 + n_nationkey % 5 END::INT AS crawl_delay
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    // q283: the canonical form is direct string arithmetic in
    // g = orderkey div 5; the normalizer (case, port, www, dot
    // segments, %69, utm/fragment strip) is what the match pins
    "q283_url_canonicalize" ->
      """SELECT
        |  'https://shop' || (g % 50) || '.example/cat' || (g % 7)
        |    || '/item' || g AS canonical_url,
        |  count(*)::BIGINT AS n_urls,
        |  count(DISTINCT k % 5)::BIGINT AS n_variants,
        |  min(k)::BIGINT AS first_orderkey
        |FROM (SELECT o_orderkey AS k, o_orderkey // 5 AS g FROM orders)
        |GROUP BY g
        |ORDER BY canonical_url""".stripMargin,

    // q306: framing arithmetic — 106 bytes per full 100-byte chunk,
    // hex-width CASE for the partial tail, constant zero-chunk +
    // trailer overhead with the chunk-count digits
    "q306_http_chunked" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS l,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, l, byte_sum, (l + 99) // 100 AS ck,
        |    l // 100 AS fullc, l % 100 AS m
        |  FROM f
        |)
        |SELECT doc_id, ck AS n_chunks, l AS body_bytes,
        |  (106 * fullc
        |   + CASE WHEN m = 0 THEN 0
        |     ELSE (CASE WHEN m < 16 THEN 1 ELSE 2 END) + 4 + m END
        |   + 3 + 15 + length(ck::VARCHAR) + 2 + 2)::INT
        |    AS framed_bytes,
        |  1 AS trailer_count, coalesce(byte_sum, 0) AS byte_sum
        |FROM g""".stripMargin,

    // q305: pure length arithmetic — 4·ceil(L/3) base64 chars,
    // (3 − L mod 3) mod 3 pads — plus the raw byte sum
    "q305_data_uri" ->
      """WITH f AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS l,
        |    CAST(list_sum([ascii(text[i:i])
        |      for i in range(1, octet_length(encode(text)) + 1)])
        |      AS BIGINT) AS byte_sum
        |  FROM documents
        |)
        |SELECT doc_id, 'text/plain' AS media_type,
        |  (4 * ((l + 2) // 3))::INT AS b64_chars,
        |  ((3 - l % 3) % 3)::INT AS pad_chars,
        |  l AS decoded_bytes, coalesce(byte_sum, 0) AS byte_sum
        |FROM f""".stripMargin,

    // q287: every quoting trigger lives on a disjoint residue class
    // (%4 comma, %6-not-%4 quote, %9-not-%4-not-%6 CRLF), so all
    // counts are floor arithmetic in M = 3·(n div 3)
    "q287_csv_strict" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, t, 3 * (len(t) // 3) AS m FROM tk
        |  WHERE len(t) >= 3
        |)
        |SELECT doc_id,
        |  (m // 3)::BIGINT AS n_rows,
        |  m::BIGINT AS n_fields,
        |  (m//4 + m//6 - m//12 + m//9 - m//18)::BIGINT AS n_quoted,
        |  (m//6 - m//12)::BIGINT AS n_escaped_quotes,
        |  (m//9 - m//18)::BIGINT AS n_embedded_crlf,
        |  (list_sum([length(t[i]) for i in range(1, (m + 1)::INT)])
        |    + 2*(m//4) + 2*(m//6 - m//12) + 3*(m//9 - m//18))::BIGINT
        |    AS total_field_chars
        |FROM f""".stripMargin,

    // q288: url i of doc d carries feature arithmetic in v = d + i;
    // the latest lastmod is a max over the v-grid, replayed with
    // list comprehensions
    "q288_sitemap_parse" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    1 + len(string_split_regex(lower(trim(text)), '\s+')) % 47
        |      AS nu
        |  FROM documents
        |)
        |SELECT doc_id, nu::BIGINT AS n_urls,
        |  CAST(list_sum([CASE WHEN (doc_id + i) % 7 = 2 THEN 1
        |    ELSE 0 END for i in range(1, (nu + 1)::INT)]) AS BIGINT)
        |    AS n_daily,
        |  CAST(list_sum([(doc_id + i) % 10
        |    for i in range(1, (nu + 1)::INT)]) AS BIGINT)
        |    AS priority_sum,
        |  list_aggregate(['2026-' || lpad((1 + (doc_id + i) % 12)::VARCHAR, 2, '0')
        |      || '-' || lpad((1 + (doc_id + i) % 28)::VARCHAR, 2, '0')
        |    for i in range(1, (nu + 1)::INT)], 'max')
        |    AS latest_lastmod,
        |  CAST(list_sum([length('https://d' || doc_id
        |      || '.example/p' || i)
        |    for i in range(1, (nu + 1)::INT)]) AS BIGINT)
        |    AS loc_chars
        |FROM f""".stripMargin
  )
}
