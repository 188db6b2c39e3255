package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface beyond reference parity (SURVEY.md
  * §7.4 north-star): token counting, quality scoring, language-ID,
  * document fingerprinting.
  *
  * Everything is pure `functions._` (whole-stage codegen; no UDFs) and
  * embarrassingly parallel — per-row narrow transforms that scale
  * linearly with partitions, no shuffle anywhere. Each query has an
  * exact DuckDB oracle (same formula, same rounding).
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  /** Lowercased whitespace tokens — shared by every query and by the
    * dedup suite (DedupOps). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** q202's collocation scorer over a `text` corpus: adjacent-token
    * pairs with count ≥ minCount, their marginals (left/right bigram
    * occurrences), the float-free BIGINT ranking key
    * r = (c_ab·N·1e6) div (c_a·c_b) and the display-only 6-dp PMI.
    * Split out so TextSpec pins the algebra on a crafted corpus. */
  private[graft] def pmiCollocations(docs: DataFrame, minCount: Long)
      : DataFrame = {
    val toks = tokens(col("text"))
    val big = docs.filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col("bg.t1").as("a"), col("bg.t2").as("b"))
    val c2 = big.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val n = c2.agg(sum("c_ab")).head.getLong(0)
    val la = c2.groupBy("a").agg(sum("c_ab").as("c_a"))
    val rb = c2.groupBy("b").agg(sum("c_ab").as("c_b"))
    c2.join(broadcast(la), "a").join(broadcast(rb), "b")
      .filter(col("c_ab") >= minCount)
      .withColumn("r",
        expr(s"(c_ab * $n * 1000000) div (c_a * c_b)"))
      .withColumn("pmi", round(log(col("c_ab").cast("double") * n
        / (col("c_a") * col("c_b"))), 6))
      .select("a", "b", "c_ab", "c_a", "c_b", "r", "pmi")
  }

  /** THE content fingerprint — one definition shared by q43/q44/q68
    * and the streaming dedup, so batch and streaming can never
    * silently diverge on normalization. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** Occurrence count of stopwords — codegen'd CountInSet, NOT
    * `size(filter(...))`: Spark's higher-order `filter` is
    * CodegenFallback (interpreted) and this sits on the q41→q66/q68/
    * q72 capstone hot path. Same semantics (duplicates count). */
  private def stopHits(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.CountInSet.column(toks, words)

  /** q42's language prediction as a reusable expression (stopword-hit
    * argmax with the deterministic en > de > fr > es priority) —
    * shared by the classifier, its confusion matrix (q193) and the
    * kappa agreement score (q194). */
  private def langPredExpr: Column = {
    val toks = tokens(col("text"))
    val (en, de, fr, es) = (stopHits(toks, En), stopHits(toks, De),
      stopHits(toks, Fr), stopHits(toks, Es))
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  // Minimal per-language stopword lists for the n-gram/stopword
  // heuristic language-ID (deterministic priority en > de > fr > es).
  private val En = Seq("the", "a", "of", "and", "to", "in", "is")
  private val De = Seq("der", "die", "das", "und", "ist")
  private val Fr = Seq("le", "les", "et", "est", "une")
  private val Es = Seq("el", "los", "y", "es", "una")

  private def sqlIn(ws: Seq[String]) = ws.map("'" + _ + "'").mkString("(", ",", ")")

  /** q147's rule engine, parameterized so specs can feed corrupted
    * fixtures: every document-side rule reduces to a scalar aggregate
    * of ONE shared scan (rule count never multiplies corpus passes),
    * the referential rule is one left-anti count, and the result is a
    * six-row rule table built on the driver. NULL-safe comparisons
    * (`<=>`): a NULL n_chars or lang IS a violation, not a silent
    * three-valued-logic skip. */
  def validateCorpus(s: SparkSession, doc: DataFrame,
      emb: DataFrame): DataFrame = {
    import s.implicits._
    val langs = Seq("en", "de", "fr", "es", "zh")
    val r = doc.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("n_ids"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("null_ids"),
      sum(when(!(col("n_chars") <=> length(col("text"))), 1L)
        .otherwise(0L)).as("len_mismatch"),
      sum(when(coalesce(col("lang").isInCollection(langs), lit(false)),
        0L).otherwise(1L)).as("bad_lang"),
      sum(when(coalesce(length(col("text")) > 0, lit(false)), 0L)
        .otherwise(1L)).as("empty_text")).head()
    val orphan = emb.select(col("vec_id"))
      .join(doc.select(col("doc_id").as("vec_id")), Seq("vec_id"),
        "left_anti").count()
    Seq(
      ("doc_id_unique", r.getLong(0) - r.getLong(1)),
      ("doc_id_not_null", r.getLong(2)),
      ("n_chars_consistent", r.getLong(3)),
      ("lang_in_domain", r.getLong(4)),
      ("text_nonempty", r.getLong(5)),
      ("embeddings_ref_docs", orphan))
      .toDF("rule", "violations")
      .withColumn("pass", col("violations") === 0L)
  }

  /** The boilerplate template q264 plants on every lang='en' doc —
    * 8 lowercase tokens, so exactly four 5-gram shingles live fully
    * inside it. */
  private[graft] val BoilerplateTemplate =
    "this template footer is shared across english documents"

  /** Per-partition Misra–Gries summary (k counters) over an item
    * iterator — the classic deterministic heavy-hitter sketch (Misra
    * & Gries 1982), mergeable by counter addition (Agarwal et al.
    * 2013): at most k counters are live at any moment, and an item
    * with partition count c exits with counter ≥ c − N_p/(k+1).
    * Summed across partitions the undercount stays ≤ N/(k+1), so any
    * item with GLOBAL count > N/(k+1) has positive merged weight —
    * i.e. it appears in at least one partition's summary. That
    * union-of-keys superset is the guarantee q264's exact verify
    * pass rides on. */
  private[graft] def misraGries(items: Iterator[String], k: Int)
      : Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      m.get(x) match {
        case Some(c)            => m.update(x, c + 1)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          m.mapValuesInPlace((_, v) => v - 1)
          m.filterInPlace((_, v) => v > 0)
      }
    }
    m.iterator
  }

  /** q264's pipeline: corpus boilerplate detection — the C4/CCNet
    * "template fragment shared across thousands of pages" hunt — as
    * a two-pass heavy hitter. Pass 1 scans the 5-gram shingle stream
    * once, building a [[misraGries]] summary per partition (k = 256
    * counters — fixed state no matter the corpus size); the unioned
    * candidate keys are ≤ partitions·k rows and provably contain
    * every shingle above N/257 of the stream. Pass 2 exact-counts
    * ONLY the broadcast candidates and keeps those above the report
    * threshold 1/200 (> 1/257, so the sketch's superset guarantee
    * covers it) — exact output from sketch-sized intermediates; the
    * corpus itself never shuffles on the shingle key. The synthetic
    * corpus has no natural boilerplate, so a template is PLANTED on
    * every lang='en' doc (the q168 planting pattern); boundary
    * shingles (template tail × each doc's first words) land ~30×
    * under threshold and prove the cut bites. */
  def boilerplateHeavyHitters(docs: DataFrame): DataFrame =
    heavyShingles(
      docs.select(when(col("lang") === "en",
          concat(lit(BoilerplateTemplate + " "), col("text")))
        .otherwise(col("text")).as("text")),
      k = 256, denom = 200)

  /** q264's core with the plant abstracted (TextScaleBench drives it
    * at 1M docs with its own plant): heavy 5-gram shingles of a text
    * frame — per-partition [[misraGries]] with `k` counters, then
    * the broadcast exact-verify pass at report threshold 1/denom.
    * The sketch guarantee covers the threshold iff denom < k + 1 —
    * enforced, because a silent violation would drop true heavy
    * hitters only at scale. */
  def heavyShingles(docs: DataFrame, k: Int, denom: Int): DataFrame = {
    require(denom < k + 1,
      s"report threshold 1/$denom needs k >= $denom counters")
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 4), i -> " +
          "concat_ws(' ', t[i-1], t[i], t[i+1], t[i+2], t[i+3]))"))
        .as("g"))
    val candidates = grams.as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF("g", "c")
      .select("g").distinct()
    val n = grams.count()
    grams.join(broadcast(candidates), "g")
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * denom > lit(n))
      .select(col("g").as("shingle"), col("cnt"),
        lit(n).as("n_shingles"))
      .orderBy("shingle")
  }

  private[graft] final case class Utf8Census(doc_id: Long,
      n_bytes: Long, n_codepoints: Long, n_ascii: Long, n_2byte: Long,
      n_3byte: Long, n_4byte: Long, n_invalid: Long)

  /** q265's fixture: the corpus text is pure ASCII, so multi-byte and
    * malformed UTF-8 is PLANTED at deterministic 1-based source
    * offsets — after byte i insert a valid 2-byte é (i % 40 == 0), a
    * valid 3-byte € (i % 90 == 0), the always-invalid overlong lead
    * 0xC0 (i % 130 == 0), and a stray continuation 0x80
    * (i % 170 == 0) — all four closed-form countable as n div k. */
  private[graft] def plantUtf8(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length + 16)
    var i = 0
    while (i < src.length) {
      out.write(src(i))
      val p = i + 1
      if (p % 40 == 0) { out.write(0xC3); out.write(0xA9) }
      if (p % 90 == 0) { out.write(0xE2); out.write(0x82); out.write(0xAC) }
      if (p % 130 == 0) out.write(0xC0)
      if (p % 170 == 0) out.write(0x80)
      i += 1
    }
    out.toByteArray
  }

  /** REAL UTF-8 validation walk per RFC 3629 — the first thing a
    * 100 TB ingest does to every crawled byte stream: sequence
    * classification with ALL the table-3.7 corners enforced (C0/C1
    * overlong leads invalid, E0 requires A0..BF second, ED excludes
    * the surrogate range, F0 requires 90.. second, F4 caps at ..8F —
    * U+10FFFF, F5..FF invalid, truncation at EOF invalid). Error
    * policy: consume ONE byte per invalid event and resume (each
    * event is one replacement char in a repair pass), so planted
    * single-byte corruptions count exactly once. Never throws — the
    * census IS the product; strict per-sequence behavior is pinned by
    * TextSpec on crafted streams (surrogates, overlongs, truncated
    * tails). */
  private[graft] def utf8Census(docId: Long, bytes: Array[Byte])
      : Utf8Census = {
    var i = 0
    var cp = 0L; var a = 0L; var b2 = 0L; var b3 = 0L; var b4 = 0L
    var bad = 0L
    def cont(j: Int) = j < bytes.length && (bytes(j) & 0xC0) == 0x80
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { a += 1; cp += 1; i += 1 }
      else if (b >= 0xC2 && b <= 0xDF) {
        if (cont(i + 1)) { b2 += 1; cp += 1; i += 2 }
        else { bad += 1; i += 1 }
      } else if (b >= 0xE0 && b <= 0xEF) {
        val lo = if (b == 0xE0) 0xA0 else 0x80
        val hi = if (b == 0xED) 0x9F else 0xBF
        val ok = i + 2 < bytes.length && {
          val c1 = bytes(i + 1) & 0xff
          c1 >= lo && c1 <= hi && cont(i + 2)
        }
        if (ok) { b3 += 1; cp += 1; i += 3 } else { bad += 1; i += 1 }
      } else if (b >= 0xF0 && b <= 0xF4) {
        val lo = if (b == 0xF0) 0x90 else 0x80
        val hi = if (b == 0xF4) 0x8F else 0xBF
        val ok = i + 3 < bytes.length && {
          val c1 = bytes(i + 1) & 0xff
          c1 >= lo && c1 <= hi && cont(i + 2) && cont(i + 3)
        }
        if (ok) { b4 += 1; cp += 1; i += 4 } else { bad += 1; i += 1 }
      } else { bad += 1; i += 1 } // 0x80..C1 stray/overlong, F5..FF
    }
    Utf8Census(docId, bytes.length, cp, a, b2, b3, b4, bad)
  }

  /** q265's pipeline: per-doc UTF-8 validity census — same typed
    * mapPartitions shape as the multimodal decoders; narrow, no
    * shuffle, scales with partitions. */
  def utf8CensusTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        utf8Census(id, plantUtf8(b)) })
      .toDF()
  }

  final case class SrtParsed(doc_id: Long, n_cues: Int,
      total_speech_ms: Long, span_ms: Long, text_chars: Long)

  /** SRT fixture encoder — the subtitle format aligned-text corpora
    * arrive in: cue blocks of `index CRLF HH:MM:SS,mmm -->
    * HH:MM:SS,mmm CRLF text CRLF CRLF`, five tokens per cue, cue i
    * starting at 2500·i ms with a per-doc duration 2000 + id % 500 —
    * adjacent cues never overlap by construction (2500 > 2499). */
  private[graft] def encodeSrt(docId: Long, toks: Array[String])
      : String = {
    val nc = toks.length / 5
    val dur = 2000 + docId % 500
    def ts(ms: Long): String = {
      val h = ms / 3600000
      val m = ms / 60000 % 60
      val s = ms / 1000 % 60
      val f = ms % 1000
      f"$h%02d:$m%02d:$s%02d,$f%03d"
    }
    val sb = new StringBuilder
    var i = 0
    while (i < nc) {
      val st = 2500L * i
      sb.append(i + 1).append("\r\n")
      sb.append(ts(st)).append(" --> ").append(ts(st + dur))
        .append("\r\n")
      sb.append(toks.slice(5 * i, 5 * i + 5).mkString(" "))
        .append("\r\n\r\n")
      i += 1
    }
    sb.toString
  }

  private val SrtTimes =
    """^(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})$""".r

  /** REAL SRT parse — strict cue-block walk: 1-based consecutive cue
    * indices, the exact `HH:MM:SS,mmm --> HH:MM:SS,mmm` timestamp
    * grammar, end > start, cues ordered and non-overlapping, exactly
    * one nonempty text line, blank-line separators. Any deviation
    * throws — a subtitle corpus with sheared timing silently poisons
    * every alignment downstream. Returns (cues, Σ(end−start),
    * lastEnd − firstStart, Σ text chars). */
  private[graft] def parseSrt(docId: Long, srt: String)
      : (Int, Long, Long, Long) = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"srt parse [$docId]: $why")
    val lines = srt.split("\r\n", -1)
    var li = 0
    var cue = 0
    var speech = 0L
    var chars = 0L
    var firstStart = -1L
    var prevEnd = -1L
    while (li < lines.length - 1) {
      if (li + 4 > lines.length) fail(s"truncated cue block at $li")
      if (lines(li) != (cue + 1).toString)
        fail(s"cue index '${lines(li)}' != ${cue + 1}")
      val (st, en) = lines(li + 1) match {
        case SrtTimes(h1, m1, s1, f1, h2, m2, s2, f2) =>
          def ms(h: String, m: String, s: String, f: String): Long =
            h.toLong * 3600000 + m.toLong * 60000 + s.toLong * 1000 +
              f.toLong
          (ms(h1, m1, s1, f1), ms(h2, m2, s2, f2))
        case other => fail(s"bad timestamp line '$other'")
      }
      if (en <= st) fail(s"cue ${cue + 1}: end $en <= start $st")
      if (st < prevEnd) fail(s"cue ${cue + 1} overlaps its predecessor")
      val text = lines(li + 2)
      if (text.isEmpty) fail(s"cue ${cue + 1}: empty text")
      if (lines(li + 3).nonEmpty)
        fail(s"cue ${cue + 1}: missing blank separator")
      if (firstStart < 0) firstStart = st
      prevEnd = en
      speech += en - st
      chars += text.length
      cue += 1
      li += 4
    }
    if (cue == 0) fail("no cues")
    (cue, speech, prevEnd - firstStart, chars)
  }

  /** q279's pipeline: tokenize → synthesize the cue file → strict
    * parse back; narrow per-row work. */
  def parseSubtitles(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.trim.toLowerCase.split("\\s+")
        if (toks.length < 5) Iterator.empty
        else {
          val (nc, speech, span, chars) =
            parseSrt(id, encodeSrt(id, toks))
          Iterator(SrtParsed(id, nc, speech, span, chars))
        }
      })
      .toDF()
  }

  val queries: Map[String, Q] = Map(
    // BPE pair statistics — the first step of byte-pair-encoding
    // tokenizer TRAINING: corpus-wide counts of adjacent symbol pairs
    // (here: character bigrams inside whitespace words), top-20 by
    // frequency — exactly the argmax a BPE trainer merges next. Shape:
    // one narrow explode pass (no shuffle until the pair agg), then a
    // partial+final count on a small key domain and a TopN — at 100TB
    // the merge-loop iterates this same job with the learned merges
    // applied, and the pair-count agg stays the only exchange.
    "q143_bpe_pairs" -> ((s, d) => {
      val words = Tables.load(s, d, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
      words
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(20)
    }),

    // PII scrub pass — the redaction sweep every training corpus runs
    // before release: regex-detect emails and phone-shaped tokens,
    // replace with typed placeholders, report per-source counts and
    // characters removed. The synthetic corpus carries no PII, so the
    // pass runs over a deterministic fixture ENRICHMENT (an email +
    // phone derived from doc_id, appended identically on the oracle
    // side) — the detection/redaction logic is what's pinned, not the
    // planted values. Shape: one narrow codegen map (regexp_replace +
    // regexp_extract_all stay whole-stage), then a partial+final agg
    // on the tiny source key — per-doc redacted text never shuffles.
    // Patterns stay in the Java∩RE2 common dialect (no lookaround, no
    // backrefs) so Spark and the oracle engine match identically.
    "q146_pii_redact" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "555-[0-9]{4}"
      val withPii = Tables.load(s, d, "documents").select(
        col("source"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
      val red = regexp_replace(
        regexp_replace(col("t"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
      withPii
        .select(col("source"), col("t"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("ne"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).as("np"),
          (length(col("t")) - length(red)).as("removed"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          sum("ne").as("emails"),
          sum("np").as("phones"),
          sum("removed").as("chars_removed"))
    }),

    // Constraint-validation suite (the Deequ/Great-Expectations shape):
    // declarative data-quality rules checked in bulk before a corpus
    // ships — uniqueness, completeness, domain membership, a
    // cross-column consistency invariant, and referential containment
    // of embeddings.vec_id in documents.doc_id. Each rule reduces to
    // a scalar aggregate; all document-side rules share ONE scan/agg
    // pass (no per-rule jobs), the referential rule is one left-anti
    // count, and the result is a tiny unioned rule table. At 100 TB
    // this is exactly one corpus pass + one (broadcastable) anti-join
    // — rule count doesn't multiply scans.
    "q147_validate_constraints" -> ((s, d) =>
      validateCorpus(s, Tables.load(s, d, "documents"),
        Tables.load(s, d, "embeddings"))),

    // Token counting: whitespace tokens + a BPE-ish regex tokenization
    // (letter runs / digit runs / single punctuation marks).
    "q40_token_count" -> ((s, d) => {
      Tables.load(s, d, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"))
    }),

    // Quality scoring: length, stopword ratio, punctuation ratio,
    // average word length -> one score in [0,1].
    "q41_quality_score" -> ((s, d) => {
      val toks = tokens(col("text"))
      val wordCnt = size(toks).cast("double")
      val stopRatio = stopHits(toks, En).cast("double") / wordCnt
      val punctRatio =
        size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("double") / col("n_chars").cast("double")
      val avgWlen =
        length(regexp_replace(col("text"), "\\s", "")).cast("double") / wordCnt
      Tables.load(s, d, "documents").select(
        col("doc_id"),
        wordCnt.cast("long").as("word_cnt"),
        round(stopRatio, 6).as("stop_ratio"),
        round(punctRatio, 6).as("punct_ratio"),
        round(avgWlen, 6).as("avg_wlen"),
        round(least(lit(1.0), wordCnt / lit(100.0)) * 0.4
          + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.3, 6).as("quality"))
    }),

    // Language-ID: stopword-hit scores per language, argmax with fixed
    // priority; no hits at all -> 'und'.
    "q42_lang_id" -> ((s, d) => {
      val toks = tokens(col("text"))
      val (en, de, fr, es) = (stopHits(toks, En), stopHits(toks, De),
        stopHits(toks, Fr), stopHits(toks, Es))
      Tables.load(s, d, "documents").select(
        col("doc_id"), en.as("s_en"), de.as("s_de"), fr.as("s_fr"),
        es.as("s_es"), langPredExpr.as("lang_pred"))
    }),

    // Document fingerprinting: md5 over the normalized text (exact-dup
    // key) + a 64-bit prefix as BIGINT for compact storage.
    "q43_fingerprint" -> ((s, d) => {
      val fp = fingerprint(col("text"))
      Tables.load(s, d, "documents").select(
        col("doc_id"), fp.as("fp"),
        conv(substring(fp, 1, 15), 16, 10).cast("long").as("fp64"))
    }),

    // Winnowing fingerprints, reshaped into a DRIVER-CHECKABLE gate:
    // the fp values are xxhash64-seeded (never cross-engine), but the
    // winnowing GUARANTEES are checkable — every doc with >= 4 tokens
    // (>= 1 four-gram) selects at least one fingerprint, and the
    // SELECTED-POSITION count per doc is bounded by ceil(G/4) <= n_fp
    // <= G for G = tokens-3 windows (one selected position covers at
    // most 4 windows). Counting positions, not hash values, is what
    // makes the lower bound sound: a repetitive doc (one token
    // repeated) collapses distinct hashes to 1 but still selects
    // >= ceil(G/4) positions. docs_with_fp is the genuine
    // DuckDB-checkable count; bounds_ok is the in-engine guarantee
    // flag. TextSpec still pins the near-dup overlap property.
    "q53_winnow_fingerprint" -> ((s, d) => {
      import s.implicits._
      val perDoc = winnow(s, d).groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).as("n_toks"))
      val joined = docs.join(perDoc, Seq("doc_id"), "left").cache()
      val g = (col("n_toks") - 3).cast("double")
      val violations = joined.filter(
        when(col("n_toks") >= 4,
          col("n_fp").isNull || col("n_fp") > col("n_toks") - 3
            || col("n_fp") < ceil(g / 4.0))
          .otherwise(col("n_fp").isNotNull)).count()
      val docsWithFp = joined.filter(col("n_fp").isNotNull).count()
      val nDocs = joined.count()
      joined.unpersist()
      Seq((docsWithFp, nDocs, violations == 0L))
        .toDF("docs_with_fp", "n_docs", "bounds_ok")
    }),

    // Test-set decontamination (the GPT-3/PaLM recipe: flag training
    // docs sharing any n-gram with the benchmark/eval set; n scaled to
    // the synthetic corpus). Eval set = doc_id % 97 == 0 — in a real
    // pipeline the benchmark suite. Shape for 100TB: the eval side is
    // ALWAYS tiny, so its distinct grams BROADCAST and the train corpus
    // is pruned by a map-side semi-join — the 100TB side is never
    // shuffled; the only exchange is the per-doc count on the doc_id
    // partitioning the gram window already established.
    "q73_decontaminate" -> ((s, d) => {
      val grams = gram5Stream(s, d)
      val bench = grams.filter(col("doc_id") % 97 === 0)
        .select("g").distinct()
      grams.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("g"), "left_semi")
        .groupBy("doc_id")
        .agg(countDistinct(col("g")).as("n_overlap"))
    }),

    // Context-window chunking: split each doc into token windows of
    // W=64 with stride S=48 (16-token overlap) — the sequence-prep
    // step before packing/tokenization. Pure narrow ops (sequence +
    // explode + slice), no shuffle; md5 chunk fingerprints are
    // engine-independent so every chunk boundary is value-checked.
    "q74_chunk_windows" -> ((s, d) => {
      val W = 64; val S = 48
      Tables.load(s, d, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("i", explode(sequence(lit(0),
          floor((col("n") - 1) / lit(S)).cast("int"))))
        .withColumn("start", col("i") * S)
        .select(col("doc_id"), col("i").as("chunk_idx"),
          least(lit(W), col("n") - col("start")).as("chunk_len"),
          md5(array_join(slice(col("toks"), col("start") + 1, lit(W)), " ")
            .cast("binary")).as("chunk_fp"))
    }),

    // Sequence-packing offsets: concatenate the corpus token stream in
    // doc_id order and split it into fixed W=512-token training
    // sequences — each doc's (start_off, first_seq, last_seq) is the
    // doc->sequence placement map pretraining data loaders need. The
    // global running offset is a TWO-PHASE distributed prefix sum
    // (range-partition by doc_id, per-partition totals collected — one
    // long per partition — then broadcast prefix + partition-local
    // scan): a naive `sum over (ORDER BY doc_id)` window funnels the
    // whole corpus through ONE reducer, the classic scale-killer.
    // TextSpec pins two-phase == naive-window equality.
    "q77_pack_offsets" -> ((s, d) => {
      import s.implicits._
      val W = 512L
      val parted = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n"))
        .repartitionByRange(s.sparkContext.defaultParallelism,
          col("doc_id"))
        .sortWithinPartitions("doc_id")
        .as[(Long, Long)]
      DistributedPrefix.scan(parted, 0L,
        (a: Long, t: (Long, Long)) => a + t._2, (x: Long, y: Long) => x + y) {
        case (off, (id, n)) => (id, off, off / W, (off + n - 1) / W)
      }.toDF("doc_id", "start_off", "first_seq", "last_seq")
    }),

    // Deterministic global shuffle -> fixed-size training SHARDS — the
    // dataloader-prep step between curation and training: the "random"
    // epoch order must be reproducible across engines, runs, and
    // cluster sizes, so the shuffle is a SORT on md5(doc_id) and the
    // global position comes from the same two-phase prefix count as
    // q77 (range-partition on the hash, one O(partitions) collect,
    // broadcast offsets, partition-local scan — never a single-reducer
    // global window). Emits the per-shard manifest a trainer consumes:
    // doc count, char volume, and an order-invariant membership
    // checksum (bit_xor of ids) that pins EXACT shard assignment.
    "q136_shard_manifest" -> ((s, d) => {
      import s.implicits._
      val ShardSize = 64L
      val parted = Tables.load(s, d, "documents")
        .select(md5(col("doc_id").cast("string")).as("h"),
          col("doc_id"), col("n_chars").cast("long").as("nc"))
        .repartitionByRange(s.sparkContext.defaultParallelism,
          col("h"), col("doc_id"))
        .sortWithinPartitions("h", "doc_id")
        .as[(String, Long, Long)]
      DistributedPrefix.scan(parted, 0L,
        (a: Long, _: (String, Long, Long)) => a + 1,
        (x: Long, y: Long) => x + y) {
        case (pos, (_, id, nc)) => (pos / ShardSize, id, nc)
      }.toDF("shard_id", "doc_id", "nc")
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("nc").as("chars_total"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"),
          expr("bit_xor(doc_id)").as("doc_xor"))
    }),

    // Per-source corpus report — the monitoring surface every
    // training pipeline runs per crawl/source: volume, exact-decimal
    // average + median quality, and language-ID accuracy against the
    // table's true labels. One narrow scoring pass + one groupBy on
    // the (low-cardinality) source key.
    "q76_source_report" -> ((s, d) => {
      val langs = queries("q42_lang_id")(s, d)
        .select(col("doc_id"), col("lang_pred"))
      val qual = queries("q41_quality_score")(s, d)
        .select(col("doc_id"), col("quality"))
      val base = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .join(langs, "doc_id").join(qual, "doc_id")
      val agg = base
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          sum("n_chars").as("chars"),
          // decimal-exact sum, one double division (float sum ORDER
          // differs between engines; exact decimal doesn't)
          round(sum(col("quality").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_quality"),
          sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L))
            .as("langid_hits"))
      // Rank-based exact median: select the 1–2 middle values per
      // source by row_number, then average in DECIMAL and divide by a
      // power of two (exact in binary) — interpolation inside
      // percentile()/quantile_cont() can differ by 1 ulp between
      // engines at a rounding boundary, a rank selection can't.
      // The per-source window sorts corpus/|sources| rows per key —
      // the price of an exact median; swap to approx_percentile when
      // a sketch answer is acceptable at the 100 TB tier.
      val bySource = Window.partitionBy("source")
      val med = base.select(col("source"), col("quality"))
        .withColumn("rn", row_number().over(bySource.orderBy("quality")))
        .withColumn("cnt", count(lit(1)).over(bySource))
        .filter(col("rn") === expr("(cnt + 1) div 2") ||
          col("rn") === expr("(cnt + 2) div 2"))
        .groupBy("source")
        .agg(round(sum(col("quality").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("p50_quality"))
      agg.join(med, "source")
        .select(col("source"), col("docs"), col("chars"),
          col("avg_quality"), col("p50_quality"), col("langid_hits"))
    }),

    // Token-budget mixture planning: the "data mixing" step that turns
    // a corpus + a token budget into per-source sampling rates. Equal
    // target share per source; a source with fewer tokens than its
    // share is taken whole (rate 1.0) — the allocation is computed in
    // INTEGER token units (budget div n_sources, then min against the
    // source's own total) so the cross-engine gate is exact, with one
    // display-only double division at the end. One narrow token pass +
    // a groupBy on the low-cardinality source key; the |sources|
    // scalar is bounded driver metadata.
    "q121_token_mixture" -> ((s, d) => {
      val budget = 20000L
      val per = Tables.load(s, d, "documents")
        .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("n").as("tokens"))
        .cache() // source-cardinality rows; read for |sources| + output
      val nSources = per.count()
      per.withColumn("alloc_tokens",
          least(col("tokens"), lit(budget / nSources)))
        .withColumn("rate",
          round(col("alloc_tokens").cast("double") / col("tokens"), 6))
        .select("source", "docs", "tokens", "alloc_tokens", "rate")
    }),

    // Quality-WEIGHTED deterministic downsampling: keep a doc with
    // probability == its quality score, decided by a reproducible
    // uniform variate derived from the content md5 (first 8 hex chars
    // / 2^32) — the preferential sampler training pipelines use to
    // upweight high-quality data while staying reproducible across
    // reruns AND engines (seeded RNG sampling is neither). Pure narrow
    // ops; the per-language acceptance report is one tiny groupBy.
    "q81_weighted_sample" -> ((s, d) => {
      val u = conv(substring(fingerprint(col("text")), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0) // 2^32
      val qual = queries("q41_quality_score")(s, d)
        .select(col("doc_id"), col("quality"))
      val langs = queries("q42_lang_id")(s, d)
        .select(col("doc_id"), col("lang_pred"))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), u.as("u"))
        .join(qual, "doc_id").join(langs, "doc_id")
        .withColumn("keep", (col("u") < col("quality")).cast("long"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("total"), sum("keep").as("sampled"),
          round(sum(col("quality").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("expected_rate"))
    }),

    // Unigram-LM document scoring (the cheap "perplexity-ish" quality
    // signal pipelines run before a real LM): corpus unigram
    // frequencies -> per-doc mean token log-probability. Two shuffles
    // total (vocab count, per-doc mean); the vocab joins back
    // BROADCAST (a natural-language vocab is ~1e6 rows — executor-mem
    // scale — while the corpus is the 100TB side; a genuinely huge
    // vocab would flip this to a shuffle join on the token key).
    // Per-token logp is rounded to 8 and summed as DECIMAL so the
    // cross-engine float-sum-order trap can't bite.
    "q86_unigram_logprob" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      val freq = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum("cnt").as("total"))
      val logp = freq.crossJoin(broadcast(total))
        .select(col("t"),
          round(log(col("cnt").cast("double") / col("total")), 8)
            .cast("decimal(20,8)").as("logp"))
      toks.join(broadcast(logp), "t")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum(col("logp")).cast("double") / count(lit(1)), 6)
            .as("avg_logp"))
    }),

    // TF-IDF top terms per document — the keyword/feature-extraction
    // pass of a text pipeline: tf = in-doc occurrences, idf =
    // ln((N+1)/(df+1)) (smoothed), top-5 terms per doc by score with
    // a deterministic term tie-break. Scale shape: the df table is a
    // VOCABULARY (tiny vs corpus) built by one partial+final agg and
    // joined back BROADCAST; the only per-doc exchange is the tf
    // groupBy, and top-5 is a bounded per-doc window on that same
    // partitioning. Scores are rounded to 6 before ranking so the
    // cross-engine float comparison is on identical values.
    "q91_tfidf_topterms" -> ((s, d) => {
      val tf = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val n = Tables.load(s, d, "documents").count()
      val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "t")
        .withColumn("score", round(col("tf")
          * log((lit(n + 1.0)) / (col("df") + lit(1.0))), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("score").desc, col("t").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("doc_id"), col("rk"), col("t").as("term"),
          col("tf"), col("df"), col("score"))
    }),

    // CHI-SQUARE token-class association (feature selection for a
    // corpus classifier, Yang-Pedersen style): per token, the χ²
    // statistic of the presence × language contingency table — which
    // tokens carry language signal, ranked. Engine-exact: every cell
    // term is (O·D − n_t·D_l)² over an integer denominator — ONE
    // double division of exact integers, rounded to 6 and summed as
    // DECIMAL (the q93/q176 idiom), so the statistic is identical in
    // both engines regardless of summation order. The absent-row
    // cell shares the same squared numerator (row sums are
    // complementary); n_t = D would zero its denominator and is
    // guarded to 0 (all absent cells empty, expected 0). Scale shape:
    // one distinct on (doc, lang, token), one token-keyed count, the
    // K-row language table broadcast — the grid is vocabulary-sized,
    // never corpus-sized; top-50 fuses to a TakeOrdered.
    "q188_token_class_chi2" -> ((s, d) =>
      tokenClassChi2(Tables.load(s, d, "documents"))
        .orderBy(col("chi2").desc, col("token").asc).limit(50)),

    // CONFUSION MATRIX of the lang-ID heuristic against the corpus's
    // true labels — the eval artifact every classifier in the
    // pipeline owes its consumers. One scan, one (true, pred)
    // exchange; the matrix is label-domain² rows, never corpus-sized.
    "q193_lang_confusion" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .select(col("lang").as("true_lang"),
          langPredExpr.as("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))),

    // COHEN'S KAPPA of predictor vs truth — chance-corrected
    // agreement, exact: with D = total, diag = Σ agreements and
    // pe_num = Σ_label rowTotal·colTotal, κ = (D·diag − pe_num) /
    // (D² − pe_num) — all integers until ONE final division, so both
    // engines agree bit-for-bit. The matrix is bounded by the label
    // domain (≤ 6²), so finishing the scalar from its collect is a
    // bounded driver fold, not a corpus collect.
    "q194_cohens_kappa" -> ((s, d) => {
      import s.implicits._
      val m = Tables.load(s, d, "documents")
        .select(col("lang").as("t"), langPredExpr.as("p"))
        .groupBy("t", "p").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
      val total = m.map(_._3).sum
      val diag = m.filter(r => r._1 == r._2).map(_._3).sum
      val rowTot = m.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._3).sum }
      val colTot = m.groupBy(_._2).map { case (k, v) =>
        k -> v.map(_._3).sum }
      val peNum = (rowTot.keySet ++ colTot.keySet).toSeq.map(l =>
        rowTot.getOrElse(l, 0L) * colTot.getOrElse(l, 0L)).sum
      val num = total * diag - peNum
      val den = total * total - peNum
      val kappa = BigDecimal(num.toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((total, diag, peNum, num, den, kappa))
        .toDF("n", "diag", "pe_num", "kappa_num", "kappa_den", "kappa")
    }),

    // Corpus drift monitor: Jensen-Shannon divergence between the
    // existing corpus's and the new batch's token distributions (same
    // %10 split as q88) — the distribution-shift alarm a pipeline
    // checks before admitting a crawl. One shuffle (the token-level
    // two-sided count), then a scalar: per-token JS terms are rational
    // arithmetic on counts + one ln, rounded to 10 and summed as
    // DECIMAL so the scalar is cross-engine exact. JS needs no
    // smoothing: m = (p+q)/2 > 0 wherever either side is present.
    "q93_corpus_drift" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select((col("doc_id") % 10 === 0).as("is_new"),
          explode(tokens(col("text"))).as("t"))
      val counts = toks.groupBy("t").agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("qc"))
      val totals = counts.agg(sum("pc").as("pn"), sum("qc").as("qn"))
      val withP = counts.crossJoin(broadcast(totals))
        .withColumn("p", col("pc").cast("double") / col("pn"))
        .withColumn("q", col("qc").cast("double") / col("qn"))
        .withColumn("m", (col("p") + col("q")) / 2.0)
        .withColumn("term",
          (when(col("p") > 0, col("p") * log(col("p") / col("m")))
            .otherwise(0.0) * 0.5
            + when(col("q") > 0, col("q") * log(col("q") / col("m")))
              .otherwise(0.0) * 0.5))
      withP.agg(
        max(col("pn")).as("corpus_tokens"),
        max(col("qn")).as("batch_tokens"),
        count(lit(1)).as("union_vocab"),
        round(sum(round(col("term"), 10).cast("decimal(20,10)"))
          .cast("double"), 6).as("js_div"))
    }),

    // Per-group deterministic sample: k=3 docs per TRUE language,
    // chosen by md5 order — the "show me a few examples per stratum"
    // pass, reproducible across reruns AND engines (a seeded RNG
    // reservoir is neither). One shuffle on the group key; the window
    // is bounded per group.
    "q103_group_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("u").asc, col("doc_id").asc)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          fingerprint(col("text")).as("u"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("rk"), col("doc_id"))
    }),

    // Curriculum length binning: per-language doc-length deciles
    // (ntile over a TOTAL order — n_chars with doc_id tie-break, so
    // the bin assignment is deterministic and cross-engine exact).
    // The batching/curriculum pass: group docs into length buckets so
    // training batches pack sequences of similar length. One shuffle
    // on the (low-cardinality) language key; the window is the
    // standard per-group sort.
    "q104_length_bins" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n_chars").asc, col("doc_id").asc)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("bin", ntile(10).over(w))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("docs"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
    }),

    // Deterministic stratified train/val/test split: assignment from
    // the content md5 (u < 0.8 train, < 0.9 val, else test) — the
    // split every pipeline needs to be REPRODUCIBLE across reruns,
    // engines, and corpus growth (a doc's split never changes when
    // other docs are added, which row_number- or RNG-based splits
    // can't promise). Pure narrow ops + one tiny groupBy; the
    // id-checksum makes the exact membership value-checked, not just
    // the counts.
    "q105_split_assign" -> ((s, d) => {
      val u = conv(substring(fingerprint(col("text")), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), u.as("u"))
        .withColumn("split",
          when(col("u") < 0.8, "train")
            .when(col("u") < 0.9, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("docs"),
          sum("doc_id").as("id_checksum"))
    }),

    // OOV-rate audit: induce the top-K=20 vocabulary by corpus
    // frequency (deterministic token tie-break), then per-source
    // fraction of token OCCURRENCES outside it — the tokenizer-
    // coverage check run before committing a vocab. Scale shape: the
    // vocabulary is induced by one partial+final agg + TakeOrdered
    // (no global sort) and joined back BROADCAST; the corpus-side
    // exchange is only the final per-source agg.
    "q106_oov_rate" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("t"))
      val vocab = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("t").asc).limit(20)
        .select(col("t"), lit(1).as("iv"))
      toks.join(broadcast(vocab), Seq("t"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("tokens"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("oov"),
          round(sum(when(col("iv").isNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("oov_rate"))
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    // A-ES): each doc gets key = ln(u)/w for a content-md5-derived
    // uniform u and weight w = quality; the top-k keys ARE a weighted
    // sample without replacement. ln(u)/w is order-equivalent to the
    // paper's u^(1/w) and better conditioned. One distributed top-k
    // (TakeOrdered — no global sort); reproducible across reruns AND
    // engines, which per-partition RNG reservoirs are not. Keys
    // rounded to 6 before ranking so the cross-engine comparison is
    // on identical values; doc_id breaks ties.
    "q115_weighted_sample_k" -> ((s, d) => {
      val u = conv(substring(fingerprint(col("text")), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)
      val qual = queries("q41_quality_score")(s, d)
        .select(col("doc_id"), col("quality"))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), u.as("u"))
        .filter(col("u") > 0) // md5 prefix 00000000 would give ln(0)
        .join(qual, "doc_id")
        .withColumn("key", round(log(col("u")) / col("quality"), 6))
        .orderBy(col("key").desc, col("doc_id").asc).limit(32)
        .select(col("doc_id"), col("key"))
    }),

    // Deterministic hash sampling + stratification report: keep docs
    // whose content-hash first nibble < 2 (a reproducible 1/8 — the
    // downsampling every training pipeline needs to be REPRODUCIBLE
    // across reruns and engines, which seeded RNG sampling is not),
    // reported per predicted language. Pure narrow ops + one tiny
    // groupBy; md5 is engine-independent, so the sample is exactly
    // oracle-checkable.
    "q68_hash_sample" -> ((s, d) => {
      val langs = queries("q42_lang_id")(s, d)
        .select(col("doc_id"), col("lang_pred"))
      val keep = conv(substring(fingerprint(col("text")), 1, 1), 16, 10)
        .cast("int") < 2
      Tables.load(s, d, "documents")
        .select(col("doc_id"), keep.as("keep"))
        .join(langs, "doc_id")
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("total"),
          sum(col("keep").cast("long")).as("sampled"))
    }),

    // Bigram language model with add-k smoothing (k=0.5) scored per
    // document — the perplexity-filter shape one tier above q86's
    // unigram. Bigram extraction is NARROW: zip_with of the token
    // array against its own tail (no posexplode+window, so no
    // per-token shuffle just to pair neighbors). The model side is
    // vocabulary-sized — bigram counts (one agg), context counts
    // derived by re-aggregating the bigram table (not a second corpus
    // pass), and |V|. The model joins back as a plain equi-join: the
    // bigram TYPE inventory grows ~linearly with corpus tokens (Heaps'
    // law), so a mandatory broadcast would OOM at scale — AQE
    // broadcasts it at runtime when it actually measures small (q242's
    // idiom; contrast q202, whose broadcast side is vocab-sized
    // marginals). ln() is rounded to 8 decimals and summed as DECIMAL
    // so cross-engine totals are exact (q86 idiom).
    "q126_bigram_lm" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val toks = tokens(col("text"))
      val big = docs
        .filter(size(toks) >= 2)
        .select(col("doc_id"),
          explode(zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
        .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      val c2 = big.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("t1").agg(sum("c2").as("c1"))
      val vocab = docs.select(explode(toks).as("t"))
        .agg(countDistinct("t")).head.getLong(0)
      val lp = c2.join(c1, "t1").select(col("t1"), col("t2"),
        round(log((col("c2") + lit(0.5))
          / (col("c1") + lit(0.5) * lit(vocab.toDouble))), 8)
          .cast("decimal(20,8)").as("logp"))
      big.join(lp, Seq("t1", "t2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("logp")).cast("double") / count(lit(1)), 6)
            .as("avg_logp"))
    }),

    // PMI COLLOCATIONS — association mining over adjacent-token
    // pairs, the phrase-discovery pass (Church & Hanks 1990) that
    // decides which bigrams to merge before tokenizer training. Pair
    // extraction is the same NARROW zip_with as q126 (no window just
    // to pair neighbors); marginals c_a (left) / c_b (right) come
    // from re-aggregating the bigram table, never a second corpus
    // scan, and join back BROADCAST. RANKING is float-free: the
    // monotone transform r = (c_ab·N·1e6) div (c_a·c_b) is pure
    // BIGINT (≤ ~1e17 at any tested sf), so the top-20 cut is
    // bit-identical in both engines; the ln is display-only, rounded
    // to 6, never compared against the cut.
    "q202_pmi_collocations" -> ((s, d) =>
      pmiCollocations(Tables.load(s, d, "documents"), minCount = 5)
        .orderBy(col("r").desc, col("a").asc, col("b").asc)
        .limit(20)),

    // Shannon entropy of each source's token distribution — the
    // corpus-diversity signal (template farms and boilerplate-heavy
    // sources score low; it complements q93's cross-snapshot drift).
    // Exactness: H = -(Σ n_t·ln(n_t/N)) / N with ln rounded to 8
    // decimals, the n_t·ln product and its sum carried in DECIMAL —
    // integer×decimal is exact in both engines, so the only float op
    // is one final division. Scale: per-(source, token) counts are one
    // partial+final agg; the per-source totals table is |sources| rows,
    // broadcast back.
    "q130_token_entropy" -> ((s, d) => {
      val cnt = Tables.load(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("source")
        .agg(sum("n").as("nn"), count(lit(1)).as("vocab"))
      cnt.join(broadcast(tot), "source")
        .withColumn("term", col("n").cast("decimal(12,0)")
          * round(log(col("n").cast("double") / col("nn")), 8)
            .cast("decimal(20,8)"))
        .groupBy("source")
        .agg(max("nn").as("n_tokens"), max("vocab").as("vocab"),
          round((-sum(col("term"))).cast("double") / max(col("nn")), 6)
            .as("entropy"))
    }),

    // Gopher-style within-document repetition quality rules (Rae et
    // al. 2021 §A1.1: fraction of duplicated words, most-common-word
    // fraction, top 2-gram fraction). The four integers every rule is
    // a ratio of — total tokens, distinct tokens, max word
    // multiplicity, max contiguous-bigram multiplicity — come from ONE
    // codegen'd per-row pass ([[org.apache.spark.sql.graft.RepetitionStats]]),
    // so the filter costs zero shuffles before the per-source report:
    // the explode + groupBy(doc, word) shape this replaces shuffles
    // |docs|×|tokens| rows TWICE to answer a per-row question. Flag
    // thresholds compare cross-multiplied INTEGERS (10·dup > 6·total,
    // 1000·top > 125·total) so no decimal-vs-double comparison can
    // straddle an engine boundary; per-doc fractions are rounded to 8
    // as DECIMAL and averaged with one final double division (the q86
    // discipline).
    "q149_repetition_quality" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .select(col("source"),
          org.apache.spark.sql.graft.RepetitionStats
            .column(tokens(col("text"))).as("r"))
        .select(col("source"), col("r.total").as("total"),
          col("r.dist").as("dist"), col("r.top").as("top"),
          col("r.top2").as("top2"))
        .withColumn("dup_frac",
          round((col("total") - col("dist")).cast("double")
            / col("total"), 8).cast("decimal(18,8)"))
        .withColumn("top_frac",
          round(col("top").cast("double") / col("total"), 8)
            .cast("decimal(18,8)"))
        .withColumn("bg_frac",
          round(col("top2").cast("double")
            / greatest(col("total") - 1, lit(1)), 8).cast("decimal(18,8)"))
        .groupBy("source").agg(
          count(lit(1)).as("docs"),
          sum(when((col("total") - col("dist")) * 10 > col("total") * 6
            || col("top") * 1000 > col("total") * 125, 1L)
            .otherwise(0L)).as("flagged"),
          round(sum(col("dup_frac")).cast("double") / count(lit(1)), 6)
            .as("avg_dup_frac"),
          round(sum(col("top_frac")).cast("double") / count(lit(1)), 6)
            .as("avg_top_frac"),
          round(sum(col("bg_frac")).cast("double") / count(lit(1)), 6)
            .as("avg_bigram_frac"))),

    // DSIR-style importance weights (Xie et al. 2023): score every
    // document by how much more likely its tokens are under a TARGET
    // unigram LM (here the deterministic doc_id%7==0 "curated" subset)
    // than under the full-corpus LM — the data-selection signal that
    // picks pretraining documents resembling a trusted set. ONE
    // token-level pass builds BOTH LMs (corpus count + conditional
    // target count in the same aggregate — not two scans); the
    // per-word log-ratio table is vocabulary-sized and broadcast back,
    // so scoring re-shuffles nothing but the per-doc aggregation.
    // Per-word log-ratios rounded to 8 as DECIMAL, summed exactly, one
    // final double division (the q86/q126 discipline); top-20 with
    // doc_id tie-break.
    "q151_dsir_weights" -> ((s, d) => {
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"),
          (col("doc_id") % 7 === 0).as("is_tgt"))
      val lm = toks.groupBy("t").agg(
        count(lit(1)).as("cc"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"))
      val tot = lm.agg(sum("cc").as("totc"), sum("ct").as("tott"),
        count(lit(1)).as("v"))
      val w = lm.crossJoin(broadcast(tot))
        .select(col("t"),
          round(log((col("ct") + 1).cast("double")
              / (col("tott") + col("v")))
            - log((col("cc") + 1).cast("double")
              / (col("totc") + col("v"))), 8)
            .cast("decimal(20,8)").as("lr"))
      toks.join(broadcast(w), "t")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          round(sum(col("lr")).cast("double") / count(lit(1)), 6)
            .as("dsir_score"))
        .orderBy(col("dsir_score").desc, col("doc_id").asc)
        .limit(20)
    }),

    // DoReMi-style learned domain reweighting (Xie et al. 2023,
    // "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    // Pretraining"): multiplicative-weights / group-DRO update over
    // the per-SOURCE stats — each round, domains whose loss exceeds
    // the current WEIGHTED-mixture reference loss gain weight, so
    // mass shifts toward the domains the proxy model is worst at.
    // The loss proxy here is the mean document length per domain (any
    // per-doc score column drops in — the op is the update, not the
    // loss). Arithmetic is the pageRankFixedPoint discipline: BIGINT
    // 1e-6 fixed point, every division non-negative (floor == trunc,
    // so DuckDB `//` and JVM `/` agree bit for bit), excess
    // normalized by the static loss spread, eta = 1/4, 5 rounds,
    // final weights in ppm of the total. Scale shape: the ONLY
    // distributed work is one groupBy over the corpus (per-domain
    // sum/count — map-side combined); the update itself is O(domains
    // x rounds) driver scalars, exactly how mixture weights are fit
    // against a 100 TB corpus. (The 1e6 x sum(n_chars) product is
    // exact BIGINT to ~9e12 chars per domain; past that, aggregate
    // to DECIMAL first.)
    "q308_doremi_weights" -> ((s, d) => {
      import s.implicits._
      val dom = Tables.load(s, d, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"),
          expr("(1000000L * sum(n_chars)) div count(*)").as("loss_fp"))
        .collect() // bounded: sources are an enum, never corpus-sized
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val S = 1000000L
      val minLoss = dom.map(_._3).min
      val spread = math.max(dom.map(_._3).max - minLoss, 1L)
      var w = dom.map(_ => S)
      for (_ <- 1 to 5) {
        val sumW = w.sum
        val refLoss = dom.zip(w).map { case ((_, _, l), wi) =>
          wi * l }.sum / sumW
        val refTerm = ((refLoss - minLoss) * S / spread) / 4
        w = dom.zip(w).map { case ((_, _, l), wi) =>
          val excTerm = ((l - minLoss) * S / spread) / 4
          wi * (S + excTerm - refTerm) / S
        }
      }
      val sumW = w.sum
      dom.zip(w).map { case ((src, n, l), wi) =>
        (src, n, l, wi * S / sumW)
      }.toSeq.toDF("source", "n_docs", "loss_fp", "weight_ppm")
        .orderBy("source")
    }),

    // Zipf rank-frequency diagnostic: least-squares slope of
    // ln(count) against ln(rank) over the top-1000 vocabulary — the
    // corpus-health check that catches template farms (slope near 0)
    // and single-source collapse (cliff). Closed-form regression over
    // DECIMAL-exact sums of per-term rounded logs (the q86/q130 float
    // discipline: identical doubles → identical rounded decimals →
    // exact sums in any order → ONE final double division per
    // coefficient). TakeOrdered for the top-1000; one word-keyed
    // exchange for the counts.
    "q177_zipf_slope" -> ((s, d) => {
      import s.implicits._
      // distributed part: word counts + TakeOrdered top-1000; the
      // regression then runs on the BOUNDED collected list (rank =
      // position in the deterministic (count desc, word) order — no
      // global window, the skyline/PCA driver discipline). Per-term
      // ln rounded to 8 and summed as exact BigDecimal, mirroring
      // the oracle's DECIMAL algebra term for term.
      val top = Tables.load(s, d, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(1000)
        .collect().map(_.getLong(1))
      def r8(v: Double): BigDecimal =
        BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      val pts = top.zipWithIndex.map { case (c, i) =>
        (r8(math.log((i + 1).toDouble)), r8(math.log(c.toDouble)))
      }
      val n = pts.length
      val sx = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val intercept = (sy.toDouble - slope * sx.toDouble) / n
      def r6(v: Double): Double =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((n.toLong, r6(slope), r6(intercept)))
        .toDF("n_points", "slope", "intercept")
    }),

    // BPE vocabulary INDUCTION (Sennrich et al. 2016) — the iterative
    // merge-learning loop q143's one-round pair count is the inner
    // step of. The scale shape is the whole point: the corpus is
    // scanned ONCE (word→freq, localCheckpointed); every one of the 8
    // merge rounds then runs on the VOCABULARY table (bounded by
    // distinct words, not corpus size — at 100TB the rounds cost the
    // same as here), with one driver collect of exactly 1 row (the
    // argmax pair) per round. Symbols are wrapped `<a><b>` so the
    // merge is a plain non-overlapping string replace with identical
    // left-to-right semantics in Spark and the oracle engine; argmax
    // ties break lexicographically in both.
    "q155_bpe_learn" -> ((s, d) => {
      import s.implicits._
      val (merges, _) = bpeLearn(wordFreq(s, d), BpeRounds)
      merges.toDF("round", "pair", "merged", "n")
    }),

    // BPE tokenizer APPLICATION: encode the corpus with the 8 learned
    // merges and report per-source token-per-word and compression
    // ratios — the "how many tokens will training cost" readout.
    // Encoding happens on the DISTINCT-word vocabulary (each merge is
    // one chained literal replace), which then joins back to the
    // corpus token stream BROADCAST — the corpus is never shuffled to
    // be encoded, only the per-source counters exchange.
    "q156_bpe_apply" -> ((s, d) => {
      val (_, vocab) = bpeLearn(wordFreq(s, d), BpeRounds)
      val enc = vocab.select(col("w"),
        size(split(regexp_replace(col("sym"), "^<|>$", ""), "><"))
          .as("n_sym"))
      Tables.load(s, d, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .join(broadcast(enc), "w")
        .groupBy("source").agg(
          count(lit(1)).as("words"),
          sum(length(col("w")).cast("long")).as("chars"),
          sum(col("n_sym").cast("long")).as("bpe_tokens"),
          round(sum(col("n_sym").cast("long")).cast("double")
            / count(lit(1)), 6).as("avg_tokens_per_word"),
          round(sum(length(col("w")).cast("long")).cast("double")
            / sum(col("n_sym").cast("long")), 6).as("compression"))
    }),

    // N-GRAM NOVELTY CURVE — the corpus-growth signal: as a crawl
    // ingests docs in arrival order (doc_id), what fraction of each
    // doc's distinct 5-gram shingles has NEVER appeared in an earlier
    // doc? A healthy fresh crawl holds high novelty; a saturated or
    // self-copying one decays toward 0 — the curve (here binned into
    // 10 arrival-order deciles) is the "is more data still new data?"
    // dashboard. First occurrence is a pure min(doc_id) per shingle —
    // one keyed agg over the shingle inventory + one co-keyed join
    // back, never a window, never per-pair work. All counts integer;
    // one rounded division at the end.
    "q225_ngram_novelty" -> ((s, d) =>
      ngramNovelty(Tables.load(s, d, "documents"))),

    // KNESER-NEY CONTINUATION COUNTS — the smoothing statistic the
    // MLE bigram LM (q126) lacks: a word's continuation count is how
    // many DISTINCT left contexts it follows (bigram TYPES, not
    // occurrences) — "francisco" is frequent but only ever follows
    // "san", so its continuation probability is tiny. This is the
    // unigram distribution interpolated KN backs off to. One distinct
    // over the bigram-type inventory + one agg; counts exact, the
    // probability is a single rounded division.
    "q226_kn_continuation" -> ((s, d) =>
      knContinuation(Tables.load(s, d, "documents"), k = 20)),

    // INTERPOLATED KNESER-NEY bigram probabilities (Chen & Goodman
    // 1999) — the smoothing that actually ships in n-gram LMs,
    // closing the q126 (add-k) / q226 (continuation counts) arc:
    //   P_KN(w2|w1) = max(c12−D,0)/c1 + D·N1+(w1,·)/c1 · N1+(·,w2)/T
    // with discount D = 3/4. Every input is an integer count, so
    // with D = 3/4 the probability is the EXACT RATIONAL
    //   (max(4·c12−3, 0)·T + 3·nl·cr) / (4·c1·T)
    // — both engines emit the identical BIGINT num/den pair (the
    // float division happens once, for display). The top-20 cut by
    // (c12 desc, t1, t2) happens BEFORE the model joins, so the
    // context/continuation lookups run with a 20-row broadcast side
    // against the vocabulary-sized tables.
    "q227_kn_bigram" -> ((s, d) =>
      knBigramProb(Tables.load(s, d, "documents"), k = 20)),

    // CONTENT-DEFINED CHUNKING DEDUP — the storage-dedup pass (LBFS /
    // restic-style CDC, token granularity): a chunk boundary falls
    // AFTER any token whose character-code sum ≡ 7 (mod 8), so
    // boundaries are CONTENT-LOCAL — an insertion re-chunks only its
    // own neighborhood, unlike q74's fixed-size chunking where one
    // shifted token re-fingerprints every downstream chunk. Chunks
    // are md5-fingerprinted; output = corpus dedup census (total vs
    // distinct chunks, mean chunk length) + the top-10 most repeated
    // chunks. One doc-keyed exchange (the per-doc position window);
    // everything after the chunk table is fingerprint-keyed aggs.
    "q235_cdc_chunks" -> ((s, d) => {
      val ch = cdcChunks(Tables.load(s, d, "documents"))
        .localCheckpoint(true) // feeds the census AND the top-10
      val tot = ch.agg(count(lit(1)).as("nc"),
        countDistinct(col("fp")).as("nd"),
        sum(col("ntok")).as("nt")).head()
      val (nC, nD, nT) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
      val w = Window.partitionBy(lit(1))
        .orderBy(col("n_occ").desc, col("fp").asc)
      ch.groupBy("fp")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("ntok")).as("tok_len"))
        .orderBy(col("n_occ").desc, col("fp").asc).limit(10)
        .withColumn("rk", row_number().over(w)) // bounded 10-row rank
        .select(col("rk"), col("fp"), col("n_occ"), col("n_docs"),
          col("tok_len"), lit(nC).as("n_chunks_total"),
          lit(nD).as("n_distinct_total"),
          round(lit(nD.toDouble) / lit(nC.toDouble), 6)
            .as("dedup_ratio"),
          round(lit(nT.toDouble) / lit(nC.toDouble), 6)
            .as("mean_chunk_tokens"))
    }),

    // PERPLEXITY FILTER — the canonical pretraining quality filter
    // (CCNet / GPT-3 style): score every document by its mean bigram
    // negative log-probability under the corpus's OWN interpolated-KN
    // LM (q227's exact rational), so unusual bigram structure reads
    // as a high score. In-corpus scoring means every scored bigram is
    // in the inventory — no OOV path; per-bigram ln is rounded to 8
    // and DECIMAL-summed per doc (the q86 log-prob discipline). Scale:
    // the inventory builds in one corpus scan + keyed agg; doc-bigram
    // rows equi-join it on (t1,t2) and the vocab-sized context/
    // continuation tables on t1/t2 — no window, no self-join.
    "q242_perplexity_filter" -> ((s, d) =>
      knDocPerplexity(Tables.load(s, d, "documents"))),

    // SOURCE-VS-GLOBAL UNIGRAM KL — the corpus-mixing drift
    // diagnostic: KL(p_source ‖ p_global) per source over the token
    // unigram distributions, the number that says which source's
    // language is furthest from the blend it feeds. Exact algebra:
    // per (source, token) the ratio p_s/p_g is the integer ratio
    // c_st·N / (n_s·c_t), its ln rounds to 8dp and rides a DECIMAL
    // weighted sum (weight c_st, integer); ONE double division by n_s
    // at the end. One corpus scan; the (source, token) table feeds
    // both marginals and the scoring join (vocab-sized, never
    // row-scale).
    "q250_source_kl" -> ((s, d) =>
      sourceUnigramKl(Tables.load(s, d, "documents"))),

    // SKIP-GRAM PAIR GENERATION — the word2vec/fastText training-data
    // prep shape: every (center, context) token pair within a ±2
    // window, generated WITHOUT a per-doc cross join — one side
    // replicates to its 4 window offsets and the pair join is a plain
    // (doc_id, pos) EQUI-join, so the output is exactly 4 rows per
    // token minus boundary losses (linear, hash-partitionable). The
    // published frame is the top-20 pair types (count desc, pair asc)
    // next to the global pair/type census.
    "q249_skipgram_pairs" -> ((s, d) =>
      skipgramPairs(Tables.load(s, d, "documents"), window = 2,
        topK = 20)),

    // TEMPERATURE-SCALED MIXTURE WEIGHTS — the multi-source sampling
    // schedule (the alpha = 0.3 smoothing exponent of XLM-R / GPT-3
    // style mixtures): w_s ∝ n_s^alpha flattens the source-size
    // distribution so small sources aren't drowned. Output per
    // source: token count, raw share, smoothed weight, and effective
    // epochs per mixture pass (w_s·N/n_s — the over-exposure signal
    // saying how often a small source repeats). pow is rounded to 8
    // and summed as DECIMAL over the |sources|-sized table (q177
    // idiom); shares divide once at the end.
    "q230_mixture_weights" -> ((s, d) =>
      mixtureWeights(Tables.load(s, d, "documents"))),

    // DICTIONARY-PHRASE SCAN (Aho–Corasick) — the blocklist filter
    // shape: match a 30-phrase dictionary (the corpus's top-20
    // bigrams + top-10 trigrams, a deterministic stand-in for a
    // spam/boilerplate blocklist) against every document in ONE
    // automaton pass over the token stream — goto/failure links over
    // the token alphabet, so cost is O(tokens + matches) per doc
    // regardless of dictionary size, where the naive path re-scans
    // the doc once per pattern. The automaton is driver-built from
    // the 30-row dict and BROADCAST; docs never shuffle. The oracle
    // brute-forces every (position, pattern) pair — equality proves
    // the failure links lose nothing (overlaps and shared-prefix
    // phrases included).
    "q258_dict_phrase_scan" -> ((s, d) =>
      dictPhraseScan(Tables.load(s, d, "documents"))),

    // REPETITION QUALITY FILTERS (the Gopher/MassiveText shape, Rae
    // et al. 2021 table A1): a doc whose mass concentrates in one
    // repeated n-gram is boilerplate, not language. Token analogues
    // of the published character-fraction rules: top-2-gram coverage
    // (occurrences of the most frequent bigram x 2 / tokens) and the
    // duplicate-3-gram fraction (occurrences belonging to trigram
    // types seen more than once). Two keyed aggs per n — (doc, gram)
    // then doc — never a window, never per-pair work; integer counts
    // with two rounded divisions per doc.
    "q253_repetition_filter" -> ((s, d) =>
      repetitionFilter(Tables.load(s, d, "documents"))),

    // Corpus boilerplate heavy hitters — Misra–Gries sketch pass +
    // broadcast exact-verify pass over the 5-gram shingle stream;
    // the planted en-doc template's four interior shingles are the
    // only fragments above 1/200 of the stream.
    "q264_boilerplate_hh" -> ((s, d) =>
      boilerplateHeavyHitters(Tables.load(s, d, "documents"))),

    // UTF-8 validity census — RFC 3629 sequence walk over planted
    // multi-byte + malformed streams; every count is closed-form in
    // the source length, so a validator that misclassifies ANY of
    // the table-3.7 corners moves a column.
    "q265_utf8_census" -> ((s, d) =>
      utf8CensusTable(Tables.load(s, d, "documents"))),

    // SRT subtitle round-trip — the aligned-text format speech
    // corpora ship in: strict cue-block grammar (consecutive
    // indices, exact timestamp syntax, ordering/overlap/blank-line
    // rules), with speech-time and span features closed-form in
    // (doc_id, token count).
    "q279_srt_subtitles" -> ((s, d) =>
      parseSubtitles(Tables.load(s, d, "documents"))),

    // Unigram-LM (SentencePiece-style) tokenizer — the OTHER
    // tokenizer family next to BPE: corpus-derived piece inventory,
    // exact fixed-point −ln p costs, per-distinct-word Viterbi with
    // a deterministic fewest-pieces tie-break. Top-50 words by
    // corpus frequency.
    "q293_unigram_segment" -> ((s, d) =>
      unigramSegment(Tables.load(s, d, "documents"), topK = 50))
  )

  /** q293's unigram-LM tokenizer — the SentencePiece-style
    * segmentation next to BPE (q143/q155): Viterbi-segment each
    * word under a unigram piece inventory, minimizing Σ −ln p(piece)
    * (ties to fewest pieces). The inventory is corpus-derived and
    * fully deterministic: every character, plus every character
    * bigram/trigram whose token-stream occurrence count clears
    * W div 50 (W = total word occurrences); p(piece) =
    * cnt / Σ_vocab cnt. Costs ride the repo's exact-ln discipline:
    * round(ln(total/cnt)·1e8) as BIGINT — integral after rounding,
    * so both engines land the identical fixed-point table.
    *
    * Scale shape: ONE corpus scan builds word frequencies; gram
    * counting is a keyed agg over (piece) — the token stream never
    * re-scans; the inventory is bounded by construction
    * (≤ alphabet + 50·3 multigrams clear the threshold) and ships
    * as a broadcast cost map; Viterbi runs per DISTINCT word (the
    * dedup that makes tokenizer application cheap at 100 TB —
    * Zipf means distinct words ≪ token occurrences). */
  private[graft] def unigramSegment(docs: DataFrame, topK: Int)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true) // feeds grams ×3, the DP, and the join
    val w = wf.agg(sum("freq")).head.getLong(0)
    val thr = math.max(2L, w / 50)
    def grams(len: Int) = wf.filter(length(col("w")) >= len)
      .select(col("freq"), explode(expr(
        s"transform(sequence(1, length(w) - ${len - 1}), " +
          s"i -> substring(w, i, $len))")).as("p"))
      .groupBy("p").agg(sum("freq").as("cnt"))
    val vocab = grams(1)
      .unionAll(grams(2).filter(col("cnt") >= thr))
      .unionAll(grams(3).filter(col("cnt") >= thr))
      .localCheckpoint(true)
    val total = vocab.agg(sum("cnt")).head.getLong(0)
    val costs: Map[String, Long] = vocab.collect().map { r =>
      r.getString(0) ->
        math.round(math.log(total.toDouble / r.getLong(1)) * 1e8)
    }.toMap
    val bc = spark.sparkContext.broadcast(costs)
    wf.select(col("w"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (word, freq) =>
          val n = word.length
          val inf = Long.MaxValue / 4
          val cost = Array.fill(n + 1)(inf)
          val pieces = Array.fill(n + 1)(Int.MaxValue)
          cost(0) = 0; pieces(0) = 0
          var j = 1
          while (j <= n) {
            var l = 1
            while (l <= 3 && l <= j) {
              if (cost(j - l) < inf) cs.get(word.substring(j - l, j))
                .foreach { c =>
                  val nc = cost(j - l) + c
                  val np = pieces(j - l) + 1
                  if (nc < cost(j) ||
                      (nc == cost(j) && np < pieces(j))) {
                    cost(j) = nc; pieces(j) = np
                  }
                }
              l += 1
            }
            j += 1
          }
          // every character is in the inventory, so every word
          // segments; anything else is a real defect
          require(cost(n) < inf, s"unsegmentable word '$word'")
          (word, freq, n, pieces(n), cost(n))
        }
      }
      .toDF("word", "freq", "n_chars", "n_pieces", "cost_fp")
      .orderBy(col("freq").desc, col("word").asc).limit(topK)
  }

  /** q225's novelty curve over a (doc_id, text) frame: per
    * arrival-order decile, the fraction of distinct word 5-gram
    * shingles whose FIRST occurrence (global min doc_id owner) falls
    * in that doc. Split out so TextSpec pins the closed forms (an
    * all-identical corpus is novel only in its first doc; an
    * all-distinct corpus is novel everywhere). */
  private[graft] def ngramNovelty(docs: DataFrame): DataFrame = {
    val b = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, span) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    val toks = tokens(col("text"))
    // spreadInput: single-split scan, per-row shingle kernel (§2.5);
    // localCheckpoint: `pairs` feeds the first-occurrence agg AND the
    // join probe — left lazy, the scan+explode+distinct subtree
    // executes once per consumer (the q184 lesson)
    val pairs = graft.Util.spreadInput(docs.filter(size(toks) >= 5))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(toks) - 4),
        i => concat_ws(" ", slice(toks, i, lit(5))))).as("sh"))
      .distinct()
      .localCheckpoint(true)
    val first = pairs.groupBy("sh").agg(min("doc_id").as("fd"))
    pairs.join(first, "sh")
      .groupBy(expr(s"((doc_id - $lo) * 10) DIV $span").as("bucket"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_shingles"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty", round(
        col("n_novel").cast("double") / col("n_shingles"), 6))
      .orderBy("bucket")
  }

  /** q226's continuation-count table over a (text) frame: one row per
    * word w with cont = |{t1 : bigram type (t1, w) exists}|, ranked
    * (cont desc, w asc), top k. TextSpec pins the "frequent but
    * predictable" corner: a word that only ever follows one context
    * ranks below a rarer word with many contexts. */
  private[graft] def knContinuation(docs: DataFrame, k: Int)
      : DataFrame = {
    val toks = tokens(col("text"))
    val bg = docs.filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .distinct()
    val total = bg.count()
    bg.groupBy(col("t2").as("w")).agg(count(lit(1)).as("cont"))
      .orderBy(col("cont").desc, col("w").asc).limit(k)
      .select(col("w"), col("cont"),
        lit(total).as("total_types"),
        round(col("cont").cast("double") / lit(total.toDouble), 8)
          .as("p_cont"))
  }

  /** q227's interpolated-KN table over a (text) frame: for the top-k
    * bigrams by occurrence count, the exact-rational KN probability
    * (num/den BIGINT pair) next to the MLE. The bigram-TYPE inventory
    * (c12 per (t1,t2)) is materialized once and feeds all four
    * consumers (top-k, context totals, continuation counts, T) — the
    * q184 lesson: left lazy, Spark re-derives the corpus subtree per
    * consumer. TextSpec pins the rational algebra on a crafted corpus
    * where smoothing visibly reranks (predictable-but-frequent loses
    * mass to diverse continuations). */
  private[graft] def knBigramProb(docs: DataFrame, k: Int)
      : DataFrame = {
    val toks = tokens(col("text"))
    val c2 = docs.filter(size(toks) >= 2)
      .select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val nTypes = c2.count()
    val ctx = c2.groupBy("t1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("nl"))
    val cont = c2.groupBy("t2").agg(count(lit(1)).as("cr"))
    val top = broadcast(
      c2.orderBy(col("c12").desc, col("t1").asc, col("t2").asc)
        .limit(k))
    val num = greatest(col("c12") * 4 - 3, lit(0L)) * lit(nTypes) +
      lit(3L) * col("nl") * col("cr")
    val den = col("c1") * 4 * lit(nTypes)
    broadcast(top.join(ctx, "t1")).join(cont, "t2")
      .select(col("t1"), col("t2"), col("c12"), col("c1"),
        col("nl"), col("cr"), lit(nTypes).as("n_types"),
        num.as("kn_num"), den.as("kn_den"),
        round(col("c12").cast("double") / col("c1"), 6).as("p_mle"),
        round(num.cast("double") / den.cast("double"), 6).as("p_kn"))
      .orderBy(col("c12").desc, col("t1").asc, col("t2").asc)
  }

  /** q242's per-document fluency score: mean −ln p_KN over the doc's
    * bigram occurrences, p_KN the same exact rational as
    * [[knBigramProb]] (D = 3/4; num/den never leave integers until
    * ONE double division feeds the rounded ln). The doc-bigram frame
    * is localCheckpointed once and feeds both the inventory aggs and
    * the scoring join — the q184/q227 shared-subtree lesson. TextSpec
    * pins the closed forms: a single-bigram-type corpus scores 0
    * everywhere (p = 1 exactly), identical docs score identically,
    * and the doc holding the corpus's dominant bigram scores strictly
    * below one holding a rare bigram. */
  private[graft] def knDocPerplexity(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val dbg = docs.filter(size(toks) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("bg"))
      .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .localCheckpoint(true) // feeds the inventory AND the scoring join
    val c2 = dbg.groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val nTypes = c2.count()
    val ctx = c2.groupBy("t1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("nl"))
    val cont = c2.groupBy("t2").agg(count(lit(1)).as("cr"))
    val num = (greatest(col("c12") * 4 - 3, lit(0L)) * lit(nTypes) +
      lit(3L) * col("nl") * col("cr")).cast("double")
    val den = (col("c1") * 4 * lit(nTypes)).cast("double")
    dbg.join(c2, Seq("t1", "t2")).join(ctx, "t1").join(cont, "t2")
      .select(col("doc_id"),
        round(-log(num / den), 8).cast("decimal(28,8)").as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_nll"))
  }

  /** Token-level Aho–Corasick automaton: classic goto/failure/output
    * construction (Aho & Corasick 1975) over the token alphabet.
    * Serializable so the driver-built automaton broadcasts into the
    * scan tasks. Split out so TextSpec pins the matcher against a
    * brute-force twin on overlap- and shared-prefix-heavy fixtures. */
  private[graft] final class TokenAhoCorasick(
      patterns: Seq[Array[String]]) extends Serializable {
    private val goto_ =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[String, Int])
    private val out = scala.collection.mutable.ArrayBuffer(
      List.empty[(Int, Int)]) // (patternId, length) ending at state
    patterns.zipWithIndex.foreach { case (p, id) =>
      var st = 0
      p.foreach { tok =>
        st = goto_(st).get(tok) match {
          case Some(n) => n
          case None =>
            goto_ += scala.collection.mutable.HashMap.empty[String, Int]
            out += Nil
            val n = goto_.size - 1
            goto_(st)(tok) = n
            n
        }
      }
      out(st) = (id, p.length) :: out(st)
    }
    private val fail = new Array[Int](goto_.size)
    locally { // BFS failure links; outputs union along the chain
      val q = scala.collection.mutable.Queue.empty[Int]
      goto_(0).valuesIterator.foreach { s => fail(s) = 0; q.enqueue(s) }
      while (q.nonEmpty) {
        val r = q.dequeue()
        goto_(r).foreach { case (tok, s) =>
          q.enqueue(s)
          var f = fail(r)
          while (f != 0 && !goto_(f).contains(tok)) f = fail(f)
          fail(s) = if (goto_(f).contains(tok) && goto_(f)(tok) != s)
            goto_(f)(tok) else 0
          out(s) = out(s) ++ out(fail(s))
        }
      }
    }
    /** All matches in `toks`: (patternId, 1-based start, length). */
    def matches(toks: Array[String]): Seq[(Int, Int, Int)] = {
      val hits =
        scala.collection.mutable.ListBuffer.empty[(Int, Int, Int)]
      var st = 0
      var i = 0
      while (i < toks.length) {
        val tok = toks(i)
        while (st != 0 && !goto_(st).contains(tok)) st = fail(st)
        st = goto_(st).getOrElse(tok, 0)
        out(st).foreach { case (id, len) =>
          hits += ((id, i - len + 2, len))
        }
        i += 1
      }
      hits.toList
    }
  }

  /** q258's per-doc match table: dictionary = top-20 bigrams +
    * top-10 trigrams by corpus occurrence count (ties broken
    * lexicographically — both engines identical), matched by ONE
    * broadcast Aho–Corasick pass per doc. Overlapping and nested
    * occurrences all count, exactly as the oracle's brute
    * (position x pattern) scan does. */
  private[graft] def dictPhraseScan(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = tokens(col("text"))
    def topGrams(n: Int, k: Int): Seq[String] = {
      val parts = (0 until n).map(i =>
        slice(toks, lit(i + 1), size(toks) - (n - 1)))
      val zipped = parts.reduceLeft((a, b) =>
        zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
      docs.filter(size(toks) >= n)
        .select(explode(zipped).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g").asc).limit(k)
        .collect().map(_.getString(0)).toSeq
    }
    val dict = topGrams(2, 20) ++ topGrams(3, 10)
    val ac = new TokenAhoCorasick(dict.map(_.split(" ")))
    val bc = s.sparkContext.broadcast(ac)
    docs.select(col("doc_id"), toks.as("t"))
      .as[(Long, Array[String])]
      .mapPartitions { it =>
        val a = bc.value
        it.map { case (id, t) =>
          val m = a.matches(t)
          (id, m.size.toLong, m.map(_._1).distinct.size.toLong,
            if (m.isEmpty) 0 else m.map(_._3).max,
            if (m.isEmpty) 0 else m.map(_._2).min)
        }
      }
      .toDF("doc_id", "n_matches", "n_patterns", "longest", "first_pos")
      .orderBy("doc_id")
  }

  /** q253's per-doc repetition table over a (doc_id, text) frame:
    * top2_cov = 2 * (max bigram occurrence count) / n_tokens,
    * dup3_frac = (trigram occurrences in types with count > 1) /
    * (total trigram occurrences); keep = top2_cov <= 0.2 AND
    * dup3_frac <= 0.3 (the Gopher-style cut). Docs shorter than 3
    * tokens are kept with zero fractions (nothing to repeat). Split
    * out so TextSpec pins the closed forms: "a b a b a b" is pure
    * repetition (top2_cov = 1.0, dup3_frac = 1.0) and an all-distinct
    * doc scores 2/n and 0. */
  private[graft] def repetitionFilter(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def grams(n: Int): DataFrame = {
      val parts = (0 until n).map(i =>
        slice(toks, lit(i + 1), size(toks) - (n - 1)))
      val zipped = parts.reduceLeft((a, b) =>
        zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
      docs.filter(size(toks) >= n)
        .select(col("doc_id"), explode(zipped).as("g"))
    }
    val base = docs.select(col("doc_id"), size(toks).as("n_tokens"))
    val g2 = grams(2).groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top2_count"))
    val g3 = grams(3).groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup3_occ"),
        sum("c").as("tri_occ"))
    val top2Cov = round(lit(2) * col("top2_count").cast("double")
      / col("n_tokens"), 6)
    val dup3Frac = round(col("dup3_occ").cast("double")
      / col("tri_occ"), 6)
    base.join(g2, Seq("doc_id"), "left").join(g3, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top2_count"), lit(0L)).as("top2_count"),
        coalesce(top2Cov, lit(0.0)).as("top2_cov"),
        coalesce(col("dup3_occ"), lit(0L)).as("dup3_occ"),
        coalesce(dup3Frac, lit(0.0)).as("dup3_frac"))
      .withColumn("keep",
        col("top2_cov") <= 0.2 && col("dup3_frac") <= 0.3)
  }

  /** q250's divergence table over a (source, text) frame:
    * KL(p_s ‖ p_g) = (1/n_s)·Σ_t c_st·ln(c_st·N / (n_s·c_t)) — every
    * factor an exact integer, ln rounded to 8dp, c_st-weighted terms
    * summed as DECIMAL(38,8), one final double division. Split out so
    * TextSpec pins the closed forms: identical per-source
    * distributions give exactly 0, and two single-token disjoint
    * sources give exactly round(ln 2) each. */
  private[graft] def sourceUnigramKl(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val st = docs
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true) // feeds both marginals AND the scoring
    val ns = st.groupBy("source")
      .agg(sum("c_st").as("n_s"), count(lit(1)).as("n_types"))
    val gt = st.groupBy("t").agg(sum("c_st").as("c_t"))
    val tot = gt.agg(sum("c_t")).head().getLong(0)
    val term = round(log((col("c_st") * lit(tot)).cast("double")
      / (col("n_s") * col("c_t")).cast("double")), 8)
    st.join(gt, "t").join(broadcast(ns), "source")
      .select(col("source"), col("n_s"), col("n_types"),
        // decimal(17,0)·decimal(20,8) → decimal(38,8): exact and
        // identical to the oracle's DuckDB product type. At (18,0)
        // Spark needs precision 39, caps at 38 and drops to scale 7,
        // half-up rounding every weighted term. c_st is bounded by
        // the corpus token count, far below 1e17.
        (col("c_st").cast("decimal(17,0)")
          * term.cast("decimal(20,8)")).as("w"))
      .groupBy("source", "n_s", "n_types")
      .agg(sum("w").as("sw"))
      .select(col("source"), col("n_s").as("n_tokens"),
        col("n_types"),
        round(col("sw").cast("double") / col("n_s"), 6)
          .as("kl_vs_global"))
      .orderBy("source")
  }

  /** q249's pair generator over a (doc_id, text) frame: every
    * (center, context) token pair with 0 < |Δpos| ≤ window. The
    * center side replicates to its 2·window offsets (a constant-size
    * explode) and pairs resolve by (doc_id, pos) equi-join — never a
    * per-doc position cross join. Split out so TextSpec pins the
    * closed forms: "a b c" at window 2 yields exactly the 6 ordered
    * pairs, and a doc shorter than 2 tokens yields none. */
  private[graft] def skipgramPairs(docs: DataFrame, window: Int,
      topK: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = tokens(col("text"))
    val pos = docs.filter(size(toks) >= 2)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
      .localCheckpoint(true) // feeds both join sides once
    val offsets = (-window to window).filter(_ != 0)
    val probes = pos.select(col("doc_id"), col("t").as("center"),
      explode(array(offsets.map(o => col("pos") + lit(o)): _*))
        .as("ppos"))
    val g = probes.join(pos.select(col("doc_id"),
        col("pos").as("ppos"), col("t").as("context")),
        Seq("doc_id", "ppos"))
      .groupBy("center", "context").agg(count(lit(1)).as("n_occ"))
      .localCheckpoint(true) // feeds the census AND the top-k
    val tot = g.agg(sum("n_occ"), count(lit(1))).head()
    val (nPairs, nTypes) = (tot.getLong(0), tot.getLong(1))
    g.orderBy(col("n_occ").desc, col("center").asc, col("context").asc)
      .limit(topK)
      .select(col("center"), col("context"), col("n_occ"),
        lit(nPairs).as("n_pairs_total"), lit(nTypes).as("n_pair_types"))
  }

  /** q235's chunk table over a (doc_id, text) frame: one row per
    * content-defined chunk with its md5 fingerprint and token count.
    * Boundary rule: after any token whose char-code sum ≡ 7 (mod 8);
    * a token's chunk index is the count of boundary tokens BEFORE it
    * (exclusive prefix sum over the per-doc position window).
    * TextSpec pins the content-locality property: inserting a prefix
    * re-fingerprints only the chunk it lands in — every later chunk
    * fingerprint survives (the fixed-size chunker's q74 shift destroys
    * them all). */
  private[graft] def cdcChunks(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    def charSum(t: Column): Column = when(length(t) === 0, lit(0L))
      .otherwise(aggregate(sequence(lit(1), length(t)), lit(0L),
        (acc, i) => acc + ascii(t.substr(i, lit(1)))))
    val pos = docs.filter(size(toks) >= 1)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
      .withColumn("b",
        when(charSum(col("t")) % 8 === 7, 1L).otherwise(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    pos.withColumn("chunk", coalesce(sum("b").over(w), lit(0L)))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("ntok"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))).as("txt"))
      .select(col("doc_id"), col("chunk"), md5(col("txt")).as("fp"),
        col("ntok"))
  }

  /** q230's mixture-weight table over a (source, text) frame: per
    * source, n_s tokens, raw share n_s/N, temperature-smoothed weight
    * n_s^alpha / Σ n^alpha (alpha fixed 0.3, rounded-pow DECIMAL
    * sums) and effective epochs w_s·N/n_s. TextSpec pins the closed
    * forms (equal sources → uniform both ways; the smoothed weight of
    * a small source strictly exceeds its raw share). */
  private[graft] def mixtureWeights(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), size(tokens(col("text"))).as("nt"))
      .groupBy("source")
      .agg(sum(col("nt").cast("long")).as("n_tokens"))
      .withColumn("pw",
        round(pow(col("n_tokens").cast("double"), lit(0.3)), 8)
          .cast("decimal(28,8)"))
      .localCheckpoint(true) // |sources| rows; scanned twice below
    val tot = cnt.agg(sum("n_tokens"), sum("pw")).head()
    val n = tot.getLong(0)
    // the exact DECIMAL sum converts to double ONCE (correctly
    // rounded in both engines); ratios then divide in plain double —
    // DECIMAL/DECIMAL division scale rules differ across engines
    val sp = tot.getDecimal(1).doubleValue
    val w = col("pw").cast("double") / lit(sp)
    cnt.select(col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") / lit(n.toDouble), 6)
          .as("raw_share"),
        round(w, 6).as("weight"),
        round(w * lit(n.toDouble) / col("n_tokens").cast("double"), 6)
          .as("eff_epochs"))
      .orderBy(col("source").asc)
  }

  private[graft] val BpeRounds = 8

  /** Distinct-word frequency table — the single corpus scan every BPE
    * round reuses. */
  private def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** `rounds` BPE merge iterations over a (w, freq) vocabulary.
    * Returns (merges: (round, pair, merged, weighted count), final
    * vocabulary with its symbol string). Each round: count adjacent
    * symbol pairs weighted by word frequency (overlapping count — the
    * standard BPE statistic), pick the (count desc, pair asc) argmax,
    * then merge via non-overlapping left-to-right string replace on
    * the wrapped `<a><b>` form (the wrappers keep a replace from
    * matching across symbol boundaries, and both engines' replace()
    * scans left-to-right so "aaa" merges identically). Literal '<'/'>'
    * in corpus tokens are translated to single guillemets before
    * wrapping (both engines, 1:1 so symbol counts are unchanged) —
    * otherwise they would corrupt the `><` pair delimiter. The merge
    * replace is built from Column functions, never interpolated into
    * SQL text, so pairs containing quotes cannot break parsing. The
    * vocabulary is localCheckpointed per round — bounded lineage at
    * any round count, and the corpus scan behind it runs exactly
    * once. */
  private[graft] def bpeLearn(words: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = words
      .withColumn("sym", regexp_replace(
        translate(col("w"), "<>", "‹›"), "(.)", "<$1>"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val toks = vocab.withColumn("a",
        split(regexp_replace(col("sym"), "^<|>$", ""), "><"))
      val best = toks.filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> " +
            "concat('<', element_at(a, i), '><', element_at(a, i + 1), '>'))"))
          .as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(1).collect()
      if (best.nonEmpty) {
        val pair = best(0).getString(0)
        val n = best(0).getLong(1)
        val merged = pair.replace("><", "")
        merges += ((r, pair, merged, n))
        vocab = vocab.withColumn("sym",
          org.apache.spark.sql.functions.replace(
            col("sym"), lit(pair), lit(merged))).localCheckpoint(true)
      }
    }
    (merges.toSeq, vocab)
  }

  /** The (doc_id, g) 5-gram occurrence stream for decontamination —
    * same construction as DedupOps' 3-gram stream (posexplode + window
    * leads; codegen, one shuffle on doc_id), two tokens wider: dedup
    * wants recall (short grams), decontamination wants precision
    * (longer grams ~ GPT-3's 13-gram rule, scaled to this corpus). */
  private[graft] def gram5Stream(s: SparkSession, d: String): DataFrame =
    // r13: built NARROW from the token array (the heavyShingles
    // idiom) instead of posexplode + a doc_id window with four leads
    // — the window shuffled and sorted the whole token stream to
    // look 4 rows ahead (guide §2.4); spreadInput decouples the
    // kernel from the single-split scan (§2.5). Same (doc_id, g)
    // occurrence rows in the same per-doc order.
    graft.Util.spreadInput(
        Tables.load(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 5), i -> " +
          "concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]))"))
        .as("g"))

  /** ROBUST winnowing fingerprints (Schleimer/Wilkerson/Aiken §4):
    * rolling 4-token hashes, each sliding window of 4 selects its
    * RIGHTMOST minimal hash — the paper's tie-break, tracked by
    * POSITION. Returns distinct (doc_id, fp, pos) selections: the
    * position makes the density guarantee provable on the count (one
    * selected position covers at most 4 windows ⇒ ceil(G/4) <= #sel
    * <= G for G windows) even when a repetitive doc collapses the
    * distinct hash VALUES. All codegen/window ops; one shuffle on
    * doc_id. */
  def winnow(s: SparkSession, d: String): DataFrame =
    // r13: whole-doc array pipeline instead of posexplode + TWO
    // doc_id window passes (leads for the gram hash, a rowsBetween
    // min for the selection) — the windows shuffled and sorted the
    // full token stream twice-over (guide §2.4). Semantics are
    // row-identical: hs[p] = (xxhash64 of tokens p..p+3, -p), the
    // selection at p is array_min over the (tail-truncated) slice
    // p..p+3 — struct ordering (h, np) gives the same rightmost
    // minimal hash the old min(struct(h, -pos)) window picked —
    // and distinct collapses repeats. spreadInput: single-split
    // scan, per-row CPU kernel (§2.5).
    graft.Util.spreadInput(
        Tables.load(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 4)
      .select(col("doc_id"), expr(
        "transform(sequence(0, size(ts) - 4), i -> named_struct(" +
          "'h', xxhash64(ts[i], ts[i+1], ts[i+2], ts[i+3]), " +
          "'np', -i))").as("hs"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(hs) - 1), p -> " +
          "array_min(slice(hs, p + 1, 4)))")).as("sel"))
      .select(col("doc_id"), col("sel.h").as("fp"),
        (-col("sel.np")).as("pos"))
      .distinct()

  /** q188's χ² table over any (doc_id, lang, text) frame — one row
    * per token: (token, n_docs, chi2). Split out so TextOpsSpec pins
    * the closed-form corners on crafted docs: a perfectly separating
    * token scores χ² = D (the table's N), a token present in every
    * doc scores 0, and the statistic is invariant to class renaming. */
  private[graft] def tokenClassChi2(docs: DataFrame): DataFrame = {
    val dTot = docs.count()
    val pres = docs.select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("t")).distinct()
    val ntl = pres.groupBy("t", "lang").agg(count(lit(1)).as("ntl"))
    val langTot = docs.groupBy("lang").agg(count(lit(1)).as("dl"))
    val tokTot = ntl.groupBy("t").agg(sum("ntl").as("nt"))
    val D = lit(dTot)
    val num = col("ntl") * D - col("nt") * col("dl")
    val sq = (num * num).cast("double")
    val present = round(sq
      / (col("nt") * col("dl") * D).cast("double"), 6)
    val absent = when(col("nt") === dTot, lit(0.0))
      .otherwise(round(sq
        / ((D - col("nt")) * col("dl") * D).cast("double"), 6))
    tokTot.crossJoin(broadcast(langTot))
      .join(ntl, Seq("t", "lang"), "left")
      .na.fill(0L, Seq("ntl"))
      .withColumn("cell", present.cast("decimal(28,6)")
        + absent.cast("decimal(28,6)"))
      .groupBy("t").agg(max("nt").as("n_docs"),
        sum(col("cell")).cast("double").as("chi2"))
      .select(col("t").as("token"), col("n_docs"), col("chi2"))
  }

  val oracles: Map[String, String] = Map(
    "q143_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents
        |), p AS (
        |  SELECT unnest([w[i:i+1] for i in range(1, len(w))]) AS pair
        |  FROM w WHERE len(w) >= 2
        |)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,
    "q146_pii_redact" ->
      """WITH p AS (
        |  SELECT source,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents),
        |r AS (
        |  SELECT source, t,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g') AS red,
        |    len(regexp_extract_all(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
        |    len(regexp_extract_all(t, '555-[0-9]{4}')) AS np
        |  FROM p)
        |SELECT source, count(*) AS docs,
        |  CAST(sum(ne) AS BIGINT) AS emails,
        |  CAST(sum(np) AS BIGINT) AS phones,
        |  CAST(sum(len(t) - len(red)) AS BIGINT) AS chars_removed
        |FROM r GROUP BY source""".stripMargin,
    "q147_validate_constraints" ->
      """WITH agg AS (
        |  SELECT count(*) AS n, count(DISTINCT doc_id) AS n_ids,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_ids,
        |    CAST(sum(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS len_mismatch,
        |    CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
        |    CAST(sum(CASE WHEN len(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS empty_text
        |  FROM documents),
        |orph AS (
        |  SELECT count(*) AS o FROM embeddings e
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)),
        |u AS (
        |  SELECT 'doc_id_unique' AS rule, n - n_ids AS violations FROM agg
        |  UNION ALL SELECT 'doc_id_not_null', null_ids FROM agg
        |  UNION ALL SELECT 'n_chars_consistent', len_mismatch FROM agg
        |  UNION ALL SELECT 'lang_in_domain', bad_lang FROM agg
        |  UNION ALL SELECT 'text_nonempty', empty_text FROM agg
        |  UNION ALL SELECT 'embeddings_ref_docs', o FROM orph)
        |SELECT rule, violations, violations = 0 AS pass FROM u""".stripMargin,
    "q40_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS re_tokens
        |FROM documents""".stripMargin,
    "q41_quality_score" -> qualityOracle,
    "q42_lang_id" -> langOracle,
    // winnowing gate: the doc coverage count is cross-engine exact;
    // the per-doc count bounds are asserted in-engine (bounds_ok)
    "q53_winnow_fingerprint" ->
      """SELECT count(*) FILTER (
        |    WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 4)
        |    AS docs_with_fp,
        |  count(*) AS n_docs, true AS bounds_ok
        |FROM documents""".stripMargin,
    "q43_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        |  ('0x' || md5(lower(trim(text)))[1:15])::BIGINT AS fp64
        |FROM documents""".stripMargin,
    "q81_weighted_sample" ->
      s"""WITH q AS ($qualityOracle), l AS ($langOracle),
        |u AS (
        |  SELECT doc_id,
        |    ('0x' || md5(lower(trim(text)))[1:8])::BIGINT / 4294967296.0 AS u
        |  FROM documents
        |)
        |SELECT lang_pred, count(*) AS total,
        |  sum(CASE WHEN u < quality THEN 1 ELSE 0 END)::BIGINT AS sampled,
        |  round(sum(CAST(quality AS DECIMAL(18,6)))::DOUBLE / count(*), 6)
        |    AS expected_rate
        |FROM u JOIN q USING (doc_id) JOIN l USING (doc_id)
        |GROUP BY lang_pred""".stripMargin,
    "q121_token_mixture" ->
      """WITH t AS (
        |  SELECT source, count(*) AS docs,
        |    sum(len(string_split_regex(lower(trim(text)), '\s+')))::BIGINT
        |      AS tokens
        |  FROM documents GROUP BY source
        |), n AS (SELECT count(*) AS n_sources FROM t)
        |SELECT source, docs, tokens,
        |  least(tokens, 20000 // n_sources)::BIGINT AS alloc_tokens,
        |  round(least(tokens, 20000 // n_sources)::DOUBLE / tokens, 6)
        |    AS rate
        |FROM t, n""".stripMargin,
    "q77_pack_offsets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(trim(text)), '\s+'))::BIGINT AS n
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n,
        |    -- ::BIGINT: DuckDB sum() yields HUGEINT, which the driver
        |    -- hashes as float ("32.0" vs Spark's "32") — cast to match.
        |    COALESCE(sum(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      AS start_off
        |  FROM t
        |)
        |SELECT doc_id, start_off, start_off // 512 AS first_seq,
        |  (start_off + n - 1) // 512 AS last_seq
        |FROM o""".stripMargin,
    // md5-order row_number is the same deterministic "shuffle"; the
    // ::BIGINT casts keep DuckDB's HUGEINT sum/xor off the driver's
    // string-hash compare
    "q136_shard_manifest" ->
      """WITH o AS (
        |  SELECT doc_id, n_chars,
        |    (row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
        |      doc_id) - 1) // 64 AS shard_id
        |  FROM documents
        |)
        |SELECT shard_id, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS chars_total,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  bit_xor(doc_id)::BIGINT AS doc_xor
        |FROM o GROUP BY shard_id""".stripMargin,
    "q76_source_report" ->
      s"""WITH q AS ($qualityOracle), l AS ($langOracle),
        |a AS (
        |  -- sum()::BIGINT: DuckDB sums to HUGEINT, which the driver
        |  -- hashes as float ("6277.0" vs Spark's "6277")
        |  SELECT source, count(*) AS docs, sum(n_chars)::BIGINT AS chars,
        |    round(sum(CAST(quality AS DECIMAL(18,6)))::DOUBLE / count(*), 6)
        |      AS avg_quality,
        |    sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)::BIGINT
        |      AS langid_hits
        |  FROM documents JOIN q USING (doc_id) JOIN l USING (doc_id)
        |  GROUP BY source
        |), r AS (
        |  SELECT source, CAST(quality AS DECIMAL(18,6)) AS qd,
        |    row_number() OVER (PARTITION BY source ORDER BY quality) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents JOIN q USING (doc_id)
        |), m AS (
        |  -- rank-based exact median (mirrors the Spark side): average
        |  -- of the 1-2 middle values, decimal sum / power-of-two
        |  SELECT source, round(sum(qd)::DOUBLE / count(*), 6) AS p50_quality
        |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        |  GROUP BY source
        |)
        |SELECT source, docs, chars, avg_quality, p50_quality, langid_hits
        |FROM a JOIN m USING (source)""".stripMargin,
    "q73_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      || ' ' || toks[i+3] || ' ' || toks[i+4]
        |    for i in range(1, len(toks)-3)]) AS g
        |  FROM t WHERE len(toks) >= 5
        |), bench AS (
        |  SELECT DISTINCT g FROM gr WHERE doc_id % 97 = 0
        |)
        |SELECT doc_id, count(DISTINCT gr.g) AS n_overlap
        |FROM gr JOIN bench USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id""".stripMargin,
    "q74_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id, i AS chunk_idx,
        |  least(64, len(toks) - i*48) AS chunk_len,
        |  md5(array_to_string(toks[i*48+1 : least(i*48+64, len(toks))], ' ')) AS chunk_fp
        |FROM t, unnest(generate_series(0, (len(toks)-1)//48)) AS u(i)""".stripMargin,
    "q91_tfidf_topterms" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, t, count(*) AS tf FROM tk GROUP BY doc_id, t
        |), df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (
        |  SELECT doc_id, t, tf, df,
        |    round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS score
        |  FROM tf JOIN df USING (t), n
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, t ASC) AS rk
        |  FROM sc
        |)
        |SELECT doc_id, rk, t AS term, tf, df, score
        |FROM r WHERE rk <= 5""".stripMargin,
    "q193_lang_confusion" ->
      s"""WITH l AS ($langOracle)
        |SELECT d.lang AS true_lang, l.lang_pred AS pred_lang,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents d JOIN l USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    // identical integer algebra: kappa stays a ratio of exact BIGINT
    // sums until the one final division
    "q194_cohens_kappa" ->
      s"""WITH l AS ($langOracle), m AS (
        |  SELECT d.lang AS t, l.lang_pred AS p,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN l USING (doc_id) GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT)
        |      AS diag
        |  FROM m
        |), marg AS (
        |  SELECT COALESCE(r.l, c.l) AS l,
        |    COALESCE(r.rt, 0) * COALESCE(c.ct, 0) AS prod
        |  FROM (SELECT t AS l, CAST(sum(n) AS BIGINT) AS rt
        |        FROM m GROUP BY t) r
        |  FULL OUTER JOIN (SELECT p AS l, CAST(sum(n) AS BIGINT) AS ct
        |        FROM m GROUP BY p) c ON r.l = c.l
        |), pe AS (SELECT CAST(sum(prod) AS BIGINT) AS pe_num FROM marg)
        |SELECT total AS n, diag, pe_num,
        |  CAST(total * diag - pe_num AS BIGINT) AS kappa_num,
        |  CAST(total * total - pe_num AS BIGINT) AS kappa_den,
        |  round((total * diag - pe_num)::DOUBLE
        |    / (total * total - pe_num), 6) AS kappa
        |FROM tot, pe""".stripMargin,
    // same per-cell round-to-6-then-exact-DECIMAL-sum as the Spark
    // side; the absent-row guard mirrors nt = D
    "q188_token_class_chi2" ->
      """WITH pres AS (
        |  SELECT DISTINCT doc_id, lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), ntl AS (
        |  SELECT t, lang, CAST(count(*) AS BIGINT) AS ntl
        |  FROM pres GROUP BY t, lang
        |), lt AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS dl
        |  FROM documents GROUP BY lang
        |), tt AS (SELECT t, CAST(sum(ntl) AS BIGINT) AS nt
        |  FROM ntl GROUP BY t),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
        |grid AS (
        |  SELECT tt.t, tt.nt, lt.lang, lt.dl, d.d,
        |    COALESCE(ntl.ntl, 0) AS ntl
        |  FROM tt CROSS JOIN lt
        |  LEFT JOIN ntl ON ntl.t = tt.t AND ntl.lang = lt.lang, d
        |), cells AS (
        |  SELECT t, nt,
        |    CAST(round((ntl * d - nt * dl)^2 / (nt * dl * d)::DOUBLE, 6)
        |      AS DECIMAL(28,6))
        |    + CAST(CASE WHEN nt = d THEN 0.0 ELSE
        |        round((ntl * d - nt * dl)^2
        |          / ((d - nt) * dl * d)::DOUBLE, 6) END
        |      AS DECIMAL(28,6)) AS cell
        |  FROM grid
        |)
        |SELECT t AS token, nt AS n_docs, sum(cell)::DOUBLE AS chi2
        |FROM cells GROUP BY t, nt
        |ORDER BY chi2 DESC, token ASC LIMIT 50""".stripMargin,
    "q103_group_sample" ->
      """WITH u AS (
        |  SELECT doc_id, lang, md5(lower(trim(text))) AS u FROM documents
        |), r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY u ASC, doc_id ASC)
        |      AS rk
        |  FROM u
        |)
        |SELECT lang, rk, doc_id FROM r WHERE rk <= 3""".stripMargin,
    "q93_corpus_drift" ->
      """WITH tk AS (
        |  SELECT doc_id % 10 = 0 AS is_new,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), c AS (
        |  SELECT t,
        |    sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END)::BIGINT AS pc,
        |    sum(CASE WHEN is_new THEN 1 ELSE 0 END)::BIGINT AS qc
        |  FROM tk GROUP BY t
        |), tot AS (SELECT sum(pc)::BIGINT AS pn, sum(qc)::BIGINT AS qn FROM c),
        |terms AS (
        |  SELECT pn, qn,
        |    pc::DOUBLE / pn AS p, qc::DOUBLE / qn AS q,
        |    (pc::DOUBLE / pn + qc::DOUBLE / qn) / 2.0 AS m
        |  FROM c, tot
        |)
        |SELECT max(pn) AS corpus_tokens, max(qn) AS batch_tokens,
        |  count(*) AS union_vocab,
        |  round(sum(CAST(round(
        |    CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END * 0.5
        |    + CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END * 0.5,
        |    10) AS DECIMAL(20,10)))::DOUBLE, 6) AS js_div
        |FROM terms""".stripMargin,
    "q86_unigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), f AS (
        |  SELECT t, count(*) AS cnt FROM t GROUP BY t
        |), tot AS (SELECT sum(cnt) AS total FROM f),
        |lp AS (
        |  SELECT t,
        |    CAST(round(ln(cnt::DOUBLE / total), 8) AS DECIMAL(20,8)) AS logp
        |  FROM f, tot
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(logp)::DOUBLE / count(*), 6) AS avg_logp
        |FROM t JOIN lp USING (t) GROUP BY doc_id""".stripMargin,
    "q115_weighted_sample_k" ->
      s"""WITH q AS ($qualityOracle), u AS (
        |  SELECT doc_id,
        |    ('0x' || md5(lower(trim(text)))[1:8])::BIGINT / 4294967296.0 AS u
        |  FROM documents
        |)
        |SELECT doc_id, round(ln(u) / quality, 6) AS key
        |FROM u JOIN q USING (doc_id)
        |WHERE u > 0
        |ORDER BY key DESC, doc_id ASC LIMIT 32""".stripMargin,
    "q104_length_bins" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    ntile(10) OVER (PARTITION BY lang
        |      ORDER BY n_chars ASC, doc_id ASC) AS bin
        |  FROM documents
        |)
        |SELECT lang, bin, count(*) AS docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM b GROUP BY lang, bin""".stripMargin,
    "q105_split_assign" ->
      """WITH u AS (
        |  SELECT doc_id, lang,
        |    ('0x' || md5(lower(trim(text)))[1:8])::BIGINT / 4294967296.0 AS u
        |  FROM documents
        |)
        |SELECT lang,
        |  CASE WHEN u < 0.8 THEN 'train'
        |       WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS docs, sum(doc_id)::BIGINT AS id_checksum
        |FROM u GROUP BY 1, 2""".stripMargin,
    "q106_oov_rate" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), v AS (
        |  SELECT t, 1 AS iv FROM (
        |    SELECT t, count(*) AS cnt FROM tk GROUP BY t
        |    ORDER BY cnt DESC, t ASC LIMIT 20)
        |)
        |SELECT source, count(*) AS tokens,
        |  sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END)::BIGINT AS oov,
        |  round(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS oov_rate
        |FROM tk LEFT JOIN v USING (t) GROUP BY source""".stripMargin,
    // md5 agrees between engines, so the deterministic sample is
    // value-checkable end to end
    "q68_hash_sample" ->
      s"""WITH lang AS ($langOracle),
        |k AS (SELECT doc_id,
        |  CASE WHEN ('0x' || md5(lower(trim(text)))[1:1])::INT < 2
        |    THEN 1 ELSE 0 END AS keep
        |  FROM documents)
        |SELECT lang_pred, count(*) AS total, sum(keep)::BIGINT AS sampled
        |FROM k JOIN lang USING (doc_id) GROUP BY lang_pred""".stripMargin,
    "q126_bigram_lm" ->
      """WITH l AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
        |  FROM documents WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        |), b AS (
        |  SELECT doc_id,
        |    unnest(list_slice(l, 1, len(l) - 1)) AS t1,
        |    unnest(list_slice(l, 2, len(l))) AS t2
        |  FROM l
        |), c2 AS (
        |  SELECT t1, t2, count(*) AS c2 FROM b GROUP BY t1, t2
        |), c1 AS (
        |  SELECT t1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY t1
        |), v AS (
        |  -- |V| over the WHOLE corpus (no >=2-token filter), matching
        |  -- the Spark side's vocab scan
        |  SELECT count(DISTINCT t) AS nv FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |    FROM documents)
        |), lp AS (
        |  SELECT t1, t2,
        |    CAST(round(ln((c2 + 0.5) / (c1 + 0.5 * (SELECT nv FROM v))), 8)
        |      AS DECIMAL(20,8)) AS logp
        |  FROM c2 JOIN c1 USING (t1)
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(sum(logp)::DOUBLE / count(*), 6) AS avg_logp
        |FROM b JOIN lp USING (t1, t2) GROUP BY doc_id""".stripMargin,
    // same zip-pair bigrams, integer-ratio ranking, display-only ln
    "q202_pmi_collocations" ->
      """WITH l AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS l
        |  FROM documents
        |  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        |), bg AS (
        |  SELECT unnest(list_slice(l, 1, len(l) - 1)) AS a,
        |    unnest(list_slice(l, 2, len(l))) AS b
        |  FROM l
        |), c2 AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM bg GROUP BY 1, 2
        |), n AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM c2),
        |la AS (
        |  SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM c2 GROUP BY 1
        |), rb AS (
        |  SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM c2 GROUP BY 1
        |)
        |SELECT a, b, c_ab, c_a, c_b,
        |  (c_ab * n.n * 1000000) // (c_a * c_b) AS r,
        |  round(ln(c_ab::DOUBLE * n.n / (c_a * c_b)), 6) AS pmi
        |FROM c2 JOIN la USING (a) JOIN rb USING (b), n
        |WHERE c_ab >= 5
        |ORDER BY r DESC, a, b LIMIT 20""".stripMargin,
    "q130_token_entropy" ->
      """WITH t AS (
        |  SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), c AS (
        |  SELECT source, t, count(*) AS n FROM t GROUP BY 1, 2
        |), s AS (
        |  SELECT source, CAST(sum(n) AS BIGINT) AS nn,
        |    count(*) AS vocab
        |  FROM c GROUP BY 1
        |)
        |SELECT source, nn AS n_tokens, vocab,
        |  round(-sum(CAST(n AS DECIMAL(12,0))
        |      * CAST(round(ln(n::DOUBLE / nn), 8) AS DECIMAL(20,8)))::DOUBLE
        |    / nn, 6) AS entropy
        |FROM c JOIN s USING (source)
        |GROUP BY source, nn, vocab""".stripMargin,
    "q149_repetition_quality" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, source, unnest(toks) AS tok FROM t
        |), pw AS (
        |  SELECT doc_id, source, tok, count(*) AS c
        |  FROM w GROUP BY 1, 2, 3
        |), d AS (
        |  SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS total,
        |    count(*) AS dist, max(c) AS top
        |  FROM pw GROUP BY 1, 2
        |), bgr AS (
        |  SELECT doc_id,
        |    list_extract(toks, i) || ' ' || list_extract(toks, i + 1) AS g,
        |    count(*) AS c
        |  FROM t, unnest(range(1, len(toks))) AS r(i)
        |  GROUP BY 1, 2
        |), bg AS (
        |  SELECT doc_id, max(c) AS top2 FROM bgr GROUP BY 1
        |), f AS (
        |  SELECT d.source, d.total, d.dist, d.top,
        |    coalesce(bg.top2, 0) AS top2,
        |    CAST(round((d.total - d.dist)::DOUBLE / d.total, 8)
        |      AS DECIMAL(18,8)) AS dup_frac,
        |    CAST(round(d.top::DOUBLE / d.total, 8)
        |      AS DECIMAL(18,8)) AS top_frac,
        |    CAST(round(coalesce(bg.top2, 0)::DOUBLE
        |      / greatest(d.total - 1, 1), 8) AS DECIMAL(18,8)) AS bg_frac
        |  FROM d LEFT JOIN bg USING (doc_id)
        |)
        |SELECT source, count(*) AS docs,
        |  CAST(sum(CASE WHEN (total - dist) * 10 > total * 6
        |    OR top * 1000 > total * 125 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS flagged,
        |  round(sum(dup_frac)::DOUBLE / count(*), 6) AS avg_dup_frac,
        |  round(sum(top_frac)::DOUBLE / count(*), 6) AS avg_top_frac,
        |  round(sum(bg_frac)::DOUBLE / count(*), 6) AS avg_bigram_frac
        |FROM f GROUP BY source""".stripMargin,
    "q151_dsir_weights" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t,
        |    doc_id % 7 = 0 AS is_tgt
        |  FROM documents
        |), lm AS (
        |  SELECT t, count(*) AS cc,
        |    CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM t GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(cc) AS BIGINT) AS totc,
        |    CAST(sum(ct) AS BIGINT) AS tott, count(*) AS v
        |  FROM lm
        |), w AS (
        |  SELECT t, CAST(round(ln((ct + 1)::DOUBLE / (tott + v))
        |    - ln((cc + 1)::DOUBLE / (totc + v)), 8)
        |    AS DECIMAL(20,8)) AS lr
        |  FROM lm, tot
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(lr)::DOUBLE / count(*), 6) AS dsir_score
        |FROM t JOIN w USING (t)
        |GROUP BY doc_id
        |ORDER BY dsir_score DESC, doc_id LIMIT 20""".stripMargin,
    // q308: the 5-round multiplicative-weights fixed point unrolled —
    // every division non-negative by construction (terms are shifted
    // by min(loss) before dividing), so DuckDB's // and the JVM's /
    // agree exactly; r_t CTEs are MATERIALIZED (each is referenced
    // twice: the weighted-reference subquery and the FROM)
    "q308_doremi_weights" -> {
      def round(prev: String, cur: String): String =
        s"""$cur AS MATERIALIZED (
           |  SELECT source, n_docs, loss_fp,
           |    ((w * (1000000
           |      + (((loss_fp - mn) * 1000000) // spr) // 4
           |      - ((((SELECT sum(w * loss_fp) // sum(w) FROM $prev)
           |          - mn) * 1000000) // spr) // 4
           |    )) // 1000000)::BIGINT AS w
           |  FROM $prev, base
           |)""".stripMargin
      s"""WITH dom AS MATERIALIZED (
         |  SELECT source, count(*) AS n_docs,
         |    ((1000000 * sum(n_chars)) // count(*))::BIGINT AS loss_fp
         |  FROM documents GROUP BY 1
         |), base AS MATERIALIZED (
         |  SELECT min(loss_fp) AS mn,
         |    GREATEST(max(loss_fp) - min(loss_fp), 1) AS spr
         |  FROM dom
         |), r0 AS MATERIALIZED (
         |  SELECT source, n_docs, loss_fp, 1000000::BIGINT AS w FROM dom
         |), ${round("r0", "r1")},
         |${round("r1", "r2")},
         |${round("r2", "r3")},
         |${round("r3", "r4")},
         |${round("r4", "r5")}
         |SELECT source, n_docs, loss_fp,
         |  ((w * 1000000) // (SELECT sum(w) FROM r5))::BIGINT
         |    AS weight_ppm
         |FROM r5 ORDER BY source""".stripMargin
    },
    "q177_zipf_slope" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |    AS w
        |  FROM documents
        |), c AS (
        |  SELECT w, count(*) AS c FROM t GROUP BY 1
        |), top AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank
        |  FROM c ORDER BY c DESC, w LIMIT 1000
        |), p AS (
        |  SELECT CAST(round(ln(rank::DOUBLE), 8) AS DECIMAL(20,8)) AS x,
        |    CAST(round(ln(c::DOUBLE), 8) AS DECIMAL(20,8)) AS y
        |  FROM top
        |), sums AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM p
        |)
        |SELECT n AS n_points,
        |  round((n * sxy - sx * sy)::DOUBLE
        |    / (n * sxx - sx * sx)::DOUBLE, 6) AS slope,
        |  round((sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE
        |      / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE) / n, 6)
        |    AS intercept
        |FROM sums""".stripMargin,
    "q155_bpe_learn" -> (bpeCtes(BpeRounds)
      + (1 to BpeRounds).map(r =>
        s"SELECT $r AS round, pair, merged, n FROM b$r")
        .mkString("\n", "\nUNION ALL ", "\nORDER BY round")),
    "q156_bpe_apply" -> (bpeCtes(BpeRounds) + s"""
, enc AS (
  SELECT w, len(string_split(
    regexp_replace(sym, '^<|>$$', '', 'g'), '><')) AS n_sym
  FROM r$BpeRounds
), cw AS (
  SELECT source,
    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents
)
SELECT source, count(*) AS words,
  CAST(sum(length(w)) AS BIGINT) AS chars,
  CAST(sum(n_sym) AS BIGINT) AS bpe_tokens,
  round(sum(n_sym)::DOUBLE / count(*), 6) AS avg_tokens_per_word,
  round(sum(length(w))::DOUBLE / sum(n_sym), 6) AS compression
FROM cw JOIN enc USING (w) GROUP BY source"""),

    // q225: same shingle inventory (1-based list slicing mirrors the
    // Spark slice(toks, i, 5)), same min-owner novelty tagging, same
    // arrival-order decile arithmetic in pure BIGINT
    "q225_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents
        |), pairs AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |      || ' ' || t[i+4] AS sh
        |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
        |  WHERE len(t) >= 5
        |), first AS (
        |  SELECT sh, min(doc_id) AS fd FROM pairs GROUP BY sh
        |), b AS (
        |  SELECT min(doc_id) AS lo,
        |    max(doc_id) - min(doc_id) + 1 AS span
        |  FROM documents
        |)
        |SELECT ((doc_id - lo) * 10) // span AS bucket,
        |  count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS novelty
        |FROM pairs JOIN first USING (sh), b
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q227: identical integer-rational KN algebra — num/den BIGINTs
    // must match bit-exact; floats are display-only
    "q227_kn_bigram" ->
      """WITH l AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS l
        |  FROM documents
        |  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        |), bg AS (
        |  SELECT unnest(list_slice(l, 1, len(l) - 1)) AS t1,
        |    unnest(list_slice(l, 2, len(l))) AS t2
        |  FROM l
        |), c2 AS (
        |  SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c2),
        |ctx AS (
        |  SELECT t1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS nl
        |  FROM c2 GROUP BY 1
        |), cont AS (
        |  SELECT t2, CAST(count(*) AS BIGINT) AS cr FROM c2 GROUP BY 1
        |), top AS (
        |  SELECT t1, t2, c12 FROM c2
        |  ORDER BY c12 DESC, t1 ASC, t2 ASC LIMIT 20
        |)
        |SELECT top.t1, top.t2, c12, c1, nl, cr, n_types,
        |  greatest(4 * c12 - 3, 0) * n_types + 3 * nl * cr AS kn_num,
        |  4 * c1 * n_types AS kn_den,
        |  round(c12::DOUBLE / c1, 6) AS p_mle,
        |  round((greatest(4 * c12 - 3, 0) * n_types + 3 * nl * cr)
        |    ::DOUBLE / (4 * c1 * n_types), 6) AS p_kn
        |FROM top JOIN ctx USING (t1) JOIN cont USING (t2), t""".stripMargin,

    // q250: identical integer ratio, identical 8dp ln, identical
    // c_st-weighted DECIMAL fold, one division per source
    "q250_source_kl" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |), st AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c_st
        |  FROM tk GROUP BY 1, 2
        |), ns AS (
        |  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
        |    count(*)::BIGINT AS n_types
        |  FROM st GROUP BY 1
        |), gt AS (
        |  SELECT t, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1
        |), tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM gt),
        |w AS (
        |  SELECT source, n_s, n_types,
        |    CAST(c_st AS DECIMAL(17,0))
        |      * CAST(round(ln((c_st * n)::DOUBLE / (n_s * c_t)), 8)
        |        AS DECIMAL(20,8)) AS w
        |  FROM st JOIN gt USING (t) JOIN ns USING (source), tot
        |)
        |SELECT source, n_s AS n_tokens, n_types,
        |  round(CAST(sum(w) AS DOUBLE) / n_s, 6) AS kl_vs_global
        |FROM w GROUP BY 1, 2, 3
        |ORDER BY source""".stripMargin,

    // q258: the oracle derives the same 30-phrase dict (count desc,
    // phrase asc) and brute-forces every (position, pattern) pair —
    // the one-pass automaton must lose nothing vs the rescan
    "q258_dict_phrase_scan" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |), a2 AS (
        |  SELECT t[i] || ' ' || t[i+1] AS g, count(*) AS c
        |  FROM tk, unnest(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2 GROUP BY 1
        |), d2 AS (SELECT g FROM a2 ORDER BY c DESC, g ASC LIMIT 20),
        |a3 AS (
        |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g,
        |    count(*) AS c
        |  FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 3 GROUP BY 1
        |), d3 AS (SELECT g FROM a3 ORDER BY c DESC, g ASC LIMIT 10),
        |g2 AS (
        |  SELECT doc_id, i AS pos, t[i] || ' ' || t[i+1] AS g
        |  FROM tk, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2
        |), g3 AS (
        |  SELECT doc_id, i AS pos,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |  FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 3
        |), hits AS (
        |  SELECT doc_id, pos, g, 2 AS plen FROM g2 JOIN d2 USING (g)
        |  UNION ALL
        |  SELECT doc_id, pos, g, 3 AS plen FROM g3 JOIN d3 USING (g)
        |)
        |SELECT tk.doc_id,
        |  CAST(count(hits.g) AS BIGINT) AS n_matches,
        |  CAST(count(DISTINCT hits.g) AS BIGINT) AS n_patterns,
        |  coalesce(max(plen), 0)::INT AS longest,
        |  coalesce(min(pos), 0)::INT AS first_pos
        |FROM tk LEFT JOIN hits USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q253: the oracle rebuilds both gram inventories from the token
    // list per doc; every fraction is integer/integer rounded once
    // q279: nc = tokens div 5 cues; per-cue duration 2000 + id%500;
    // starts at 2500·i — speech/span/chars are all token arithmetic
    // q293: the oracle rebuilds the IDENTICAL inventory (chars +
    // thresholded bi/trigrams, token-stream-weighted counts, same
    // 1e8 fixed-point ln rounding) and replaces the DP with brute
    // path enumeration in a recursive CTE — min cost, then fewest
    // pieces, must coincide with Viterbi's optimum
    "q293_unigram_segment" ->
      """WITH RECURSIVE tk AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |    AS w
        |  FROM documents
        |), wf AS MATERIALIZED (
        |  SELECT w, count(*)::BIGINT AS freq FROM tk GROUP BY w
        |), tot AS (SELECT sum(freq)::BIGINT AS wtot FROM wf),
        |g1 AS (
        |  SELECT p, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest([substr(w, i, 1)
        |      for i in range(1, length(w) + 1)]) AS p FROM wf
        |  ) GROUP BY p
        |), g2 AS (
        |  SELECT p, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest([substr(w, i, 2)
        |      for i in range(1, length(w))]) AS p FROM wf
        |    WHERE length(w) >= 2
        |  ) GROUP BY p
        |), g3 AS (
        |  SELECT p, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest([substr(w, i, 3)
        |      for i in range(1, length(w) - 1)]) AS p FROM wf
        |    WHERE length(w) >= 3
        |  ) GROUP BY p
        |), vocab AS MATERIALIZED (
        |  SELECT p, cnt FROM g1
        |  UNION ALL
        |  SELECT p, cnt FROM g2
        |  WHERE cnt >= (SELECT greatest(2, wtot // 50) FROM tot)
        |  UNION ALL
        |  SELECT p, cnt FROM g3
        |  WHERE cnt >= (SELECT greatest(2, wtot // 50) FROM tot)
        |), vt AS (SELECT sum(cnt)::BIGINT AS total FROM vocab),
        |vc AS MATERIALIZED (
        |  SELECT p, length(p)::INT AS pl,
        |    CAST(round(ln((SELECT total FROM vt)::DOUBLE / cnt)
        |      * 100000000) AS BIGINT) AS c
        |  FROM vocab
        |), words AS MATERIALIZED (SELECT DISTINCT w FROM wf),
        |dp AS (
        |  SELECT w, 0::INT AS pos, 0::BIGINT AS cost, 0::INT AS pieces
        |  FROM words
        |  UNION
        |  SELECT d.w, d.pos + v.pl, d.cost + v.c, d.pieces + 1
        |  FROM dp d JOIN vc v ON v.p = substr(d.w, d.pos + 1, v.pl)
        |  WHERE d.pos + v.pl <= length(d.w)
        |), best AS (
        |  SELECT w, min(cost) AS mc FROM dp
        |  WHERE pos = length(w) GROUP BY w
        |), res AS (
        |  SELECT d.w, b.mc AS cost_fp, min(d.pieces)::INT AS n_pieces
        |  FROM dp d JOIN best b ON d.w = b.w
        |  WHERE d.pos = length(d.w) AND d.cost = b.mc
        |  GROUP BY d.w, b.mc
        |)
        |SELECT wf.w AS word, wf.freq, length(wf.w)::INT AS n_chars,
        |  res.n_pieces, res.cost_fp
        |FROM wf JOIN res ON wf.w = res.w
        |ORDER BY freq DESC, word ASC LIMIT 50""".stripMargin,

    "q279_srt_subtitles" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, len(toks) // 5 AS nc, toks
        |  FROM tk WHERE len(toks) >= 5
        |)
        |SELECT doc_id, nc::INT AS n_cues,
        |  (nc * (2000 + doc_id % 500))::BIGINT AS total_speech_ms,
        |  (2500 * (nc - 1) + 2000 + doc_id % 500)::BIGINT AS span_ms,
        |  (CAST(list_sum([length(toks[j])
        |     for j in range(1, 5*nc + 1)]) AS BIGINT) + 4 * nc)
        |    AS text_chars
        |FROM f""".stripMargin,

    // q265: the plant inserts after 1-based source offset i — a
    // 2-byte é at i%40=0, 3-byte € at i%90=0, overlong lead C0 at
    // i%130=0, stray continuation 80 at i%170=0 — so every census
    // column is n-div-k arithmetic on the source byte length
    "q265_utf8_census" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text))::BIGINT AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  n + 2*(n//40) + 3*(n//90) + (n//130) + (n//170) AS n_bytes,
        |  n + (n//40) + (n//90) AS n_codepoints,
        |  n AS n_ascii,
        |  n//40 AS n_2byte, n//90 AS n_3byte, 0::BIGINT AS n_4byte,
        |  (n//130) + (n//170) AS n_invalid
        |FROM d""".stripMargin,
    // q264: the oracle replays the plant (same concat-then-trim
    // order as the Spark side, so tokenization is identical), builds
    // the full 5-gram stream, and filters by the exact integer
    // threshold cnt·200 > N — the sketch is an implementation detail
    // the verify pass erases
    "q264_boilerplate_hh" ->
      """WITH p AS (
        |  SELECT CASE WHEN lang = 'en'
        |    THEN lower(trim(
        |      'this template footer is shared across english documents '
        |      || text))
        |    ELSE lower(trim(text)) END AS t
        |  FROM documents
        |), tk AS (
        |  SELECT string_split_regex(t, '\s+') AS toks FROM p
        |), g AS (
        |  SELECT unnest([toks[i] || ' ' || toks[i+1] || ' ' ||
        |      toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]
        |    for i in range(1, len(toks) - 3)]) AS g
        |  FROM tk WHERE len(toks) >= 5
        |), n AS (SELECT count(*)::BIGINT AS n FROM g),
        |c AS (SELECT g, count(*)::BIGINT AS cnt FROM g GROUP BY g)
        |SELECT c.g AS shingle, c.cnt, n.n AS n_shingles
        |FROM c, n WHERE c.cnt * 200 > n.n
        |ORDER BY shingle""".stripMargin,
    "q253_repetition_filter" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |), g2 AS (
        |  SELECT doc_id, max(c) AS top2_count FROM (
        |    SELECT doc_id, t[i] || ' ' || t[i+1] AS g,
        |      CAST(count(*) AS BIGINT) AS c
        |    FROM tk, unnest(range(1, len(t))) AS u(i)
        |    WHERE len(t) >= 2 GROUP BY 1, 2
        |  ) GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS dup3_occ,
        |    CAST(sum(c) AS BIGINT) AS tri_occ
        |  FROM (
        |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g,
        |      CAST(count(*) AS BIGINT) AS c
        |    FROM tk, unnest(range(1, len(t) - 1)) AS u(i)
        |    WHERE len(t) >= 3 GROUP BY 1, 2
        |  ) GROUP BY 1
        |)
        |SELECT tk.doc_id, len(t)::INT AS n_tokens,
        |  coalesce(top2_count, 0) AS top2_count,
        |  coalesce(round(2 * top2_count::DOUBLE / len(t), 6), 0.0)
        |    AS top2_cov,
        |  coalesce(dup3_occ, 0) AS dup3_occ,
        |  coalesce(round(dup3_occ::DOUBLE / tri_occ, 6), 0.0)
        |    AS dup3_frac,
        |  coalesce(round(2 * top2_count::DOUBLE / len(t), 6), 0.0) <= 0.2
        |    AND coalesce(round(dup3_occ::DOUBLE / tri_occ, 6), 0.0) <= 0.3
        |    AS keep
        |FROM tk LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)
        |""".stripMargin,

    // q249: the oracle affords the in-doc range join the Spark side
    // replaces with the constant offset replication
    "q249_skipgram_pairs" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS l
        |  FROM documents
        |  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        |), p AS (
        |  SELECT doc_id, i AS pos, l[i] AS t
        |  FROM tk, unnest(range(1, len(l) + 1)) AS u(i)
        |), g AS (
        |  SELECT a.t AS center, b.t AS context,
        |    CAST(count(*) AS BIGINT) AS n_occ
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
        |    AND b.pos <> a.pos
        |  GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(sum(n_occ) AS BIGINT) AS n_pairs_total,
        |    count(*)::BIGINT AS n_pair_types
        |  FROM g
        |), top AS (
        |  SELECT * FROM g ORDER BY n_occ DESC, center, context LIMIT 20
        |)
        |SELECT center, context, n_occ, n_pairs_total, n_pair_types
        |FROM top, tot""".stripMargin,

    // q242: the same KN rational per bigram OCCURRENCE, the same
    // rounded-ln DECIMAL fold per doc, one double division at the end
    "q242_perplexity_filter" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS l
        |  FROM documents
        |  WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
        |), bg AS (
        |  SELECT doc_id, unnest(list_slice(l, 1, len(l) - 1)) AS t1,
        |    unnest(list_slice(l, 2, len(l))) AS t2
        |  FROM l
        |), c2 AS (
        |  SELECT t1, t2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c2),
        |ctx AS (
        |  SELECT t1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS nl
        |  FROM c2 GROUP BY 1
        |), cont AS (
        |  SELECT t2, CAST(count(*) AS BIGINT) AS cr FROM c2 GROUP BY 1
        |), sc AS (
        |  SELECT doc_id, CAST(round(-ln(
        |      (greatest(4 * c12 - 3, 0) * n_types + 3 * nl * cr)
        |        ::DOUBLE / (4 * c1 * n_types)), 8)
        |    AS DECIMAL(28,8)) AS nll
        |  FROM bg JOIN c2 USING (t1, t2) JOIN ctx USING (t1)
        |    JOIN cont USING (t2), t
        |)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS mean_nll
        |FROM sc GROUP BY 1""".stripMargin,

    // q235: identical boundary rule (char-code sum mod 8), identical
    // exclusive prefix-sum chunk assignment, identical md5 over the
    // space-joined chunk — census and top-10 match exactly
    "q235_cdc_chunks" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
        |    AS l
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, i AS pos, l[i] AS t,
        |    CASE WHEN list_sum([ascii(l[i][j:j])
        |        for j in range(1, len(l[i]) + 1)]) % 8 = 7
        |      THEN 1 ELSE 0 END AS b
        |  FROM tk, unnest(range(1, len(l) + 1)) AS u(i)
        |), wc AS (
        |  SELECT doc_id, pos, t,
        |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk
        |  FROM p
        |), ch AS (
        |  SELECT doc_id, chunk, count(*) AS ntok,
        |    md5(string_agg(t, ' ' ORDER BY pos)) AS fp
        |  FROM wc GROUP BY 1, 2
        |), tot AS (
        |  SELECT count(*)::BIGINT AS nc,
        |    count(DISTINCT fp)::BIGINT AS nd,
        |    CAST(sum(ntok) AS BIGINT) AS nt
        |  FROM ch
        |), top AS (
        |  SELECT fp, count(*)::BIGINT AS n_occ,
        |    count(DISTINCT doc_id)::BIGINT AS n_docs,
        |    CAST(min(ntok) AS BIGINT) AS tok_len
        |  FROM ch GROUP BY fp ORDER BY n_occ DESC, fp ASC LIMIT 10
        |)
        |SELECT row_number() OVER (ORDER BY n_occ DESC, fp ASC) AS rk,
        |  fp, n_occ, n_docs, tok_len,
        |  nc AS n_chunks_total, nd AS n_distinct_total,
        |  round(nd::DOUBLE / nc, 6) AS dedup_ratio,
        |  round(nt::DOUBLE / nc, 6) AS mean_chunk_tokens
        |FROM top, tot""".stripMargin,

    // q230: same rounded-pow DECIMAL fold; the exact sum converts to
    // double once, ratios divide in plain double
    "q230_mixture_weights" ->
      """WITH c AS (
        |  SELECT source, CAST(sum(
        |    len(string_split_regex(lower(trim(text)), '\s+')))
        |    AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), p AS (
        |  SELECT source, n_tokens,
        |    CAST(round(pow(n_tokens, 0.3), 8) AS DECIMAL(28,8)) AS pw
        |  FROM c
        |), tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS n,
        |    CAST(sum(pw) AS DECIMAL(28,8))::DOUBLE AS sp
        |  FROM p
        |)
        |SELECT source, n_tokens,
        |  round(n_tokens::DOUBLE / n, 6) AS raw_share,
        |  round(pw::DOUBLE / sp, 6) AS weight,
        |  round((pw::DOUBLE / sp) * n / n_tokens, 6) AS eff_epochs
        |FROM p, tot ORDER BY source""".stripMargin,

    // q226: bigram-type inventory via DISTINCT adjacent pairs; the
    // continuation count is a plain group count over types
    "q226_kn_continuation" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents
        |), bg AS (
        |  SELECT DISTINCT t[i] AS t1, t[i+1] AS t2
        |  FROM toks, unnest(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2
        |), tot AS (SELECT count(*) AS total_types FROM bg)
        |SELECT t2 AS w, count(*) AS cont, total_types,
        |  round(count(*)::DOUBLE / total_types, 8) AS p_cont
        |FROM bg, tot GROUP BY t2, total_types
        |ORDER BY cont DESC, w ASC LIMIT 20""".stripMargin
  )

  /** Unrolled BPE-learning CTE chain for the q155/q156 oracles — the
    * same symbolize → pair-count → argmax → replace recurrence as
    * [[bpeLearn]], one CTE triple per round, generated so the SQL and
    * the Scala stay round-for-round identical. */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH r0 AS (
  SELECT w, regexp_replace(translate(w, '<>', '‹›'),
    '(.)', '<\1>', 'g') AS sym,
    count(*) AS freq
  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents)
  GROUP BY 1, 2
)"""
    for (r <- 1 to rounds) {
      sb ++= s"""
, t$r AS (
  SELECT freq,
    string_split(regexp_replace(sym, '^<|>$$', '', 'g'), '><') AS a
  FROM r${r - 1}
), p$r AS (
  SELECT '<' || a[i] || '><' || a[i + 1] || '>' AS pair,
    CAST(sum(freq) AS BIGINT) AS n
  FROM t$r, unnest(range(1, len(a))) AS u(i)
  GROUP BY 1
), b$r AS (
  SELECT pair, replace(pair, '><', '') AS merged, n
  FROM p$r ORDER BY n DESC, pair LIMIT 1
), r$r AS (
  SELECT w, replace(sym, b$r.pair, b$r.merged) AS sym, freq
  FROM r${r - 1}, b$r
)"""
    }
    sb.toString
  }

  private lazy val qualityOracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, n_chars, text,
      |    string_split_regex(lower(trim(text)), '\\s+') AS toks
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, n_chars, text,
      |    len(toks)::DOUBLE AS word_cnt,
      |    len(list_filter(toks, t -> t IN ${sqlIn(En)}))::DOUBLE AS stop_hits,
      |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::DOUBLE AS punct_cnt
      |  FROM t
      |)
      |SELECT doc_id, word_cnt::BIGINT AS word_cnt,
      |  round(stop_hits / word_cnt, 6) AS stop_ratio,
      |  round(punct_cnt / n_chars::DOUBLE, 6) AS punct_ratio,
      |  round(length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE / word_cnt, 6) AS avg_wlen,
      |  round(least(1.0, word_cnt / 100.0) * 0.4
      |    + (stop_hits / word_cnt) * 0.3
      |    + (1.0 - punct_cnt / n_chars::DOUBLE) * 0.3, 6) AS quality
      |FROM m""".stripMargin

  private lazy val langOracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      |  FROM documents
      |), sc AS (
      |  SELECT doc_id,
      |    len(list_filter(toks, t -> t IN ${sqlIn(En)})) AS s_en,
      |    len(list_filter(toks, t -> t IN ${sqlIn(De)})) AS s_de,
      |    len(list_filter(toks, t -> t IN ${sqlIn(Fr)})) AS s_fr,
      |    len(list_filter(toks, t -> t IN ${sqlIn(Es)})) AS s_es
      |  FROM t
      |)
      |SELECT doc_id, s_en, s_de, s_fr, s_es,
      |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
      |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
      |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
      |       WHEN s_es > 0 THEN 'es'
      |       ELSE 'und' END AS lang_pred
      |FROM sc""".stripMargin
}
