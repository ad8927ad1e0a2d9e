package graft.core.route

import graft.core._
import graft.core.html.HtmlExtractor
import graft.core.pdf.PdfLayout

/** The extraction operator proper: per-document span routing.
  *
  * Re-expresses the reference's parser dispatch (`AutoDetectParser` +
  * `CompositeParser` surgery, `Extractor.java:937,1028-1078`) as a pure
  * kind-match over spans, with the zip-bomb-style guards
  * (`EmbedSpawner.java:389-402,881-906`) and FallbackParser semantics
  * (`parser/FallbackParser.java:17-54`: unparseable content becomes an EMPTY
  * span stamped with a NoContentReason — never a row failure).
  *
  * Pure functions of their inputs — no counters, no execution-order
  * dependence — preserving the reference's parallel==serial determinism
  * (SURVEY §4 hard part 1). The single exception is the cooperative
  * per-document deadline (disabled by default): timeouts are inherently
  * clock-bound, exactly as in the reference's watchdog.
  */
object Extract {

  final case class Config(
      maxSpanChars: Int = 16 << 20, // size guard (EmbedSpawner.java:64,393-402)
      maxSpans: Int = 100000,       // breadth guard
      maxEmbedDepth: Int = 20       // depth guard (EmbedSpawner.java:55)
  )
  val DefaultConfig: Config = Config()

  /** Marker an upstream splitter stamps on spans whose payload could not
    * be decrypted (the `pdf/encrypted.pdf` case — reference classifies via
    * EncryptedDocumentException, `Extractor.java:785-826`).
    */
  final val EncryptedMarker = "ENCRYPTED:"

  /** Failure-injection markers modeling the reference's exception surface
    * (`Extractor.java:785-826`): a parser crash (tag-soup corner, corrupt
    * container), a payload whose backing blob is gone, and an IO error
    * mid-read. Each throws the matching typed exception — deterministically,
    * so the status taxonomy is oracle-checkable (q_lineage_taxonomy).
    */
  final val PoisonMarker = "POISON:"
  final val MissingMarker = "MISSING:"
  final val UnreadableMarker = "UNREADABLE:"

  /** `SLOW:<millis>` — a pathological span whose parse busy-waits (the
    * reference tests its watchdog with a hanging-parser fixture the same
    * way). Lets the per-document deadline be exercised deterministically:
    * the wait is guaranteed >= millis, so any shorter deadline MUST fire at
    * the next span boundary.
    */
  final val SlowMarker = "SLOW:"

  /** Route one span. Returns (extractedText, reasonOrEmpty). Throws typed
    * failures for the marker cases (classified to lineage statuses by the
    * job layer, never a task failure).
    *
    * `markers=false` disables the failure-injection markers: they model the
    * exception surface of TOP-LEVEL span payloads (the synthetic corpus
    * contract), and must NOT be reachable from untrusted nested archive
    * entry bytes — an entry starting with "POISON:" is ordinary content,
    * not an instruction to fail its parent document.
    */
  def extractSpan(kind: String, text: String, cfg: Config = DefaultConfig,
                  markers: Boolean = true): (String, String) = {
    val t = if (text == null) "" else text
    if (t.length > cfg.maxSpanChars) ("", Reason.Unsupported)
    else if (!markers) routeKind(kind, t, cfg)
    else if (t.startsWith(EncryptedMarker)) ("", Reason.Encrypted)
    else if (t.startsWith(PoisonMarker)) throw new ParseFailure(s"parser crash on $kind span")
    else if (t.startsWith(MissingMarker)) throw new PayloadMissing(s"payload blob missing for $kind span")
    else if (t.startsWith(UnreadableMarker)) throw new PayloadUnreadable(s"io error reading $kind span")
    else if (t.startsWith(SlowMarker)) {
      val ms = t.substring(SlowMarker.length).takeWhile(_.isDigit) match {
        case "" => 10L; case d => d.toLong
      }
      val until = System.nanoTime() + ms * 1000000L
      while (System.nanoTime() < until) {} // simulated hanging parse
      (t, "")
    }
    else routeKind(kind, t, cfg)
  }

  private def routeKind(kind: String, t: String, cfg: Config): (String, String) =
    kind match {
      case "html"      => (HtmlExtractor.mainText(t), "")
      case "pdf"       => (PdfLayout.text(t), "")
      // REAL PDF bytes, raw or filtered (Ingest). An /Encrypt trailer first
      // tries the standard security handler with the EMPTY user password
      // (owner-restricted files open silently, exactly as PDFBox does for
      // the reference); only a real user password (or a non-RC4 handler)
      // classifies encrypted — content streams are ciphertext then, so
      // extraction must yield the reason, not garbage text
      case "pdf_bytes" =>
        if (graft.core.pdf.PdfMini.isEncryptedLatin1(t))
          graft.core.pdf.PdfCrypt.decryptEmptyUser(t) match {
            case Some(clear) => (graft.core.pdf.PdfMini.textFromLatin1(clear), "")
            case None        => ("", Reason.Encrypted)
          }
        else (graft.core.pdf.PdfMini.textFromLatin1(t), "")
      case "text"      => (t, "")
      case "media"     => (t, "") // OCR/media passthrough (north rule): text + media_ref unchanged
      // CMS/PGP payloads (smime.p7m, PGP armor): key-gated ciphertext
      // classifies encrypted; other CMS (opaque SignedData) refuses as
      // unsupported — either way never decoded-envelope garbage as text
      case "smime_enc" => ("", Reason.Encrypted)
      case "smime"     => ("", Reason.Unsupported)
      // raster images / AV containers: like Tika's ImageParser+Mp4Parser,
      // the parse SUCCEEDS with header metadata (graft.core.media.Probe)
      // and an empty body — text would need OCR/transcription, so the
      // document classifies empty-file, NOT unsupported
      case "image" | "av" => ("", "")
      // zip: an OOXML PACKAGE (docx/xlsx/pptx) yields its body text;
      // a plain archive has none
      case "zip"       => (graft.core.office.Ooxml.packageText(t, cfg.maxSpanChars), "")
      case "gzip" | "tar" | "zstd" | "bzip2" | "xz" | "lz4" | "snappy" | "compress" | "lzma" | "warc" | "jsonl" | "7z" | "rar" | "pst" | "mbox" | "parquet" | "avro" | "sqlite" | "ar" | "cpio" | "rpm" | "iso" | "chm" | "cab" | "applesingle" => ("", "") // container: no own text, entries explode to children
      // cfb: an Outlook MESSAGE yields its body text; a generic compound
      // file is a pure container (streams explode to children)
      case "cfb"       => (graft.core.office.Msg.cfbText(t, cfg.maxSpanChars), "")
      case "eml"       => (graft.core.mail.Eml.parse(t).body, "") // RFC-822: body text; attachments explode
      case "emlx"      => (graft.core.mail.Eml.parseEmlx(t).body, "") // Apple Mail length-framed message
      case "mhtml"     => // RFC 2557 page save: root part through the HTML
        // extractor (Tika routes mhtml to HtmlParser); resources explode
        (HtmlExtractor.mainText(graft.core.mail.Mhtml.parse(t).html), "")
      case "tnef"      => (graft.core.mail.Tnef.parseLatin1(t).body, "") // winmail.dat: body text; attachments explode
      case "rtf"       => (graft.core.text.Rtf.text(t), "")  // real RTF bytes (reference rtf fixture)
      case "csv"       => (graft.core.text.Csv.text(t), "")  // delimited table text (reference csv fixture)
      case "dbf"       => // dBase table: header + active rows, tab-joined
        (graft.core.db.Dbf.text(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)), "")
      case "one"       => // OneNote section: RichEditTextUnicode paragraphs
        (graft.core.office.OneNote.parseLatin1(t)._1, "")
      case "wpd"       => // WordPerfect: document-area byte-stream decode
        (graft.core.office.Wpd.text(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)), "")
      case "lnk"       => // Windows shortcut: target/string-data metadata text
        (graft.core.office.Lnk.text(t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)), "")
      case "vcard"     => (graft.core.text.Contact.vcardText(t), "") // RFC 6350 contact card
      case "ics"       => (graft.core.text.Contact.icsText(t), "")   // RFC 5545 calendar
      case "xml"       => (graft.core.text.Xml.text(t), "") // standalone XML: markup stripped (Tika XMLParser)
      case "plist"     => // Apple binary plist: flat path:value rendering; data blobs explode
        (graft.core.db.Plist.text(graft.core.db.Plist.parse(
          t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))), "")
      case _           => ("", Reason.Unsupported)
    }

  /** Span kinds that spawn embedded children in [[explodeCounted]] /
    * [[spawnContainers]] (and whose raw payload therefore rides through the
    * span-parallel path for reassembly).
    */
  val ContainerKinds: Set[String] =
    Set("media", "zip", "gzip", "tar", "eml", "emlx", "mhtml", "cfb", "zstd", "bzip2", "xz", "lz4", "snappy", "compress", "lzma", "warc", "jsonl", "7z", "rar", "pst", "tnef", "mbox", "parquet", "avro", "sqlite", "ar", "cpio", "rpm", "plist", "iso", "chm", "cab", "one", "applesingle", "pdf_bytes")

  /** Null spans (a row written with spans=NULL) are treated as an empty
    * span array — reason=empty-file, never a failure — in BOTH the batch and
    * span-parallel paths (the two must stay byte-identical).
    */
  def spansOrEmpty(doc: DocIn): Array[SpanIn] =
    if (doc.spans == null) Array.empty[SpanIn] else doc.spans

  /** Cooperative per-document deadline check (the reference's parse-timeout
    * watchdog, `Extractor.java:620-648`, re-expressed as boundary checks —
    * Spark tasks can't be safely interrupted mid-parse, so the deadline is
    * tested between spans and before each embed spawn, exactly where the
    * reference aborts between embeds, `EmbedSpawner.java:353-356`).
    * `Long.MaxValue` = no deadline; the comparison is branch-predicted away
    * in the hot path.
    */
  @inline private def checkDeadline(deadlineNanos: Long): Unit =
    if (deadlineNanos != Long.MaxValue && System.nanoTime() > deadlineNanos)
      throw new ExtractTimeout("per-document deadline exceeded")

  /** Extract one document: spans routed in offset order, `order` densely
    * re-indexed (the positional-order invariant). Ties on offset keep input
    * array order (stable sort) — the determinism contract the span-parallel
    * path reproduces via an explicit secondary key.
    */
  def extractDoc(doc: DocIn, cfg: Config = DefaultConfig,
                 deadlineNanos: Long = Long.MaxValue): DocOut = {
    val sorted = spansOrEmpty(doc).sortBy(_.offset).take(cfg.maxSpans)
    var anyContent = false
    var anyEncrypted = false
    var anyUnsupported = false
    val out = new Array[SpanOut](sorted.length)
    var i = 0
    while (i < sorted.length) {
      checkDeadline(deadlineNanos)
      val s = sorted(i)
      val (txt, why) = extractSpan(s.kind, s.text, cfg)
      if (txt.nonEmpty) anyContent = true
      if (why == Reason.Encrypted) anyEncrypted = true
      // the size-guard refusal of a SUPPORTED kind also reads Unsupported
      // at span level; an oversized text file is not an unsupported media
      // type, so only in-size refusals count toward the doc-level reason
      if (why == Reason.Unsupported && s.text != null &&
        s.text.length <= cfg.maxSpanChars) anyUnsupported = true
      out(i) = SpanOut(s.kind, txt, if (s.media_ref == null) "" else s.media_ref, i)
      i += 1
    }
    // doc-level reason: encrypted outranks unsupported outranks empty —
    // a document that is ONLY unparseable binary reports
    // unsupported-media-type exactly as the reference's FallbackParser
    // does for its garbage.bin fixture (`ExtractorTest.java` expects it);
    // empty-file stays reserved for genuinely content-less documents
    val reason =
      if (!anyContent && anyEncrypted) Reason.Encrypted
      else if (!anyContent && anyUnsupported) Reason.Unsupported
      else if (sorted.isEmpty || !anyContent) Reason.Empty
      else ""
    val rid = Ids.rootId(doc.doc_id)
    DocOut(rid, "", rid, 0, out, reason)
  }

  /** Embed explosion (the reference's flatMap, `EmbedSpawner.java:429-515`):
    * the root row plus one child row per media span, RECURSIVELY — a media
    * span whose text is `chain:a>b>c` models a nested container (msg-in-msg,
    * archive-in-archive): it spawns child `a`, which spawns grandchild `b`,
    * etc., depth-first, exactly like the reference's tikaDocumentStack DFS.
    *
    * Child ids are recursive content hashes (`DigestIdentifier.java:26-68`
    * via [[Ids.embedId]]); ordinal = index among the parent's media spans
    * (per-parent ordinal naming, `EmbedSpawner.java:264-281`). A content-less
    * media span still spawns a child with the hash component dropped and
    * reason=empty-file. Children beyond `cfg.maxEmbedDepth` are REFUSED
    * before recursion (`EmbedSpawner.java:55,389-392`) and counted on the
    * skipping ancestor's lineage via the returned skip count.
    */
  def explode(doc: DocIn, cfg: Config = DefaultConfig): Seq[DocOut] =
    explodeCounted(doc, cfg)._1

  /** As [[explode]], also returning the number of embeds skipped by the
    * depth guard (the X-EXTRACT:embedsSkippedMaxDepth analog).
    */
  def explodeCounted(doc: DocIn, cfg: Config = DefaultConfig,
                     deadlineNanos: Long = Long.MaxValue): (Seq[DocOut], Int) = {
    val root = extractDoc(doc, cfg, deadlineNanos)
    val containers = spansOrEmpty(doc).filter(s => ContainerKinds(s.kind)).sortBy(_.offset)
      .map(s => (s.kind, if (s.text == null) "" else s.text)).toSeq
    val (children, skipped) = spawnContainers(containers, root.doc_id, cfg, deadlineNanos)
    (root +: children, skipped)
  }

  /** CONCATENATE embed mode (`EmbedParser.java:57-76`): embedded documents
    * are not spawned as rows — each is parsed INLINE and wrapped in a
    * package-entry division inside the parent's output
    * (`<div class="package-entry"><h1>name</h1>…`), nameless entries named
    * untitled_<ordinal>. A per-entry failure (encrypted, unparseable,
    * parser crash) is captured IN the entry (`<p class="error">reason</p>`)
    * and counted — the reference records it in the entry's metadata rather
    * than failing the parent. Returns (concatenated html, n failed entries).
    */
  /** XML-escape for entry names/text interpolated into the package markup —
    * the reference writes entries through an escaping XHTML content handler,
    * so entry CONTENT can never forge or break package-entry structure.
    */
  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def concatEmbeds(entries: Seq[(String, String)], cfg: Config = DefaultConfig)
  : (String, Int) = {
    var failed = 0
    val sb = new StringBuilder
    entries.zipWithIndex.foreach { case ((name, content), ord) =>
      val nm = xmlEscape(graft.core.Ids.embedName(name, ord, ord))
      val body =
        try {
          val (txt, why) = extractSpan("text", content, cfg)
          if (why.isEmpty) s"<p>${xmlEscape(txt)}</p>"
          else { failed += 1; s"""<p class="error">$why</p>""" }
        } catch {
          case _: Exception => failed += 1; """<p class="error">parse-error</p>"""
        }
      sb.append(s"""<div class="package-entry"><h1>$nm</h1>$body</div>""")
    }
    (sb.toString, failed)
  }

  /** Back-compat wrapper: media-only container spawning (the original
    * surface; tests and callers with media-only corpora use this).
    */
  def spawnEmbeds(mediaContents: Seq[String], rootId: String, cfg: Config,
                  deadlineNanos: Long = Long.MaxValue): (Vector[DocOut], Int) =
    spawnContainers(mediaContents.map(("media", _)), rootId, cfg, deadlineNanos)

  /** Spawn embedded child documents from the parent's container spans (in
    * offset order) — shared by [[explodeCounted]] and the span-parallel
    * reassembly path so both produce byte-identical trees.
    *
    * Container kinds:
    *  - `media`: the synthetic chain model (`chain:a>b` nests) — ids from
    *    the raw content;
    *  - `zip`: REAL archive bytes (`java.util.zip`) — one child per entry
    *    with resourceName = entry name (`EmbedSpawner.java:429-515`
    *    semantics); an entry that is itself a zip becomes a container child
    *    (id over its canonical entries, [[Ids.canonicalEntries]]) whose own
    *    entries recurse depth-first, exactly like the reference's
    *    tikaDocumentStack;
    *  - `gzip`: single-member container, FNAME as the resource name.
    *
    * Guards refuse BEFORE recursion (`EmbedSpawner.java:389-402`): depth,
    * declared/actual decompressed size, and breadth — refusals are counted,
    * never silent. A corrupt container throws ParseFailure, which the job
    * layer classifies to a lineage status (never a task failure).
    */
  def spawnContainers(containers: Seq[(String, String)], rootId: String, cfg: Config,
                      deadlineNanos: Long = Long.MaxValue)
  : (Vector[DocOut], Int) = {
    val out = Vector.newBuilder[DocOut]
    var skipped = 0
    var spawned = 0

    def guardsRefuse(level: Int, contentLen: Int): Boolean =
      level > cfg.maxEmbedDepth || contentLen > cfg.maxSpanChars ||
        spawned >= cfg.maxSpans

    // synthetic media chain (the original model)
    def spawn(content: String, parentId: String, ord: Int, level: Int): Unit = {
      checkDeadline(deadlineNanos)
      if (guardsRefuse(level, content.length)) { skipped += 1; return }
      spawned += 1
      val (own, nested) =
        if (content.startsWith("chain:")) {
          val payload = content.substring(6)
          val gt = payload.indexOf('>')
          if (gt < 0) (payload, None) else (payload.substring(0, gt), Some(payload.substring(gt + 1)))
        } else (content, None)
      val cid = Ids.embedId(content, parentId, ord)
      val spans =
        if (own.isEmpty) Array.empty[SpanOut]
        else Array(SpanOut("text", own, "", 0))
      out += DocOut(cid, parentId, rootId, level,
        spans, if (own.isEmpty) Reason.Empty else "")
      nested.foreach(n => spawn("chain:" + n, cid, 0, level + 1))
    }

    def canonicalOf(entries: Vector[graft.sources.Archive.UnzippedEntry]): String =
      Ids.canonicalEntries(entries.map { case (n, b) =>
        (n, b.map(x => new String(x, java.nio.charset.StandardCharsets.ISO_8859_1)).getOrElse(""))
      })

    // emit one DOCUMENT node: the body as its single text span,
    // empty-file reason when bodyless — the shared emission shape for
    // msg / legacy-Office / nested-mail / jsonl-line children
    def emitDoc(cid: String, parentId: String, level: Int, body: String): Unit = {
      val spans =
        if (body.isEmpty) Array.empty[SpanOut] else Array(SpanOut("text", body, "", 0))
      out += DocOut(cid, parentId, rootId, level, spans,
        if (body.isEmpty) Reason.Empty else "")
    }

    // one JSONL line -> one child carrying its top-level "text" field; a
    // malformed or text-less line yields an empty child (per-line
    // resilience), never a parent failure. Identity hashes the TRIMMED
    // line — deliberately CRLF- and indent-insensitive, so the same
    // logical record gets the same id from an LF and a CRLF dump.
    // Shared by the top-level jsonl span and nested jsonl entries
    // (.jsonl.gz / jsonl-in-zip) so the two can never diverge.
    def spawnJsonlLines(content: String, parentId: String, startOrd: Int,
                        level: Int): Int = {
      var o = startOrd
      content.split('\n').iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        checkDeadline(deadlineNanos)
        if (guardsRefuse(level, line.length)) skipped += 1
        else {
          spawned += 1
          val txt = graft.core.text.Jsonl.textField(line).getOrElse("")
          emitDoc(Ids.embedId(line, parentId, o), parentId, level, txt)
        }
        o += 1
      }
      o
    }

    // one parquet corpus dump -> one child per ROW (the jsonl contract
    // for columnar dumps): identity hashes the row's text value; NULL
    // rows are empty children; EVERY row past the breadth cap refuses
    // COUNTED — the ones read then guarded, and the declared remainder
    // the reader never materialized (footer row count is metadata)
    def dumpRowCap: Int = // overflow-safe headroom over the breadth guard
      if (cfg.maxSpans > Int.MaxValue - 64) Int.MaxValue else cfg.maxSpans + 64
    def readParquetRows(data: Array[Byte]): (Vector[String], Long) =
      graft.sources.ParquetDump.textRows(data, dumpRowCap, cfg.maxSpanChars)
    def readAvroRows(data: Array[Byte]): (Vector[String], Long) =
      graft.sources.AvroDump.textRows(data, dumpRowCap, cfg.maxSpanChars)
    def emitDumpRows(rows: Vector[String], declaredTotal: Long,
                     parentId: String, startOrd: Int, level: Int): Int = {
      var o = startOrd
      rows.foreach { txt =>
        checkDeadline(deadlineNanos)
        if (guardsRefuse(level, txt.length)) skipped += 1
        else { spawned += 1; emitDoc(Ids.embedId(txt, parentId, o), parentId, level, txt) }
        o += 1
      }
      if (declaredTotal > rows.length) // clamp: a forged huge row count must not wrap the counter
        skipped += math.min(declaredTotal - rows.length, (Int.MaxValue - skipped).toLong).toInt
      o
    }

    // every user table of a SQLite database -> one tabular document child
    // (header + tab-joined rows, the csv/xls text shape); BLOB cells spawn
    // as sniffed embedded children below their table — Tika's
    // SQLite3Parser shape (tables as embedded documents, blobs nested).
    // Shared by the top-level sqlite span and nested sqlite entries.
    def spawnSqliteTables(tabs: Vector[graft.core.db.Sqlite.Table],
                          parentId: String, startOrd: Int, level: Int): Int = {
      var o = startOrd
      tabs.foreach { tab =>
        checkDeadline(deadlineNanos)
        val txt = graft.core.db.Sqlite.tableText(tab)
        if (guardsRefuse(level, txt.length)) skipped += 1
        else {
          spawned += 1
          val cid = Ids.embedId(txt, parentId, o, resourceName = tab.name)
          emitDoc(cid, parentId, level, txt)
          var bi = 0
          tab.rows.foreach { r =>
            r.cells.zipWithIndex.foreach {
              case (graft.core.db.Sqlite.BlobCell(b), ci) =>
                spawnEntry(s"${tab.name}_r${r.rowid}_c$ci", Some(b), cid, bi, level + 1)
                bi += 1
              case _ => ()
            }
          }
        }
        o += 1
      }
      o
    }

    // one raw mbox message chunk -> an eml-shaped document child (body +
    // recursing attachments); shared by the top-level mbox span and
    // nested mbox entries so the two routes cannot diverge
    def spawnMboxMessage(raw: String, parentId: String, ord: Int, level: Int): Unit = {
      checkDeadline(deadlineNanos)
      if (guardsRefuse(level, raw.length)) { skipped += 1; return }
      spawned += 1
      val cid = Ids.embedId(raw, parentId, ord)
      // PER-MESSAGE isolation, parse before any emission: one encrypted
      // (S/MIME, PGP/MIME) or malformed message becomes ONE classified
      // failure child — never a mailbox-level failure that would drop
      // every other message (and, via the retryable NotDecrypted status,
      // re-fail the whole archive on every resume)
      val m =
        try graft.core.mail.Eml.parse(raw)
        catch {
          case _: graft.core.DecryptFailure =>
            out += DocOut(cid, parentId, rootId, level, Array.empty, Reason.Encrypted)
            return
          case _: graft.core.ParseFailure =>
            out += DocOut(cid, parentId, rootId, level, Array.empty, Reason.ParseFailed)
            return
        }
      emitDoc(cid, parentId, level, m.body)
      m.attachments.zipWithIndex.foreach { case ((n, b), i) =>
        spawnEntry(n, Some(b), cid, i, level + 1)
      }
    }

    // one parsed Outlook message -> one DOCUMENT child (body text), its
    // attachments recursing: file attachments re-enter the sniffed entry
    // path; an attached message (msg-in-msg, the reference's
    // `3rd-level-bug-732.msg` shape) recurses as another message child.
    // Identity hashes the message's LOGICAL canonical fields
    // (Msg.canonical), so property-stream encoding never changes ids.
    def spawnMsg(m: graft.core.office.Msg.MsgDoc, resourceName: String,
                 parentId: String, ord: Int, level: Int): Unit = {
      checkDeadline(deadlineNanos)
      val canon = graft.core.office.Msg.canonical(m)
      if (guardsRefuse(level, canon.length)) { skipped += 1; return }
      spawned += 1
      val cid = Ids.embedId(canon, parentId, ord, resourceName = resourceName)
      emitDoc(cid, parentId, level, m.body)
      m.attachments.zipWithIndex.foreach { case (a, i) => spawnAtt(a, cid, i, level + 1) }
    }

    /** One attachment of any message-shaped parse (.msg, .pst, TNEF):
      * files sniff like archive entries, nested messages recurse, and a
      * truncation STUB (OST-2013 recovery semantics) becomes a NAMED
      * content-less parse-failure child — the attachment is visibly lost
      * per document, never silently dropped and never a message failure
      * (`ResilientOutlookPSTParser.java:580-628`).
      */
    def spawnAtt(a: graft.core.office.Msg.Attachment, pid: String, ord: Int,
                 lvl: Int): Unit = a match {
      case graft.core.office.Msg.FileAtt(n, b) => spawnEntry(n, Some(b), pid, ord, lvl)
      case graft.core.office.Msg.MsgAtt(sub) => spawnMsg(sub, sub.subject, pid, ord, lvl)
      case graft.core.office.Msg.StubAtt(n, _) =>
        if (guardsRefuse(lvl, 0)) skipped += 1
        else {
          spawned += 1
          out += DocOut(Ids.embedId("", pid, ord, resourceName = n), pid, rootId,
            lvl, Array.empty, Reason.ParseFailed)
        }
    }

    // one parsed PST mailbox -> its folder tree as container nodes
    // (subfolders first, then messages/failures in node-B-tree order),
    // messages through the SHARED spawnMsg machinery so a message carries
    // the same logical-canonical id in a .pst as in a .msg; per-message
    // failures isolate as parse-failure children; messages unlinked from
    // every contents table land under a [recovered] node — the
    // reference's ResilientOutlookPSTParser semantics
    // (`ResilientOutlookPSTParser.java:71-320`).
    def spawnPstNodes(pst: graft.core.office.Pst.PstFile, parentId: String,
                      level: Int): Unit = {
      checkDeadline(deadlineNanos)
      val Root = graft.core.office.Pst.RootFolderNid
      // tree keyed by NID, never by display-name paths: folder names may
      // contain '/', siblings may share a name, and a real folder may be
      // literally named "[recovered]" — none of those may misroute a
      // subtree. Orphan folders (parent nid not a folder) re-parent to
      // the root level rather than silently dropping their messages.
      val knownFolders = pst.folders.iterator.map(_.nid).toSet
      val subsOf = pst.folders.filter(_.nid != Root).groupBy { f =>
        // self-parented non-root folders are orphans too (longer parent
        // cycles already fail parse's depth-capped path computation)
        if (f.parentNid != f.nid && knownFolders.contains(f.parentNid)) f.parentNid else Root
      }
      val msgsOf = pst.messages.filter(!_.recovered).groupBy(_.folderNid)
      val failsOf = pst.failures.filter(!_.recovered).groupBy(_.folderNid)
      def emitMsgOrFail(item: Either[graft.core.office.Pst.Message, graft.core.office.Pst.MessageFailure],
                        pid: String, ord: Int, lvl: Int): Unit = item match {
        case Left(m) =>
          spawnMsg(graft.core.office.Msg.MsgDoc(m.subject, m.from, m.body, m.attachments),
            m.subject, pid, ord, lvl)
        case Right(_) =>
          // content-less failure child: same breadth/depth guards as every
          // other spawn path (a bomb of cheap corrupt messages must cap)
          if (guardsRefuse(lvl, 0)) skipped += 1
          else {
            spawned += 1
            out += DocOut(Ids.embedId("", pid, ord), pid, rootId, lvl, Array.empty,
              Reason.ParseFailed)
          }
      }
      def items(fnid: Long) =
        (msgsOf.getOrElse(fnid, Vector.empty).map(m => (m.nid, Left(m))) ++
          failsOf.getOrElse(fnid, Vector.empty).map(f => (f.nid, Right(f))))
          .sortBy(_._1).map(_._2)
      def walkFolder(fnid: Long, pid: String, lvl: Int): Int = {
        var ord = 0
        subsOf.getOrElse(fnid, Vector.empty).foreach { f =>
          checkDeadline(deadlineNanos)
          if (guardsRefuse(lvl, f.name.length)) skipped += 1
          else {
            spawned += 1
            val cid = Ids.embedId(f.name, pid, ord, resourceName = f.name)
            emitDoc(cid, pid, lvl, "")
            walkFolder(f.nid, cid, lvl + 1): Unit
          }
          ord += 1
        }
        items(fnid).foreach { it => emitMsgOrFail(it, pid, ord, lvl); ord += 1 }
        ord
      }
      val rootOrd = walkFolder(Root, parentId, level)
      val recovered =
        pst.messages.filter(_.recovered).map(m => (m.nid, Left(m))) ++
          pst.failures.filter(_.recovered).map(f => (f.nid, Right(f)))
      if (recovered.nonEmpty) {
        if (guardsRefuse(level, "[recovered]".length)) skipped += recovered.size + 1
        else {
          spawned += 1
          val recId = Ids.embedId("[recovered]", parentId, rootOrd, resourceName = "[recovered]")
          emitDoc(recId, parentId, level, "")
          recovered.sortBy(_._1).map(_._2).zipWithIndex.foreach { case (it, i) =>
            emitMsgOrFail(it, recId, i, level + 1)
          }
        }
      }
    }

    // one REAL archive entry -> one child document: plain archives
    // (zip/tar/gzip) become container nodes whose entries recurse; an OOXML
    // package (docx) becomes a DOCUMENT child (body text + its embedded
    // parts); anything else SNIFFS its kind and extracts like a top-level
    // file (rtf/pdf/html/text/bin)
    def spawnEntry(name: String, bytes: Option[Array[Byte]], parentId: String,
                   ord: Int, level: Int): Unit = {
      checkDeadline(deadlineNanos)
      val declaredLen = bytes.map(_.length).getOrElse(Int.MaxValue) // None = size guard refused
      if (bytes.isEmpty || guardsRefuse(level, declaredLen)) { skipped += 1; return }
      spawned += 1
      val data = bytes.get
      if (graft.core.office.Ole.isOle10Name(name)) {
        // OLE packager stream: pure transport — the wrapped file spawns
        // sniffed under its LABEL (the recursive_embedded.docx chain);
        // an unparseable packager falls through to the generic spawn.
        // Unwrapping loops HERE (hop-capped) instead of recursing, so a
        // crafted packager-in-packager chain can never bypass the depth
        // guard or overflow the stack
        var label = name
        var payload = data
        var hops = 0
        var more = graft.core.office.Ole.tryUnwrap(payload)
        while (more.isDefined && hops < 4) {
          label = more.get._1; payload = more.get._2; hops += 1
          more = if (graft.core.office.Ole.isOle10Name(label))
            graft.core.office.Ole.tryUnwrap(payload) else None
        }
        if (hops > 0 && !graft.core.office.Ole.isOle10Name(label)) {
          spawned -= 1
          spawnEntry(label, Some(payload), parentId, ord, level)
          return
        }
      }
      if (graft.core.office.Pst.isPst(data)) {
        // nested Outlook mailbox (pst-in-zip): a container child whose
        // folder/message tree hangs below it; untrusted entry bytes must
        // never fail the parent. Parse happens BEFORE any emission so a
        // failure can never leave a duplicate/partial node behind; an
        // encrypted pst classifies encrypted, a broken one parse-failure
        val latin1 = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
        val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
        val parsed =
          try Right(graft.core.office.Pst.parse(data,
            graft.core.office.Pst.byteBudget(cfg.maxSpanChars)))
          catch {
            case _: graft.core.DecryptFailure => Left(Reason.Encrypted)
            case _: graft.core.ParseFailure => Left(Reason.ParseFailed)
          }
        parsed match {
          case Right(pst) =>
            emitDoc(cid, parentId, level, "")
            spawnPstNodes(pst, cid, level + 1)
          case Left(reason) =>
            out += DocOut(cid, parentId, rootId, level, Array.empty, reason)
        }
        return
      }
      // per-entry isolation for every parse below (reference EmbedSpawner
      // catches per embed): a ParseFailure/DecryptFailure from THIS
      // entry's parse becomes a content-less failure child — never a
      // parent failure, and never a duplicate node (each branch parses
      // before its first emission, and recursion into children isolates
      // at the child's own frame). Deadline/VM errors still propagate.
      def entryFailure(reason: String): Unit =
        out += DocOut(
          Ids.embedId(new String(data, java.nio.charset.StandardCharsets.ISO_8859_1),
            parentId, ord, resourceName = name),
          parentId, rootId, level, Array.empty, reason)
      if (graft.core.office.Cfb.isCfb(data)) {
        try {
        // OLE2 compound file: a MESSAGE becomes a document child (undo the
        // spawned count — spawnMsg re-applies its own guards); a generic
        // compound file is a container node whose streams recurse
        val entries = graft.core.office.Cfb.streamEntries(data, cfg.maxSpanChars)
        if (graft.core.office.Msg.isEncryptedOffice(entries)) {
          // nested password-protected Office doc: the silent-open
          // defaults (VelvetSweatshop, empty) may open it as an ordinary
          // package — then it re-enters as the decrypted ZIP; a real
          // password classifies this child encrypted
          val zip = graft.core.office.OoxmlCrypt.decryptDefault(entries)
          spawned -= 1
          spawnEntry(name, Some(zip), parentId, ord, level)
          return
        }
        if (graft.core.office.Msg.isMsg(entries)) {
          spawned -= 1
          spawnMsg(graft.core.office.Msg.parse(entries), name, parentId, ord, level)
        } else graft.core.office.Msg.docText(entries) match {
          case Some(body) =>
            // legacy Office binary (.doc/.xls/.ppt): a DOCUMENT child
            // carrying its extracted text. Format-plumbing streams never
            // spawn, but EMBEDDED OBJECTS (the ObjectPool storage POI
            // walks for OLE attachments) do, each sniffed like an
            // archive entry
            val cid = Ids.embedId(canonicalOf(entries), parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, body)
            entries.filter(_._1.startsWith("ObjectPool/")).zipWithIndex.foreach {
              case ((n, b), i) => spawnEntry(n, b, cid, i, level + 1)
            }
          case None =>
            val cid = Ids.embedId(canonicalOf(entries), parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // empty container node
            entries.zipWithIndex.foreach { case ((n, b), i) =>
              spawnEntry(n, b, cid, i, level + 1)
            }
        }
        } catch {
          case _: graft.core.DecryptFailure => entryFailure(Reason.Encrypted)
          case _: graft.core.ParseFailure => entryFailure(Reason.ParseFailed)
        }
        return
      }
      try {
      val containerEntries: Option[Vector[graft.sources.Archive.UnzippedEntry]] =
        if (graft.sources.Archive.isZip(data))
          Some(graft.sources.Archive.unzip(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.isTar(data))
          Some(graft.sources.Archive.untar(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.is7z(data))
          Some(graft.sources.Archive.un7z(data, cfg.maxSpanChars))
        else if (graft.sources.Rar.isRar(data))
          // nested rar (the email-attachment shape): stored members
          // recurse, compressed ones stay counted refusals
          Some(graft.sources.Rar.entries(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.isAr(data))
          // nested unix archive (.deb attachment): members recurse —
          // control.tar.gz/data.tar.xz chain through the codec branches
          Some(graft.sources.Archive.unar(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.isCpio(data))
          Some(graft.sources.Archive.uncpio(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.isRpm(data))
          // nested rpm: payload framing flattened, files are the entries
          Some(graft.sources.Archive.rpmEntries(data, cfg.maxSpanChars))
        else if (graft.sources.Iso.isIso(data))
          // nested disk image (iso-in-zip, the evidence-drop shape):
          // files recurse as path-named entries
          Some(graft.sources.Iso.entries(data, cfg.maxSpanChars))
        else if (graft.sources.Chm.isChm(data))
          // nested compiled help: topic files recurse as entries
          Some(graft.sources.Chm.entries(data, cfg.maxSpanChars))
        else if (graft.sources.Cab.isCab(data))
          // nested cabinet (cab-in-zip, the driver-package shape)
          Some(graft.sources.Cab.entries(data, cfg.maxSpanChars))
        else if (graft.sources.Archive.isGzip(data))
          // a nested gzip member (e.g. a .tgz mail attachment) is a
          // single-entry container; a tar payload then recurses below
          Some(Vector(graft.sources.Archive.gunzip(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isZstd(data))
          Some(Vector(graft.sources.Archive.unzstd(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isBzip2(data))
          Some(Vector(graft.sources.Archive.unbzip2(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isXz(data))
          Some(Vector(graft.sources.Archive.unxz(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isCompressZ(data))
          Some(Vector(graft.sources.Archive.uncompressZ(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isLzma(data))
          Some(Vector(graft.sources.Archive.unlzma(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isLz4(data))
          Some(Vector(graft.sources.Archive.unlz4(data, cfg.maxSpanChars)))
        else if (graft.sources.Archive.isSnappy(data))
          Some(Vector(graft.sources.Archive.unsnappy(data, cfg.maxSpanChars)))
        else if (graft.sources.Apple.isAppleSingle(data))
          // nested AppleSingle (Mac tarball shape): one transport entry —
          // the data fork under the real name, re-sniffed below
          Some(Vector(graft.sources.Apple.unwrap(data, cfg.maxSpanChars)))
        else if (graft.sources.Warc.isWarc(data))
          // nested web archive (the .warc.gz shape): records are its
          // entries, target URIs their resource names
          Some(graft.sources.Warc.records(
            new String(data, java.nio.charset.StandardCharsets.ISO_8859_1),
            cfg.maxSpanChars).map(r => (r.targetUri, r.body)))
        else None
      containerEntries match {
        case Some(entries) if graft.core.office.Ooxml.isPackageEntries(entries) =>
          // embedded Office document (docx/xlsx/pptx/odt/epub): body text
          // on the child, embedded media/object parts recurse — EPUB's
          // embedded parts come from its OPF manifest (image-typed items),
          // not from fixed path prefixes
          val cid = Ids.embedId(canonicalOf(entries), parentId, ord, resourceName = name)
          emitDoc(cid, parentId, level, graft.core.office.Ooxml.textFromEntries(entries))
          val embedded =
            if (graft.core.office.Epub.isEpub(entries)) {
              val imgs = graft.core.office.Epub.imageSet(entries)
              entries.filter(e => imgs(e._1))
            } else entries.filter(e => graft.core.office.Ooxml.isEmbeddedPart(e._1))
          embedded.zipWithIndex.foreach { case ((n, b), i) => spawnEntry(n, b, cid, i, level + 1) }
        case Some(entries) =>
          val cid = Ids.embedId(canonicalOf(entries), parentId, ord, resourceName = name)
          // container node: no own text; its content lives in its children
          emitDoc(cid, parentId, level, "") // empty container node
          entries.zipWithIndex.foreach { case ((n, b), i) =>
            spawnEntry(n, b, cid, i, level + 1)
          }
        case None =>
          // content IDENTITY hashes the raw bytes (byte-transparent
          // ISO-8859-1 mapping); a lossy UTF-8 id would collide two
          // distinct binary payloads onto one replacement-char string.
          // The entry's KIND is sniffed like a top-level file (magic
          // bytes), so an rtf/pdf/html nested in an archive extracts the
          // same clean text it would standalone instead of leaking markup
          val latin1 = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
          // entry NAME rides into the sniff as the same tiebreaker the
          // real file walk uses (a data.csv zip entry routes as csv)
          val kind = graft.sources.Ingest.sniffKind(data, name)
          if (kind == "jsonl") {
            // nested corpus dump (.jsonl.gz, jsonl-in-zip): a container
            // child whose per-line documents hang below it — WITHOUT this
            // branch the lines would silently collapse into one empty child
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // empty container node
            spawnJsonlLines(graft.sources.Ingest.decodePayload(kind, data), cid, 0, level + 1)
          } else if (kind == "eml") {
            // nested mail (eml-in-zip/tgz): a document child carrying the
            // body, its attachments recursing below — mail-in-archive is
            // reference bread-and-butter (RFC822Parser inside EmbedSpawner)
            val m = graft.core.mail.Eml.parse(latin1)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, m.body)
            m.attachments.zipWithIndex.foreach { case ((n, b), i) =>
              spawnEntry(n, Some(b), cid, i, level + 1)
            }
          } else if (kind == "parquet") {
            // nested columnar dump (parquet-in-zip/tar): a container child
            // whose per-row documents hang below it. Parse BEFORE the
            // first emission — a corrupt nested dump must yield exactly
            // one failure node, never a duplicate-id container + failure
            val (rows, total) = readParquetRows(data)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // pure container node
            emitDumpRows(rows, total, cid, 0, level + 1): Unit
          } else if (kind == "avro") {
            // nested avro dump: same shape as nested parquet — parse
            // before the first emission
            val (rows, total) = readAvroRows(data)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // pure container node
            emitDumpRows(rows, total, cid, 0, level + 1): Unit
          } else if (kind == "sqlite") {
            // nested database (db-in-zip, the phone-backup shape): a
            // container child whose per-table documents hang below it —
            // parse before the first emission so a corrupt nested db
            // yields exactly one failure node
            val tabs = graft.core.db.Sqlite.tables(data, maxCells = dumpRowCap)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // pure container node
            spawnSqliteTables(tabs, cid, 0, level + 1): Unit
          } else if (kind == "plist") {
            // nested binary plist (plist-in-zip, the app-artifact shape):
            // a document child carrying the rendered text, its NSData
            // payloads recursing below — parse before the first emission
            val parsed = graft.core.db.Plist.parse(data)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, graft.core.db.Plist.text(parsed))
            graft.core.db.Plist.dataBlobs(parsed).zipWithIndex.foreach {
              case ((path, b), i) => spawnEntry(path, Some(b), cid, i, level + 1)
            }
          } else if (kind == "mbox") {
            // nested mailbox (mbox.gz, mbox-in-zip): a container child
            // whose messages hang below it
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, "") // pure container node
            // latin1 IS the byte-transparent payload decodePayload would
            // produce for mbox — reuse it instead of re-decoding
            graft.core.mail.Mbox.split(latin1).zipWithIndex.foreach {
              case (raw, i) => spawnMboxMessage(raw, cid, i, level + 1)
            }
          } else if (kind == "emlx") {
            // nested Apple Mail store file (the Mail-folder-tarball
            // shape): a document child carrying the framed message's
            // body, attachments recursing
            val m = graft.core.mail.Eml.parseEmlx(latin1)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, m.body)
            m.attachments.zipWithIndex.foreach { case ((n, b), i) =>
              spawnEntry(n, Some(b), cid, i, level + 1)
            }
          } else if (kind == "mhtml") {
            // nested page save (mht-in-zip, mht mail attachment): a
            // document child carrying the page's extracted main text,
            // its saved resources recursing below
            val m = graft.core.mail.Mhtml.parse(latin1)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, HtmlExtractor.mainText(m.html))
            m.parts.zipWithIndex.foreach { case ((n, b), i) =>
              spawnEntry(n, Some(b), cid, i, level + 1)
            }
          } else if (kind == "one") {
            // nested OneNote section (.one inside a notebook zip): a
            // document child carrying its paragraphs, embedded
            // FileDataStoreObject payloads recursing as sniffed children
            val (txt1, fs) = graft.core.office.OneNote.parse(data)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, txt1)
            fs.zipWithIndex.foreach { case (fb, i) =>
              spawnEntry(s"fileData_$i", Some(fb), cid, i, level + 1)
            }
          } else if (kind == "tnef") {
            // nested winmail.dat (the REAL shape: a TNEF attachment inside
            // an eml): a document child carrying the body, attachments
            // recursing — id hashes the raw bytes like nested eml
            val m = graft.core.mail.Tnef.parseLatin1(latin1)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            emitDoc(cid, parentId, level, m.body)
            m.attachments.zipWithIndex.foreach { case (a, i) => spawnAtt(a, cid, i, level + 1) }
          } else {
            val payload = graft.sources.Ingest.decodePayload(kind, data)
            // markers=false: failure-injection markers are a top-level-span
            // contract; untrusted entry BYTES must never fail/hang the parent
            val (txt, why) = extractSpan(kind, payload, cfg, markers = false)
            val cid = Ids.embedId(latin1, parentId, ord, resourceName = name)
            val spans =
              if (txt.isEmpty) Array.empty[SpanOut]
              else Array(SpanOut(kind, txt, "", 0))
            out += DocOut(cid, parentId, rootId, level, spans,
              if (txt.nonEmpty) "" else if (why.nonEmpty) why else Reason.Empty)
          }
      }
      } catch {
        case _: graft.core.DecryptFailure => entryFailure(Reason.Encrypted)
        case _: graft.core.ParseFailure => entryFailure(Reason.ParseFailed)
      }
    }

    var ord = 0
    containers.foreach { case (kind, content) =>
      kind match {
        case "media" =>
          spawn(content, rootId, ord, 1); ord += 1
        case "zip" =>
          // the archive IS the parent document: entries are its children.
          // An OOXML PACKAGE (docx/xlsx/pptx) instead contributes body text
          // to the parent (extractSpan's zip route) and spawns only its
          // embedded media/object parts.
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val entries = graft.sources.Archive.unzip(bytes, cfg.maxSpanChars)
          val spawnable =
            if (graft.core.office.Epub.isEpub(entries)) {
              // EPUB package: embedded parts are its OPF manifest's
              // image-typed items, not fixed path prefixes
              val imgs = graft.core.office.Epub.imageSet(entries)
              entries.filter(e => imgs(e._1))
            } else if (graft.core.office.Ooxml.isPackageEntries(entries))
              entries.filter(e => graft.core.office.Ooxml.isEmbeddedPart(e._1))
            else entries
          spawnable.foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "tar" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Archive.untar(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "7z" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Archive.un7z(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "rar" =>
          // stored members spawn; compressed members are counted refusals
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Rar.entries(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "ar" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Archive.unar(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "cpio" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Archive.uncpio(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "iso" =>
          // disk image: its files are path-named children (Joliet names
          // when the supplementary descriptor announces them)
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Iso.entries(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "chm" =>
          // compiled help: topic files are path-named children; the
          // compressed section LZX-decodes once for all of them
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Chm.entries(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "cab" =>
          // cabinet: files are children; each MSZIP folder inflates once
          // for all of its files (history carried across blocks)
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Cab.entries(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "rpm" =>
          // the package's FILES are its children (rpm2cpio | cpio): the
          // compressed payload is transport framing, never a node — the
          // same flattening Tika's RpmParser applies
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.sources.Archive.rpmEntries(bytes, cfg.maxSpanChars).foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "gzip" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.gunzip(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "zstd" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unzstd(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "bzip2" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unbzip2(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "xz" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unxz(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "compress" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.uncompressZ(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "lzma" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unlzma(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "lz4" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unlz4(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "snappy" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (n, b) = graft.sources.Archive.unsnappy(bytes, cfg.maxSpanChars)
          spawnEntry(n, b, rootId, ord, 1); ord += 1
        case "warc" =>
          // each content-bearing web-archive record (response/resource)
          // becomes a child: target URI as resource name, body sniffed
          // like any ingested file (html flows through the charset decode
          // and boilerplate stripper)
          graft.sources.Warc.records(content, cfg.maxSpanChars).foreach { r =>
            spawnEntry(r.targetUri, r.body, rootId, ord, 1); ord += 1
          }
        case "jsonl" =>
          // one JSON object per line = one logical document per line
          // (shared with the NESTED route via spawnJsonlLines)
          ord = spawnJsonlLines(content, rootId, ord, 1)
        case "cfb" =>
          // the compound file IS the parent document: a message's
          // attachments (file or nested message) become its children; a
          // generic compound file spawns each stream sniffed like an
          // archive entry
          val entries = graft.core.office.Cfb.streamEntriesOf(content, cfg.maxSpanChars)
          if (graft.core.office.Msg.isEncryptedOffice(entries)) {
            // the silent-open defaults may open it as an ordinary OOXML
            // package (body text already flowed via cfbText): spawn only
            // its embedded parts, like the zip route; a real password
            // throws DecryptFailure — never explode ciphertext children
            val zip = graft.core.office.OoxmlCrypt.decryptDefault(entries)
            val zipEntries = graft.sources.Archive.unzip(zip, cfg.maxSpanChars)
            val spawnable =
              if (graft.core.office.Ooxml.isPackageEntries(zipEntries))
                zipEntries.filter(e => graft.core.office.Ooxml.isEmbeddedPart(e._1))
              else zipEntries
            spawnable.foreach { case (n, b) =>
              spawnEntry(n, b, rootId, ord, 1); ord += 1
            }
          }
          else if (graft.core.office.Msg.isMsg(entries))
            graft.core.office.Msg.parse(entries).attachments.foreach { a =>
              spawnAtt(a, rootId, ord, 1); ord += 1
            }
          else if (graft.core.office.Msg.isLegacyDoc(entries))
            // legacy Office document: body text via routeKind; only
            // embedded OLE objects (ObjectPool) spawn as children
            entries.filter(_._1.startsWith("ObjectPool/")).foreach { case (n, b) =>
              spawnEntry(n, b, rootId, ord, 1); ord += 1
            }
          else entries.foreach { case (n, b) =>
            spawnEntry(n, b, rootId, ord, 1); ord += 1
          }
        case "eml" =>
          // mail attachments are entries of the message (RFC822Parser
          // semantics): filename as resource name; a zipped attachment
          // re-enters the archive recursion via spawnEntry's sniff
          graft.core.mail.Eml.parse(content).attachments.foreach { case (n, b) =>
            spawnEntry(n, Some(b), rootId, ord, 1); ord += 1
          }
        case "emlx" =>
          // same attachment explosion as eml, behind the length framing
          graft.core.mail.Eml.parseEmlx(content).attachments.foreach { case (n, b) =>
            spawnEntry(n, Some(b), rootId, ord, 1); ord += 1
          }
        case "mhtml" =>
          // page-save resources (images, stylesheets, scripts) are the
          // archive's entries, named by their Content-Location URL's last
          // segment; each is sniffed like any embedded file
          graft.core.mail.Mhtml.parse(content).parts.foreach { case (n, b) =>
            spawnEntry(n, Some(b), rootId, ord, 1); ord += 1
          }
        case "parquet" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (rows, total) = readParquetRows(bytes)
          ord = emitDumpRows(rows, total, rootId, ord, 1)
        case "avro" =>
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (rows, total) = readAvroRows(bytes)
          ord = emitDumpRows(rows, total, rootId, ord, 1)
        case "sqlite" =>
          // the database IS the parent document: one tabular child per
          // user table, blob cells sniffed and recursing below
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          ord = spawnSqliteTables(graft.core.db.Sqlite.tables(bytes,
            maxCells = dumpRowCap), rootId, ord, 1)
        case "plist" =>
          // the rendered path:value text is the parent's span (extractSpan
          // route); embedded NSData payloads spawn as sniffed children,
          // their dotted paths the resource names
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          graft.core.db.Plist.dataBlobs(graft.core.db.Plist.parse(bytes))
            .foreach { case (path, b) =>
              spawnEntry(path, Some(b), rootId, ord, 1); ord += 1
            }
        case "mbox" =>
          // each mailbox message is a document child carrying its parsed
          // RFC-822 body, attachments recursing — same shape as nested
          // eml; ids hash the raw message chunk
          graft.core.mail.Mbox.split(content).foreach { raw =>
            spawnMboxMessage(raw, rootId, ord, 1); ord += 1
          }
        case "tnef" =>
          // winmail.dat IS the message: body text on the root (routeKind),
          // attachments as sniffed children — same shape as eml
          graft.core.mail.Tnef.parseLatin1(content).attachments.foreach { a =>
            spawnAtt(a, rootId, ord, 1); ord += 1
          }
        case "applesingle" =>
          // the envelope is transport: the data fork IS the file, spawned
          // sniffed under the envelope's real name (RFC 1740 entry 3)
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val (aname, fork) = graft.sources.Apple.unwrap(bytes, cfg.maxSpanChars)
          spawnEntry(aname, fork, rootId, ord, 1); ord += 1
        case "one" =>
          // the section's paragraphs are the parent's span (extractSpan
          // route); embedded FileDataStoreObject payloads spawn as
          // sniffed children with ordinal resource names
          graft.core.office.OneNote.parseLatin1(content)._2.foreach { b =>
            spawnEntry(s"fileData_$ord", Some(b), rootId, ord, 1); ord += 1
          }
        case "pdf_bytes" =>
          // body text is the extractSpan route's; the page images (image
          // XObjects) spawn as media children — the reference's
          // `embedded:imageN` HTML children. Encrypted files spawn from
          // the silently-opened cleartext; password-protected ones
          // already classified and spawn nothing.
          val clear =
            if (graft.core.pdf.PdfMini.isEncryptedLatin1(content))
              graft.core.pdf.PdfCrypt.decryptEmptyUser(content)
            else Some(content)
          clear.foreach { c =>
            graft.core.pdf.PdfMini.imageXObjects(c).foreach { case (n, b) =>
              spawnEntry(n, Some(b), rootId, ord, 1); ord += 1
            }
          }
        case "pst" =>
          // the mailbox IS the parent document: folders, messages,
          // attachments, recovered and failed entries hang below it.
          // Top-level structural breakage (bad CRCs, truncation,
          // encryption) classifies through the job layer like any other
          // top-level parser failure
          val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          spawnPstNodes(graft.core.office.Pst.parse(bytes,
            graft.core.office.Pst.byteBudget(cfg.maxSpanChars)), rootId, 1)
        case _ => () // non-container kinds never reach here
      }
    }
    (out.result(), skipped)
  }
}
