package graft.core

/** Data model for the extraction engine.
  *
  * Mirrors the reference's document abstraction (ICIJ/extract
  * `TikaDocument.java:16` — path/id/metadata/embeds/reader) re-expressed as
  * flat Spark rows per BASELINE.json input_hint:
  * `(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`.
  */
final case class SpanIn(
    kind: String,
    text: String,
    media_ref: String, // "" when absent (kept non-null for stable hashing)
    offset: Int
)

/** spans is an Array: the Catalyst deserializer materializes arrays ~1.5x
  * faster than Seq builders, and deserialization — not extraction — is the
  * pipeline's throughput ceiling (see BENCH.md). Note Array gives reference
  * equality in case classes; compare spans via .toSeq in tests.
  */
final case class DocIn(doc_id: Long, spans: Array[SpanIn])

/** Output span: `order` is the dense emission index in input-offset order —
  * the reference's positional ordering invariant (DFS tree order / span
  * offset order, SURVEY §2.13; `PageIndicesContentHandler.java:101-123`).
  */
final case class SpanOut(
    kind: String,
    text: String,
    media_ref: String,
    order: Int
)

/** One extracted document (root or embedded child).
  *
  * parent/root/level mirror the reference's flattened tree encoding
  * (`SolrSpewer.java:320-329`, FieldNames extract_parent_id/extract_root/
  * extract_level). Ids of embedded children are content-derived per
  * `DigestIdentifier.java:26-68` (see [[Ids.embedId]]).
  */
final case class DocOut(
    doc_id: String,
    parent_id: String, // "" for roots
    root_id: String,
    level: Int,
    spans: Array[SpanOut],
    no_content_reason: String // "" when content present (NoContentReason.java:13-37)
)

/** Lineage row — the resume/report surface (reference `ReportMap` +
  * `ExtractionStatus.java:11-20` + `ExtractionProgress.java:7-54`).
  */
final case class LineageRow(
    doc_id: Long,
    partition_id: Int,
    status: String,
    error: String,
    n_spans_in: Int,
    n_spans_out: Int,
    bytes_in: Long,
    docs_per_sec: Double,
    bytes_per_sec: Double
)

object Status {
  // Exact enum values of reference ExtractionStatus.java:11-20.
  val Success = "SUCCESS"
  val NotFound = "FAILURE_NOT_FOUND"
  val Unreadable = "FAILURE_UNREADABLE"
  val NotDecrypted = "FAILURE_NOT_DECRYPTED"
  val NotParsed = "FAILURE_NOT_PARSED"
  val Unknown = "FAILURE_UNKNOWN"
  val NotSaved = "FAILURE_NOT_SAVED"
  val Fatal = "FAILURE_FATAL"
  val Timeout = "FAILURE_TIMEOUT"
  /** Terminal statuses skipped on resume (Reporter.java:120-135). */
  val terminal: Set[String] = Set(Success, Timeout, Fatal)
}

object Reason {
  // NoContentReason.java:13-21 values we use.
  val Unsupported = "unsupported-media-type"
  val Empty = "empty-file"
  val Encrypted = "encrypted"
  /** Per-entry parse isolation (a corrupt PST message, an unreadable
    * nested container): the child exists with no content, the parent
    * survives — the reference's resilient-parser semantics.
    */
  val ParseFailed = "parse-failure"
}

/** Typed extraction failures — the producing side of the status taxonomy
  * (`ExtractionStatus.java:11-20`; classification per `Extractor.java:
  * 785-826`). Parsers throw these; [[graft.pipeline.ExtractJob.classify]]
  * maps them to lineage statuses. VM errors are NOT wrapped — they escape to
  * Spark's retry/blacklist machinery (the FATAL escalation path).
  */
final class ParseFailure(msg: String) extends RuntimeException(msg)
/** Content that is ENCRYPTED rather than malformed (password-protected
  * PST, crypt methods this engine does not implement): classified
  * FAILURE_NOT_DECRYPTED, the reference's EncryptedDocumentException
  * route — distinct from NOT_PARSED corruption.
  */
final class DecryptFailure(msg: String) extends RuntimeException(msg)
final class PayloadMissing(msg: String) extends RuntimeException(msg)
final class PayloadUnreadable(msg: String) extends java.io.IOException(msg)

/** Per-document deadline exceeded — the reference's parse-timeout watchdog
  * (`Extractor.java:620-648`), cooperative: raised at span/embed boundaries
  * like the reference's embed-boundary aborts (`EmbedSpawner.java:353-356`).
  */
final class ExtractTimeout(msg: String) extends RuntimeException(msg)
