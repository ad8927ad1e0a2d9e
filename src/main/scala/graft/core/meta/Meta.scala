package graft.core.meta

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.Locale

/** Metadata normalization — the scalar-function layer.
  *
  * Ports the reference's semantics (not code) from
  * `spewer/MetadataTransformer.java` and `spewer/FieldNames.java:150-158`:
  * key normalization (lowercase, non-alphanumerics to '_',
  * `tika_metadata_` prefix) and the date-coercion cascade
  * (`MetadataTransformer.java:74-99,234-343`): typed ISO -> RFC-1123 ->
  * compact `yyyyMMddHHmmss` -> epoch sec/millis with digit-length and
  * plausible-year (1970..2100) gates. Failures degrade to None, never veto.
  */
object Meta {

  /** FieldNames.forMetadata semantics: lowercase, [^a-z0-9_] -> '_',
    * prefixed.
    */
  def normalizeKey(key: String): String =
    "tika_metadata_" + key.toLowerCase(Locale.ROOT).replaceAll("[^a-z0-9_]", "_")

  private val Rfc1123 =
    DateTimeFormatter.ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
  private val Compact14 = DateTimeFormatter.ofPattern("yyyyMMddHHmmss", Locale.US)
  private val CompactDate = DateTimeFormatter.ofPattern("yyyyMMdd", Locale.US)
  private val IsoLocal = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss", Locale.US)
  private val IsoOut = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'", Locale.US)

  /** Plausible-year gate for bare epoch numbers (1970..2100 inclusive),
    * matching the reference's guard against misreading compact dates as
    * epochs.
    */
  private val MaxEpochSec = 4133980800L // 2101-01-01T00:00:00Z

  /** The date cascade. Accepts: ISO-8601 instant / local datetime,
    * RFC-1123 (GMT), compact yyyyMMddHHmmss / yyyyMMdd, 10-digit epoch
    * seconds, 13-digit epoch millis. Returns UTC instant (second
    * precision) or None.
    */
  def parseDate(raw: String): Option[Instant] = {
    if (raw == null) return None
    val s = raw.trim.replaceAll("\\s+", " ") // asctime whitespace collapse
    if (s.isEmpty) return None
    if (s.forall(_.isDigit)) {
      s.length match {
        case 10 =>
          val v = s.toLong
          if (v < MaxEpochSec) Some(Instant.ofEpochSecond(v)) else None
        case 13 =>
          val v = s.toLong
          if (v / 1000 < MaxEpochSec) Some(Instant.ofEpochSecond(v / 1000)) else None
        case 14 => tryParse(LocalDateTime.parse(s, Compact14).toInstant(ZoneOffset.UTC))
        case 8 => tryParse(java.time.LocalDate.parse(s, CompactDate).atStartOfDay.toInstant(ZoneOffset.UTC))
        case _ => None
      }
    } else {
      tryParse(Instant.parse(s))
        .orElse(tryParse(LocalDateTime.parse(s, IsoLocal).toInstant(ZoneOffset.UTC)))
        .orElse(tryParse(LocalDateTime.parse(s, Rfc1123).toInstant(ZoneOffset.UTC)))
    }
  }

  private def tryParse(f: => Instant): Option[Instant] =
    try Some(f) catch { case _: Exception => None }

  /** Output convention: second-precision UTC ISO-8601 with 'Z'. */
  def toIso(i: Instant): String =
    IsoOut.format(LocalDateTime.ofInstant(i.truncatedTo(java.time.temporal.ChronoUnit.SECONDS), ZoneOffset.UTC))

  def parseToIso(raw: String): Option[String] = parseDate(raw).map(toIso)

  /** All-or-nothing ISO array (MetadataTransformer.toIso8601Array
    * semantics): every element must parse, else None.
    */
  def toIsoArray(values: Seq[String]): Option[Seq[String]] = {
    val parsed = values.map(parseToIso)
    if (parsed.forall(_.isDefined)) Some(parsed.map(_.get)) else None
  }

  /** Glob-style metadata block list (MetadataBlockList semantics,
    * `spewer/MetadataBlockList.java`): '*' matches any suffix/prefix
    * segment. Patterns are matched against the NORMALIZED key.
    */
  val DefaultBlockList: Seq[String] = Seq("tika_metadata_x_tika_*")

  def isBlocked(normKey: String, blockList: Seq[String] = DefaultBlockList): Boolean =
    blockList.exists { pat =>
      if (pat.endsWith("*")) normKey.startsWith(pat.dropRight(1))
      else if (pat.startsWith("*")) normKey.endsWith(pat.drop(1))
      else normKey == pat
    }

  // Fields whose multi-values are known-noisy and get distinct-ified
  // (MetadataTransformer.java:56-70 dedupe properties).
  val DedupedFields: Set[String] =
    Set("tika_metadata_content_type", "tika_metadata_author", "tika_metadata_title")

  /** Full multimap normalization (MetadataTransformer.normalize semantics):
    * normalize keys; on collision concatenate value lists (in input order);
    * dedupe values for the known-noisy fields; drop blocked keys. Returns
    * entries sorted by key for deterministic output.
    */
  def normalizeMap(meta: Seq[(String, Seq[String])],
                   blockList: Seq[String] = DefaultBlockList): Seq[(String, Seq[String])] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    meta.foreach { case (k, vs) =>
      val nk = normalizeKey(k)
      acc.update(nk, acc.getOrElse(nk, Vector.empty) ++ vs)
    }
    acc.iterator
      .filterNot { case (k, _) => isBlocked(k, blockList) }
      .map { case (k, vs) => (k, if (DedupedFields.contains(k)) vs.distinct else vs) }
      .toVector.sortBy(_._1)
  }

  // Formatters used by the corpus synthesis (and mirrored in the oracle).
  def formatRfc1123(epochSec: Long): String =
    Rfc1123.format(LocalDateTime.ofInstant(Instant.ofEpochSecond(epochSec), ZoneOffset.UTC))
  def formatCompact14(epochSec: Long): String =
    Compact14.format(LocalDateTime.ofInstant(Instant.ofEpochSecond(epochSec), ZoneOffset.UTC))
}
