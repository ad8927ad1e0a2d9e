package graft.core.office

import java.nio.charset.StandardCharsets.UTF_8

import graft.core.ParseFailure

/** EPUB e-books (IDPF EPUB 2/3 — the OCF/OPF package family the reference
  * parses via Tika's `EpubParser` behind `Extractor.java`'s
  * AutoDetectParser): a zip package whose stored `mimetype` entry is
  * exactly `application/epub+zip`. `META-INF/container.xml` names the OPF
  * package document; the OPF `<manifest>` maps item ids to hrefs (relative
  * to the OPF's directory) and the `<spine>` lists the READING order,
  * which is not the archive order. Body text is the `dc:title` plus the
  * spine-ordered XHTML chapters through the engine's HTML extractor;
  * manifest `image-typed` items spawn as embedded children like OOXML media
  * parts. Malformed packages (no container rootfile, no OPF entry, hrefs
  * escaping the package root) throw [[ParseFailure]] — the PACKAGE probe
  * classifies the whole document, same as OOXML.
  */
object Epub {

  val Mime = "application/epub+zip"

  /** EPUB detection VERIFIES the mimetype payload, like [[Odf.isOdf]]: a
    * generic zip that merely contains a file named `mimetype` keeps
    * exploding generically.
    */
  def isEpub(entries: Seq[(String, Option[Array[Byte]])]): Boolean =
    entries.exists { case (n, b) =>
      n == "mimetype" && b.exists(x => new String(x, UTF_8).trim == Mime)
    }

  /** Resolve an href against the OPF's directory with "../" normalization
    * ("OEBPS/pkg.opf" + "ch/a.xhtml" → "OEBPS/ch/a.xhtml"); an href that
    * escapes the package root is malformed input.
    */
  def resolve(opfPath: String, href: String): String = {
    val dir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i  => opfPath.substring(0, i)
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    (if (dir.isEmpty) href else dir + "/" + href).split('/').foreach {
      case "" | "." => ()
      case ".." =>
        if (parts.isEmpty) throw new ParseFailure("EPUB href escapes package root")
        else parts.remove(parts.length - 1): Unit
      case p => parts += p
    }
    parts.mkString("/")
  }

  /** Attribute substrings of every `<tag ...>` occurrence, with a
    * name-boundary check so scanning for `item` never matches `itemref`.
    */
  private def tagAttrs(xml: String, tag: String): Vector[String] = {
    val open = "<" + tag
    val out = Vector.newBuilder[String]
    var i = xml.indexOf(open)
    while (i >= 0) {
      val after = i + open.length
      val bounded = after >= xml.length || {
        val c = xml.charAt(after)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/' || c == '>'
      }
      if (bounded) {
        val gt = xml.indexOf('>', i)
        if (gt > i) out += xml.substring(after, gt)
      }
      i = xml.indexOf(open, i + 1)
    }
    out.result()
  }

  private def entryStr(entries: Seq[(String, Option[Array[Byte]])],
                       name: String): Option[String] =
    entries.collectFirst { case (n, Some(b)) if n == name => new String(b, UTF_8) }

  /** The `full-path` of the first `<rootfile>` in META-INF/container.xml. */
  private def rootfilePath(entries: Seq[(String, Option[Array[Byte]])]): String = {
    val container = entryStr(entries, "META-INF/container.xml")
      .getOrElse(throw new ParseFailure("EPUB without META-INF/container.xml"))
    tagAttrs(container, "rootfile")
      .map(a => Xlsx.attrVal(" " + a, "full-path"))
      .find(_.nonEmpty)
      .getOrElse(throw new ParseFailure("EPUB container.xml without a rootfile full-path"))
  }

  final case class Package(title: String, chapterPaths: Vector[String],
                           imagePaths: Vector[String])

  /** Parse the OPF named by the container: manifest id→(href, media-type),
    * spine idref order → resolved chapter paths; image-typed manifest items →
    * resolved image paths; dc:title text (first occurrence, unescaped).
    */
  def parsePackage(entries: Seq[(String, Option[Array[Byte]])]): Package = {
    val opfPath = rootfilePath(entries)
    val opf = entryStr(entries, opfPath)
      .getOrElse(throw new ParseFailure(s"EPUB rootfile '$opfPath' missing from package"))
    val items = tagAttrs(opf, "item").map { a =>
      val at = " " + a
      (Xlsx.attrVal(at, "id"), (Xlsx.attrVal(at, "href"), Xlsx.attrVal(at, "media-type")))
    }.filter(_._1.nonEmpty).toMap
    val spine = tagAttrs(opf, "itemref")
      .map(a => Xlsx.attrVal(" " + a, "idref")).filter(_.nonEmpty)
    val chapters = spine.flatMap(items.get).map {
      case (href, _) => resolve(opfPath, href)
    }
    val images = items.values.collect {
      case (href, mt) if mt.startsWith("image/") => resolve(opfPath, href)
    }.toVector.sorted
    val title = {
      val t = opf.indexOf("<dc:title")
      if (t < 0) ""
      else {
        val gt = opf.indexOf('>', t)
        val end = if (gt < 0) -1 else opf.indexOf("</dc:title", gt)
        if (gt < 0 || end < 0) "" else Docx.unescape(opf.substring(gt + 1, end).trim)
      }
    }
    Package(title, chapters, images)
  }

  /** Book text: title line plus the SPINE-ordered chapters, each through
    * the engine's HTML main-content extractor (the same semantics a
    * standalone .xhtml file gets), newline-joined. A spine entry whose
    * file is absent from the package contributes an empty line —
    * deterministic, never silently reordered.
    */
  def bookText(entries: Seq[(String, Option[Array[Byte]])]): String = {
    val pkg = parsePackage(entries)
    val chapterTexts = pkg.chapterPaths.map { p =>
      entryStr(entries, p) match {
        case Some(xhtml) => graft.core.html.HtmlExtractor.mainText(xhtml)
        case None        => ""
      }
    }
    (pkg.title +: chapterTexts).mkString("\n")
  }

  /** Resolved manifest image paths — the parts that spawn as embedded
    * children (the EPUB twin of [[Ooxml.isEmbeddedPart]]).
    */
  def imageSet(entries: Seq[(String, Option[Array[Byte]])]): Set[String] =
    parsePackage(entries).imagePaths.toSet

  /** Deterministic minimal EPUB (fixture writer, the package twin of
    * [[Docx.buildMinimal]]): OCF mimetype + container.xml + one OPF under
    * OEBPS/. The MANIFEST lists items in name-sorted order while the
    * SPINE keeps the given chapter order — so a reader that follows
    * archive or manifest order instead of the spine fails loudly.
    */
  def build(title: String, spineChapters: Seq[(String, String)],
            images: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    val opfPath = "OEBPS/package.opf"
    val hrefs = spineChapters.map { case (n, _) => (n, "application/xhtml+xml") } ++
      images.map { case (n, _) => (n, "image/png") }
    val idOf = hrefs.map(_._1).sorted.zipWithIndex.toMap
    val manifest = hrefs.sortBy(_._1).map { case (href, mt) =>
      s"""<item id="it${idOf(href)}" href="$href" media-type="$mt"/>"""
    }.mkString
    val spine = spineChapters
      .map { case (n, _) => s"""<itemref idref="it${idOf(n)}"/>""" }.mkString
    val opf =
      s"""<?xml version="1.0"?><package version="3.0" xmlns="http://www.idpf.org/2007/opf">""" +
        s"<metadata><dc:title>$title</dc:title></metadata>" +
        s"<manifest>$manifest</manifest><spine>$spine</spine></package>"
    val container =
      """<?xml version="1.0"?><container version="1.0">""" +
        """<rootfiles><rootfile full-path="OEBPS/package.opf"""" +
        """ media-type="application/oebps-package+xml"/></rootfiles></container>"""
    graft.sources.Archive.zipBytes(
      Seq(("mimetype", Mime.getBytes(UTF_8)),
        ("META-INF/container.xml", container.getBytes(UTF_8)),
        (opfPath, opf.getBytes(UTF_8))) ++
        spineChapters.map { case (n, html) => ("OEBPS/" + n, html.getBytes(UTF_8)) } ++
        images.map { case (n, b) => ("OEBPS/" + n, b) })
  }
}
