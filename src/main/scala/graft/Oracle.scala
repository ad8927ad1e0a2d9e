package graft

/** DuckDB oracle SQL: for each query in [[Queries.all]], SQL that
  * independently recomputes the expected output from the raw parquet tables
  * (registered as views named documents/embeddings/events/lineitem/...).
  *
  * Conventions keeping the comparison engine-agnostic:
  *  - every count/int column cast to BIGINT;
  *  - no floating-point aggregates: money as floor(x*100) cents, cosines
  *    over integer-quantized vectors (sum/sqrt/divide of exact ints is
  *    IEEE-correctly-rounded and thus bit-identical across engines);
  *  - lowercase-hex md5/sha256 shared by both engines.
  */
object Oracle {

  /** DuckDB expression converting the first 8 hex chars held by column/expr
    * `h8` to a BIGINT in [0, 2^32).
    */
  private def hex2int(h8: String): String =
    (0 until 8).map { i =>
      val w = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef',substr($h8,${i + 1},1))::BIGINT-1)*$w"
    }.mkString("(", "+", ")")

  /** Length-prefixed embed-id field (mirror of Ids.lenc): utf8-byte length,
    * ':' separator, raw value. sha256 hex fields are always 64 bytes.
    */
  private def lencSql(x: String): String = s"octet_length(encode($x))||':'||$x"

  /** Shared prelude: per-document word split and third-points, matching
    * Corpus.splitPoints.
    */
  private val docParts: String =
    """WITH p AS (
      |  SELECT doc_id, string_split(text,' ') AS w, len(string_split(text,' ')) AS m,
      |         len(string_split(text,' '))//3 AS i1, (2*len(string_split(text,' ')))//3 AS i2
      |  FROM documents
      |)""".stripMargin

  /** documents plus the injected duplicates (Dedup.withInjectedDups). */
  private val dupDocs: String =
    """(SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id+1000000, text FROM documents WHERE doc_id<100)""".stripMargin

  private val extractSpans: String =
    s"""$docParts
       |SELECT doc_id, 0 AS ord, 'html' AS kind,
       |       'title '||doc_id||
       |         CASE WHEN i1>0 THEN chr(10)||array_to_string(w[1:i1],' ') ELSE '' END AS text,
       |       '' AS media_ref FROM p
       |UNION ALL SELECT doc_id, 1, 'text', array_to_string(w[i1+1:i2],' '), '' FROM p
       |UNION ALL SELECT doc_id, 2, 'pdf', array_to_string(w[i2+1:m],' '), '' FROM p
       |UNION ALL SELECT doc_id, 3, 'media',
       |       CASE WHEN doc_id%21=0 THEN ''
       |            WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
       |            ELSE 'ocr '||doc_id END,
       |       'art/'||substr(sha256(doc_id::VARCHAR),1,2)||'/'||sha256(doc_id::VARCHAR)
       |       FROM p WHERE doc_id%3=0
       |UNION ALL SELECT doc_id, CASE WHEN doc_id%3=0 THEN 4 ELSE 3 END, 'bin', '', ''
       |       FROM p WHERE doc_id%13=0""".stripMargin

  /** Mirror of Queries.pageRangeQ: the extract-spans oracle windowed to
    * span orders 1..2 on the %5 docs.
    */
  private lazy val pageRange: String =
    s"SELECT * FROM ($extractSpans) t WHERE doc_id%5=0 AND ord >= 1 AND ord <= 2"

  private val embedExplode: String =
    """WITH r AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid FROM documents),
      |c1 AS (SELECT doc_id, rid,
      |  CASE WHEN doc_id%21=0 THEN ''
      |       WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
      |       ELSE 'ocr '||doc_id END AS content
      | FROM r WHERE doc_id%3=0),
      |l1 AS (SELECT doc_id, rid,
      |  sha256(CASE WHEN content='' THEN '0:' ELSE '64:'||sha256(content) END
      |    ||'64:'||rid||'1:0'||'0:'||'0:') AS cid
      | FROM c1)
      |SELECT rid AS doc_id, '' AS parent_id, rid AS root_id, 0 AS level FROM r
      |UNION ALL SELECT cid, rid, rid, 1 FROM l1
      |UNION ALL
      |SELECT sha256('64:'||sha256('chain:sub '||doc_id)||'64:'||cid||'1:0'||'0:'||'0:'), cid, rid, 2
      |FROM l1 WHERE doc_id%27=0 AND doc_id%21<>0""".stripMargin

  /** Mirror of Queries.zipExplode: every node id recomputed from documents
    * arithmetic — text entries as sha256 of content, the nested container
    * over its canonical (length-prefixed) entry sequence.
    */
  private val zipExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%4=0),
      |n AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('5:c.txt'||octet_length(encode('gamma '||doc_id))||':gamma '||doc_id)
      |    ||'64:'||rid||'1:3'||'0:'||'10:nested.zip') AS nzid
      | FROM z WHERE doc_id%16=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('alpha '||doc_id)||'64:'||rid||'1:0'||'0:'||'5:a.txt'),
      |  rid, 1, 'alpha '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('beta '||doc_id)||'64:'||rid||'1:1'||'0:'||'5:b.txt'),
      |  rid, 1, 'beta '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('alpha '||doc_id)||'64:'||rid||'1:2'||'0:'||'7:dup.txt'),
      |  rid, 1, 'alpha '||doc_id, '' FROM z WHERE doc_id%8=0
      |UNION ALL SELECT doc_id, nzid, rid, 1, '', 'empty-file' FROM n
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('gamma '||doc_id)||'64:'||nzid||'1:0'||'0:'||'5:c.txt'),
      |  nzid, 2, 'gamma '||doc_id, '' FROM n""".stripMargin

  /** Mirror of Queries.zstdExplode: zstd member child at ordinal 0; the
    * %66 bzip2-wrapped zip is a container child at ordinal 1 with its
    * entry below it.
    */
  private val zstdExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%33=0),
      |n AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('5:z.txt'||octet_length(encode('inner '||doc_id))||':inner '||doc_id)
      |    ||'64:'||rid||'1:1'||'0:'||'0:') AS nz
      | FROM z WHERE doc_id%66=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('zst '||doc_id)||'64:'||rid||'1:0'||'0:'||'0:'),
      |  rid, 1, 'zst '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id, nz, rid, 1, '', 'empty-file' FROM n
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('inner '||doc_id)||'64:'||nz||'1:0'||'0:'||'5:z.txt'),
      |  nz, 2, 'inner '||doc_id, '' FROM n""".stripMargin

  /** Mirror of Queries.warcExplode: the html response child's id hashes
    * the FULL page bytes (the htmlWrap template recomputed in SQL), its
    * text the boilerplate-stripped title+content; the %70 resource record
    * is a sibling text child.
    */
  private val warcExplode: String = {
    val a = """trim('warc body '||array_to_string(string_split(text,' ')[1:5],' '))"""
    val page =
      """'<html><head><title>doc '||doc_id||'</title><style>.x{color:red}</style></head><body>'||
        |'<div id="nav"><ul><li><a href="/home">home</a></li><li><a href="/about">about</a></li><li><a href="/contact">contact</a></li></ul></div>'||
        |'<div id="main"><h1>title '||doc_id||'</h1><p>'||a||'</p></div>'||
        |'<div id="footer"><p><a href="/privacy">privacy</a> <a href="/terms">terms of use</a></p></div>'||
        |'<script>var x=1;</script></body></html>'""".stripMargin
    s"""WITH z AS (SELECT doc_id, $a AS a, sha256(doc_id::VARCHAR) AS rid
       |           FROM documents WHERE doc_id%35=0),
       |p AS (SELECT doc_id, a, rid, $page AS page FROM z)
       |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
       |       'empty-file' AS reason FROM p
       |UNION ALL SELECT doc_id,
       |  sha256('64:'||sha256(page)||'64:'||rid||'1:0'||'0:'
       |    ||octet_length(encode('http://ex.com/'||doc_id))||':http://ex.com/'||doc_id),
       |  rid, 1, 'title '||doc_id||chr(10)||a, '' FROM p
       |UNION ALL SELECT doc_id,
       |  sha256('64:'||sha256('payload '||doc_id)||'64:'||rid||'1:1'||'0:'
       |    ||octet_length(encode('http://ex.com/'||doc_id||'/t'))||':http://ex.com/'||doc_id||'/t'),
       |  rid, 1, 'payload '||doc_id, '' FROM p WHERE doc_id%70=0""".stripMargin
  }

  /** Mirror of Queries.jsonlExplode: ids hash the TRIMMED lines (the
    * engine's CRLF/indent-insensitive identity; fixture lines carry no
    * surrounding whitespace, so the literals below ARE the trimmed forms);
    * the decoy
    * nested text key never surfaces, escapes decode, the text-less line
    * is an empty child. (Backslashes are literal in SQL strings, so the
    * escaped-quote line reproduces exactly.)
    */
  private val jsonlExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%39=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('{"text": "line one '||doc_id||'", "meta": {"text": "decoy"}}')
      |    ||'64:'||rid||'1:0'||'0:'||'0:'),
      |  rid, 1, 'line one '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('{"text": "escaped \"quote\" '||doc_id||'"}')
      |    ||'64:'||rid||'1:1'||'0:'||'0:'),
      |  rid, 1, 'escaped "quote" '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('{"id": 7}')||'64:'||rid||'1:2'||'0:'||'0:'),
      |  rid, 1, '', 'empty-file' FROM z""".stripMargin

  /** Mirror of Queries.sevenZExplode: same node shape as cfbExplode —
    * empty root, two sniffed text entries in archive order, the %90
    * nested-zip container child with its entry below.
    */
  private val sevenZExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%45=0),
      |n AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('5:c.txt'||octet_length(encode('gamma '||doc_id))||':gamma '||doc_id)
      |    ||'64:'||rid||'1:2'||'0:'||'7:ccc.zip') AS nzid
      | FROM z WHERE doc_id%90=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('alpha '||doc_id)||'64:'||rid||'1:0'||'0:'||'5:a.txt'),
      |  rid, 1, 'alpha '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('beta '||doc_id)||'64:'||rid||'1:1'||'0:'||'6:bb.txt'),
      |  rid, 1, 'beta '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id, nzid, rid, 1, '', 'empty-file' FROM n
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('gamma '||doc_id)||'64:'||nzid||'1:0'||'0:'||'5:c.txt'),
      |  nzid, 2, 'gamma '||doc_id, '' FROM n""".stripMargin

  /** Mirror of Queries.arExplode: member files in archive order; the %126
    * nested gzip member is a container child (canonical over its single
    * decompressed (FNAME, text) entry) with the document below it.
    */
  private val arExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%63=0),
      |g AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('9:inner.txt'||octet_length(encode('inner '||doc_id))||':inner '||doc_id)
      |    ||'64:'||rid||'1:2'||'0:'||'8:inner.gz') AS gzid
      | FROM z WHERE doc_id%126=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('2.0'||chr(10))||'64:'||rid||'1:0'||'0:'||'13:debian-binary'),
      |  rid, 1, '2.0'||chr(10), '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('ar note '||doc_id)||'64:'||rid||'1:1'||'0:'||'10:readme.txt'),
      |  rid, 1, 'ar note '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id, gzid, rid, 1, '', 'empty-file' FROM g
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('inner '||doc_id)||'64:'||gzid||'1:0'||'0:'||'9:inner.txt'),
      |  gzid, 2, 'inner '||doc_id, '' FROM g""".stripMargin

  /** Mirror of Queries.cpioExplode: regular-file records in stream order
    * with their full path names.
    */
  private val cpioExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%77=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('motd '||doc_id)||'64:'||rid||'1:0'||'0:'||'8:etc/motd'),
      |  rid, 1, 'motd '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('doc '||doc_id)||'64:'||rid||'1:1'||'0:'||'13:usr/share/doc'),
      |  rid, 1, 'doc '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.isoExplode: the image is an empty container node,
    * its files path-named children (Joliet variants yield identical
    * children — same content, same names, same ordinals).
    */
  private val isoExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%51=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('iso note '||doc_id)||'64:'||rid||'1:0'||'0:'||'10:README.TXT'),
      |  rid, 1, 'iso note '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('deep '||doc_id)||'64:'||rid||'1:1'||'0:'||'13:DOCS/DEEP.TXT'),
      |  rid, 1, 'deep '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.chmExplode: directory-sorted path-named children
    * out of the LZX-compressed section.
    */
  private val chmExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%61=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('chm note '||doc_id)||'64:'||rid||'1:0'||'0:'||'9:intro.txt'),
      |  rid, 1, 'chm note '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('deep '||doc_id)||'64:'||rid||'1:1'||'0:'||'14:topic/deep.txt'),
      |  rid, 1, 'deep '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.cabExplode: CFFILE-ordered children sliced out of
    * the MSZIP folder stream.
    */
  private val cabExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%83=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('cab note '||doc_id)||'64:'||rid||'1:0'||'0:'||'10:readme.txt'),
      |  rid, 1, 'cab note '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('deep '||doc_id)||'64:'||rid||'1:1'||'0:'||'15:sub/payload.txt'),
      |  rid, 1, 'deep '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.rpmExplode: the flattened package — payload
    * framing (gzip+cpio) never appears, the files are direct children.
    */
  private val rpmExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%85=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('tool '||doc_id)||'64:'||rid||'1:0'||'0:'||'8:bin/tool'),
      |  rid, 1, 'tool '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('conf '||doc_id)||'64:'||rid||'1:1'||'0:'||'8:etc/conf'),
      |  rid, 1, 'conf '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.msgExplode: the .msg root carries the document text
    * as its body; the %18 file attachment and %27 nested message are
    * level-1 children whose ids recompute over the message's LOGICAL
    * canonical fields (length-prefixed (field, value) pairs — no UTF-16
    * or CFB framing in the preimage, by design).
    */
  private val msgExplode: String =
    """WITH z AS (SELECT doc_id, text, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%9=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, text AS txt,
      |       CASE WHEN text='' THEN 'empty-file' ELSE '' END AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('att '||doc_id)||'64:'||rid||'1:0'||'0:'
      |    ||octet_length(encode('att_'||doc_id||'.txt'))||':att_'||doc_id||'.txt'),
      |  rid, 1, 'att '||doc_id, '' FROM z WHERE doc_id%18=0
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('re '||doc_id))||':re '||doc_id
      |      ||'4:from'||octet_length(encode('nested '||doc_id))||':nested '||doc_id
      |      ||'4:body'||octet_length(encode('nested body '||doc_id))||':nested body '||doc_id)
      |    ||'64:'||rid||'1:'||CASE WHEN doc_id%18=0 THEN 1 ELSE 0 END||'0:'
      |    ||octet_length(encode('re '||doc_id))||':re '||doc_id),
      |  rid, 1, 'nested body '||doc_id, '' FROM z WHERE doc_id%27=0""".stripMargin

  /** Mirror of Queries.pstExplode: the PST root container, the folder
    * container nodes (box ord 0, %99 crash ord 1, [recovered] after), the
    * box message at ord 1 (after the deep subfolder at ord 0), the %66
    * attachment-bearing message and its child, the deep-folder message,
    * the recovered unlinked message, and the %99 corrupt message's
    * content-less parse-failure child. Message ids recompute over the SAME
    * logical canonical fields as msgExplode — id parity between a message
    * inside a .pst and the same message as a .msg is by construction.
    */
  private val pstExplode: String =
    """WITH z AS (SELECT doc_id, text, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%33=0),
      |g AS (SELECT doc_id, text, rid,
      |  sha256('64:'||sha256('box')||'64:'||rid||'1:0'||'0:'||'3:box') AS boxid,
      |  sha256('64:'||sha256('crash')||'64:'||rid||'1:1'||'0:'||'5:crash') AS crashid,
      |  sha256('64:'||sha256('[recovered]')||'64:'||rid||'1:'
      |    ||CASE WHEN doc_id%99=0 THEN 2 ELSE 1 END||'0:'||'11:[recovered]') AS recid
      | FROM z),
      |h AS (SELECT *,
      |  sha256('64:'||sha256('deep')||'64:'||boxid||'1:0'||'0:'||'4:deep') AS deepid
      | FROM g),
      |r AS (SELECT *,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('rich '||doc_id))||':rich '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('rich body '||doc_id))||':rich body '||doc_id
      |      ||octet_length(encode('a'||doc_id||'.txt'))||':a'||doc_id||'.txt'
      |      ||octet_length(encode('att '||doc_id))||':att '||doc_id)
      |    ||'64:'||boxid||'1:2'||'0:'
      |    ||octet_length(encode('rich '||doc_id))||':rich '||doc_id) AS richid
      | FROM h WHERE doc_id%66=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM h
      |UNION ALL SELECT doc_id, boxid, rid, 1, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id, crashid, rid, 1, '', 'empty-file' FROM h WHERE doc_id%99=0
      |UNION ALL SELECT doc_id, recid, rid, 1, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id, deepid, boxid, 2, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('m '||doc_id))||':m '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode(text))||':'||text)
      |    ||'64:'||boxid||'1:1'||'0:'||octet_length(encode('m '||doc_id))||':m '||doc_id),
      |  boxid, 2, text, CASE WHEN text='' THEN 'empty-file' ELSE '' END FROM h
      |UNION ALL SELECT doc_id, richid, boxid, 2, 'rich body '||doc_id, '' FROM r
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('att '||doc_id)||'64:'||richid||'1:0'||'0:'
      |    ||octet_length(encode('a'||doc_id||'.txt'))||':a'||doc_id||'.txt'),
      |  richid, 3, 'att '||doc_id, '' FROM r
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('deep '||doc_id))||':deep '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('deep body '||doc_id))||':deep body '||doc_id)
      |    ||'64:'||deepid||'1:0'||'0:'||octet_length(encode('deep '||doc_id))||':deep '||doc_id),
      |  deepid, 3, 'deep body '||doc_id, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('lost '||doc_id))||':lost '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('orphan '||doc_id))||':orphan '||doc_id)
      |    ||'64:'||recid||'1:0'||'0:'||octet_length(encode('lost '||doc_id))||':lost '||doc_id),
      |  recid, 2, 'orphan '||doc_id, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('0:'||'64:'||crashid||'1:0'||'0:'||'0:'),
      |  crashid, 2, '', 'parse-failure' FROM h WHERE doc_id%99=0""".stripMargin

  /** Mirror of Queries.ostExplode: the pstExplode tree PLUS the "big"
    * message (box ordinal after m/rich), its multi-block attachment child
    * (text recomputed via repeat()), and the %99 truncated attachment as
    * a named content-less parse-failure stub at ordinal 1. Ids recompute
    * over the same logical canonical fields — container-format parity by
    * construction.
    */
  private val ostExplode: String =
    """WITH z AS (SELECT doc_id, text, sha256(doc_id::VARCHAR) AS rid,
      |  repeat('ost big '||doc_id||' ', 2000) AS bt
      |           FROM documents WHERE doc_id%33=0),
      |g AS (SELECT doc_id, text, rid, bt,
      |  sha256('64:'||sha256('box')||'64:'||rid||'1:0'||'0:'||'3:box') AS boxid,
      |  sha256('64:'||sha256('crash')||'64:'||rid||'1:1'||'0:'||'5:crash') AS crashid,
      |  sha256('64:'||sha256('[recovered]')||'64:'||rid||'1:'
      |    ||CASE WHEN doc_id%99=0 THEN 2 ELSE 1 END||'0:'||'11:[recovered]') AS recid
      | FROM z),
      |h AS (SELECT *,
      |  sha256('64:'||sha256('deep')||'64:'||boxid||'1:0'||'0:'||'4:deep') AS deepid,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('big '||doc_id))||':big '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('big body '||doc_id))||':big body '||doc_id
      |      ||octet_length(encode('b'||doc_id||'.bin'))||':b'||doc_id||'.bin'
      |      ||octet_length(encode(bt))||':'||bt
      |      ||CASE WHEN doc_id%99=0
      |             THEN octet_length(encode('t'||doc_id||'.bin'))||':t'||doc_id||'.bin'||'0:'
      |             ELSE '' END)
      |    ||'64:'||boxid||'1:'||CASE WHEN doc_id%66=0 THEN 3 ELSE 2 END||'0:'
      |    ||octet_length(encode('big '||doc_id))||':big '||doc_id) AS bigid
      | FROM g),
      |r AS (SELECT *,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('rich '||doc_id))||':rich '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('rich body '||doc_id))||':rich body '||doc_id
      |      ||octet_length(encode('a'||doc_id||'.txt'))||':a'||doc_id||'.txt'
      |      ||octet_length(encode('att '||doc_id))||':att '||doc_id)
      |    ||'64:'||boxid||'1:2'||'0:'
      |    ||octet_length(encode('rich '||doc_id))||':rich '||doc_id) AS richid
      | FROM h WHERE doc_id%66=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM h
      |UNION ALL SELECT doc_id, boxid, rid, 1, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id, crashid, rid, 1, '', 'empty-file' FROM h WHERE doc_id%99=0
      |UNION ALL SELECT doc_id, recid, rid, 1, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id, deepid, boxid, 2, '', 'empty-file' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('m '||doc_id))||':m '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode(text))||':'||text)
      |    ||'64:'||boxid||'1:1'||'0:'||octet_length(encode('m '||doc_id))||':m '||doc_id),
      |  boxid, 2, text, CASE WHEN text='' THEN 'empty-file' ELSE '' END FROM h
      |UNION ALL SELECT doc_id, richid, boxid, 2, 'rich body '||doc_id, '' FROM r
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('att '||doc_id)||'64:'||richid||'1:0'||'0:'
      |    ||octet_length(encode('a'||doc_id||'.txt'))||':a'||doc_id||'.txt'),
      |  richid, 3, 'att '||doc_id, '' FROM r
      |UNION ALL SELECT doc_id, bigid, boxid, 2, 'big body '||doc_id, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256(bt)||'64:'||bigid||'1:0'||'0:'
      |    ||octet_length(encode('b'||doc_id||'.bin'))||':b'||doc_id||'.bin'),
      |  bigid, 3, bt, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('0:'||'64:'||bigid||'1:1'||'0:'
      |    ||octet_length(encode('t'||doc_id||'.bin'))||':t'||doc_id||'.bin'),
      |  bigid, 3, '', 'parse-failure' FROM h WHERE doc_id%99=0
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('deep '||doc_id))||':deep '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('deep body '||doc_id))||':deep body '||doc_id)
      |    ||'64:'||deepid||'1:0'||'0:'||octet_length(encode('deep '||doc_id))||':deep '||doc_id),
      |  deepid, 3, 'deep body '||doc_id, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('7:subject'||octet_length(encode('lost '||doc_id))||':lost '||doc_id
      |      ||'4:from'||'0:'||'4:body'||octet_length(encode('orphan '||doc_id))||':orphan '||doc_id)
      |    ||'64:'||recid||'1:0'||'0:'||octet_length(encode('lost '||doc_id))||':lost '||doc_id),
      |  recid, 2, 'orphan '||doc_id, '' FROM h
      |UNION ALL SELECT doc_id,
      |  sha256('0:'||'64:'||crashid||'1:0'||'0:'||'0:'),
      |  crashid, 2, '', 'parse-failure' FROM h WHERE doc_id%99=0""".stripMargin

  /** Mirror of Queries.ostReconcile: pstReconcile's arithmetic plus the
    * big message (one more declared+extracted everywhere) and the %99
    * truncated-attachment stub count.
    */
  private val ostReconcile: String =
    """SELECT doc_id,
      | (2 + CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_folders,
      | (4 + CASE WHEN doc_id%66=0 THEN 1 ELSE 0 END
      |     + CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_declared,
      | (3 + CASE WHEN doc_id%66=0 THEN 1 ELSE 0 END)::BIGINT AS n_extracted,
      | 1::BIGINT AS n_recovered,
      | (CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_failed,
      | (CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_att_stubs
      |FROM documents WHERE doc_id%33=0""".stripMargin

  /** Mirror of Queries.tnefExplode: the TNEF root carries the document
    * text as its body; the single file attachment recomputes like an eml
    * attachment child (content hash + root + ordinal + resource name).
    */
  private val tnefExplode: String =
    """WITH z AS (SELECT doc_id, text, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%29=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, text AS txt,
      |       CASE WHEN text='' THEN 'empty-file' ELSE '' END AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('watt '||doc_id)||'64:'||rid||'1:0'||'0:'
      |    ||octet_length(encode('w'||doc_id||'.txt'))||':w'||doc_id||'.txt'),
      |  rid, 1, 'watt '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.mboxExplode: postmark-split chunks rebuilt
    * byte-exactly (chr(10) joins; DuckDB base64 = the no-wrap encoder),
    * message ids over the raw chunks, the attachment like an eml child.
    */
  private val mboxExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |  'Subject: s1'||chr(10)||chr(10)||'mb one '||doc_id AS ch1,
      |  'Subject: s2'||chr(10)||'MIME-Version: 1.0'||chr(10)
      |    ||'Content-Type: multipart/mixed; boundary=BB'||chr(10)||chr(10)
      |    ||'--BB'||chr(10)||'Content-Type: text/plain'||chr(10)||chr(10)
      |    ||'mb two '||doc_id||chr(10)||'--BB'||chr(10)
      |    ||'Content-Type: application/octet-stream'||chr(10)
      |    ||'Content-Transfer-Encoding: base64'||chr(10)
      |    ||'Content-Disposition: attachment; filename="m.txt"'||chr(10)||chr(10)
      |    ||base64(encode('matt '||doc_id))||chr(10)||'--BB--' AS ch2
      | FROM documents WHERE doc_id%41=0),
      |c AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256(ch1)||'64:'||rid||'1:0'||'0:'||'0:') AS c1,
      |  sha256('64:'||sha256(ch2)||'64:'||rid||'1:1'||'0:'||'0:') AS c2
      | FROM z)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM c
      |UNION ALL SELECT doc_id, c1, rid, 1, 'mb one '||doc_id, '' FROM c
      |UNION ALL SELECT doc_id, c2, rid, 1, 'mb two '||doc_id, '' FROM c
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('matt '||doc_id)||'64:'||c2||'1:0'||'0:'||'5:m.txt'),
      |  c2, 2, 'matt '||doc_id, '' FROM c""".stripMargin

  /** Mirror of Queries.parquetExplode: per-row children with the jsonl
    * identity convention (content hash of the row text; a NULL row is a
    * content-less empty child).
    */
  private val parquetExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%47=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('pr one '||doc_id)||'64:'||rid||'1:0'||'0:'||'0:'),
      |  rid, 1, 'pr one '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('0:'||'64:'||rid||'1:1'||'0:'||'0:'),
      |  rid, 1, '', 'empty-file' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('pr two '||doc_id)||'64:'||rid||'1:2'||'0:'||'0:'),
      |  rid, 1, 'pr two '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.avroExplode: identical shape to parquetExplode
    * (the dump-row identity convention is format-independent).
    */
  private val avroExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%53=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('av one '||doc_id)||'64:'||rid||'1:0'||'0:'||'0:'),
      |  rid, 1, 'av one '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('0:'||'64:'||rid||'1:1'||'0:'||'0:'),
      |  rid, 1, '', 'empty-file' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('av two '||doc_id)||'64:'||rid||'1:2'||'0:'||'0:'),
      |  rid, 1, 'av two '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.contactText: the unfolded, unescaped, filtered
    * property values in card/component order.
    */
  private val contactText: String =
    """SELECT doc_id,
      |  'Person '||doc_id||chr(10)||'Org, Inc '||doc_id||chr(10)
      |    ||'p'||doc_id||'@example.org'||chr(10)||'note one'||chr(10)||'note two' AS vcf_txt,
      |  'Standup '||doc_id||chr(10)||'Room '||doc_id||chr(10)||'daily sync' AS ics_txt
      |FROM documents WHERE doc_id%31=0""".stripMargin

  /** Mirror of Queries.pstReconcile: declared-vs-extracted arithmetic
    * recomputed from the fixture's %66/%99 structure.
    */
  private val pstReconcile: String =
    """SELECT doc_id,
      | (2 + CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_folders,
      | (3 + CASE WHEN doc_id%66=0 THEN 1 ELSE 0 END
      |     + CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_declared,
      | (2 + CASE WHEN doc_id%66=0 THEN 1 ELSE 0 END)::BIGINT AS n_extracted,
      | 1::BIGINT AS n_recovered,
      | (CASE WHEN doc_id%99=0 THEN 1 ELSE 0 END)::BIGINT AS n_failed
      |FROM documents WHERE doc_id%33=0""".stripMargin

  /** Mirror of Queries.cfbExplode: generic compound-file container — the
    * empty root, two sniffed text streams in CFB name order, and the %26
    * nested-zip stream recomputed like zipExplode's container child.
    */
  private val cfbExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%13=0),
      |n AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('5:c.txt'||octet_length(encode('gamma '||doc_id))||':gamma '||doc_id)
      |    ||'64:'||rid||'1:2'||'0:'||'7:ccc.zip') AS nzid
      | FROM z WHERE doc_id%26=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('alpha '||doc_id)||'64:'||rid||'1:0'||'0:'||'5:a.txt'),
      |  rid, 1, 'alpha '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('beta '||doc_id)||'64:'||rid||'1:1'||'0:'||'6:bb.txt'),
      |  rid, 1, 'beta '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id, nzid, rid, 1, '', 'empty-file' FROM n
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('gamma '||doc_id)||'64:'||nzid||'1:0'||'0:'||'5:c.txt'),
      |  nzid, 2, 'gamma '||doc_id, '' FROM n""".stripMargin

  /** Mirror of Queries.docxMedia: the decoded PNG fields recomputed
    * arithmetically (the engine's side must unzip + ImageIO-decode to
    * reproduce these values from real bytes).
    */
  private val docxMedia: String =
    """SELECT doc_id,
      | (2 + doc_id%3)::BIGINT AS width,
      | (3 + doc_id%2)::BIGINT AS height,
      | ((doc_id%250)*1000 + 7)::BIGINT AS rgb,
      | 1::BIGINT AS n_children
      |FROM documents WHERE doc_id%12=0""".stripMargin

  /** Mirror of Queries.qualityC4: the construction arithmetic — 5-word
    * groups, terminal punctuation unless (id+i)%3=0, javascript mention
    * when (id+i)%7=0, lorem/brace page poisons at %31/%37.
    */
  private val qualityC4: String =
    """WITH p AS (SELECT doc_id, len(string_split(text,' ')) AS m FROM documents),
      |l AS (SELECT doc_id, i,
      |        CASE WHEN least(5, m-5*i)=5 AND (doc_id+i)%3<>0 AND (doc_id+i)%7<>0
      |             THEN 1 ELSE 0 END AS kept
      |      FROM p, LATERAL unnest(generate_series(0,(m-1)//5)) AS t(i)),
      |k AS (SELECT doc_id, sum(kept) AS n_kept, count(*) AS n_groups
      |      FROM l GROUP BY doc_id)
      |SELECT doc_id,
      |  (n_groups + CASE WHEN doc_id%31=0 THEN 1 ELSE 0 END
      |            + CASE WHEN doc_id%37=0 THEN 1 ELSE 0 END)::BIGINT AS n_lines,
      |  n_kept::BIGINT AS n_kept,
      |  (CASE WHEN doc_id%31<>0 AND doc_id%37<>0 AND n_kept>=3
      |        THEN 1 ELSE 0 END)::BIGINT AS page_kept
      |FROM k""".stripMargin

  /** Mirror of Queries.c4SpanDedup: 15-word spans at 5-word stride, the
    * first owner per span text the min (doc_id, sid) key, later
    * occurrences counted as duplicates.
    */
  /** Mirror of Queries.substrDedup: window anchors, corpus-wide count,
    * gaps-and-islands interval merge per doc.
    */
  private val substrDedup: String =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS n FROM documents),
      |win AS (SELECT doc_id, i AS pos, array_to_string(w[i+1:i+15],' ') AS s
      |        FROM t, LATERAL unnest(generate_series(0, n-15)) AS g(i) WHERE n >= 15),
      |hot AS (SELECT s FROM win GROUP BY s HAVING count(*) >= 2),
      |dup AS (SELECT doc_id, pos FROM win JOIN hot USING (s)),
      |isl AS (SELECT doc_id, pos,
      |        CASE WHEN pos >= coalesce(max(pos+15) OVER (PARTITION BY doc_id ORDER BY pos
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) THEN 1 ELSE 0 END AS st
      |        FROM dup),
      |g2 AS (SELECT doc_id, pos, sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS isle FROM isl),
      |r AS (SELECT doc_id, isle, min(pos) AS a, max(pos)+15 AS b FROM g2 GROUP BY doc_id, isle)
      |SELECT w2.doc_id, w2.nw AS n_dup_windows, r2.k AS n_ranges, r2.c AS dup_tokens
      |FROM (SELECT doc_id, count(*) AS nw FROM dup GROUP BY doc_id) w2
      |JOIN (SELECT doc_id, count(*) AS k, sum(b - a)::BIGINT AS c FROM r GROUP BY doc_id) r2
      |  USING (doc_id)""".stripMargin

  /** Mirror of Queries.tokenBudget: the bucket decomposition collapses to
    * one global running sum over the same sha2 shuffle order.
    */
  private val tokenBudget: String =
    """WITH t AS (SELECT doc_id,
      |  len(string_split(text,' '))::BIGINT AS n_tokens,
      |  sha256(doc_id::VARCHAR) AS k FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)::BIGINT AS cum_end FROM t)
      |SELECT doc_id, n_tokens, cum_end FROM c WHERE cum_end <= 12000""".stripMargin

  /** Mirror of Queries.substrClean: tokens kept unless covered by any
    * duplicated window; empty-after-removal docs keep an empty string.
    */
  private val substrClean: String =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS n FROM documents),
      |win AS (SELECT doc_id, i AS pos, array_to_string(w[i+1:i+15],' ') AS s
      |        FROM t, LATERAL unnest(generate_series(0, n-15)) AS g(i) WHERE n >= 15),
      |hot AS (SELECT s FROM win GROUP BY s HAVING count(*) >= 2),
      |dup AS (SELECT doc_id, pos FROM win JOIN hot USING (s)),
      |tok AS (SELECT t.doc_id, u.idx, w[u.idx+1] AS tokk
      |        FROM t, LATERAL unnest(generate_series(0, n-1)) AS u(idx)),
      |k AS (SELECT tok.doc_id, idx, tokk,
      |        NOT EXISTS (SELECT 1 FROM dup d WHERE d.doc_id = tok.doc_id
      |                    AND tok.idx >= d.pos AND tok.idx < d.pos + 15) AS kept
      |      FROM tok)
      |SELECT doc_id,
      |  coalesce(string_agg(tokk, ' ' ORDER BY idx) FILTER (WHERE kept), '') AS txt
      |FROM k GROUP BY doc_id""".stripMargin

  private val c4SpanDedup: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents),
      |s AS (SELECT doc_id, i AS sid, array_to_string(w[5*i+1:5*i+15],' ') AS span,
      |        doc_id*1000000+i AS k
      |      FROM p, LATERAL unnest(generate_series(0,(m-15)//5)) AS t(i)
      |      WHERE m>=15),
      |f AS (SELECT span, min(k) AS fk FROM s GROUP BY span)
      |SELECT s.doc_id, count(*)::BIGINT AS n_spans,
      |  sum(CASE WHEN s.k<>f.fk THEN 1 ELSE 0 END)::BIGINT AS n_dup
      |FROM s JOIN f USING (span) GROUP BY s.doc_id""".stripMargin

  /** Mirror of Queries.odtExplode: the odt package root carries the
    * 5-words-per-line body; the %86 picture part is a level-1 child.
    */
  /** Mirror of Queries.epubExplode: the spine-ordered book text (title,
    * then ch2 BEFORE ch1 — the spine reverses the archive order) and the
    * single manifest-image child, recomputed arithmetically.
    */
  private val epubExplode: String =
    """SELECT doc_id,
      | 'Book '||doc_id||chr(10)||'part two '||doc_id||chr(10)||'part one '||doc_id AS txt,
      | 1::BIGINT AS n_children,
      | 'empty-file' AS child_reason
      |FROM documents WHERE doc_id%41=0""".stripMargin

  /** Mirror of Queries.sqliteExplode: the three tables' tabular text
    * (header + tab-joined rows), child counts, and the blob child's
    * unsupported-media classification, recomputed arithmetically from the
    * same doc_id-derived parameters.
    */
  private val sqliteExplode: String =
    """WITH d AS (SELECT doc_id, 2+(doc_id%5) AS n, 3+(doc_id%7) AS bl
      |           FROM documents WHERE doc_id%59=0),
      |r AS (SELECT d.doc_id,
      |        string_agg(i||chr(9)||(d.doc_id*10+i)||chr(9)||'item '||i||' of '||d.doc_id,
      |                   chr(10) ORDER BY i) AS body
      |      FROM d, LATERAL unnest(generate_series(1, d.n)) AS t(i)
      |      GROUP BY d.doc_id)
      |SELECT d.doc_id,
      |  'id'||chr(9)||'qty'||chr(9)||'name'||chr(10)||r.body AS inv_txt,
      |  'tag'||chr(10)||'tag-'||d.doc_id AS tags_txt,
      |  'payload'||chr(10)||'[blob '||d.bl||'B]' AS bin_txt,
      |  3::BIGINT AS n_tables, 1::BIGINT AS n_blobs,
      |  'unsupported-media-type' AS blob_reason
      |FROM d JOIN r USING (doc_id)""".stripMargin

  /** Mirror of Queries.plistExplode: the flat dotted-path rendering of the
    * %67 plist (scalars, ISO date from the CF epoch, `<data N>` length
    * placeholders — the nested file's byte length recomputed from the
    * writer's deterministic layout: 51 + header+string bytes, where a
    * string of 15+ chars pays the 6-byte extended-count header) and the
    * two spawned data children, all as string arithmetic.
    */
  private val plistExplode: String =
    """WITH d AS (SELECT doc_id, len(doc_id::VARCHAR) AS w
      |           FROM documents WHERE doc_id%67=0)
      |SELECT doc_id,
      | 'app: graft '||doc_id||chr(10)||
      | 'count: '||doc_id||chr(10)||
      | 'flag: '||CASE WHEN doc_id%2=0 THEN 'true' ELSE 'false' END||chr(10)||
      | 'when: '||strftime(make_timestamp((978307200+doc_id*60+30)*1000000),
      |                    '%Y-%m-%dT%H:%M:%SZ')||chr(10)||
      | 'items[0]: alpha'||chr(10)||
      | 'items[1]: beta '||doc_id||chr(10)||
      | 'memo: <data '||(15+w)||'>'||chr(10)||
      | 'inner: <data '||(51+CASE WHEN 12+w<15 THEN 13+w ELSE 18+w END)||'>' AS txt,
      | 'inline payload '||doc_id AS memo_txt,
      | 'note: nested note '||doc_id AS inner_txt,
      | 2::BIGINT AS n_children
      |FROM d""".stripMargin

  /** Mirror of Queries.xmlText: the markup-stripped, entity-decoded,
    * document-ordered text runs recomputed as one string expression.
    */
  private val xmlText: String =
    """SELECT doc_id,
      | 'Doc & Title '||doc_id||chr(10)||'line one '||doc_id||chr(10)
      |   ||'bold run'||chr(10)||'tail'||chr(10)||'raw <cdata> text '||doc_id AS txt,
      | 'xml' AS kind
      |FROM documents WHERE doc_id%53=0""".stripMargin

  /** Mirror of Queries.odsTable: 2-word tab-joined rows, newline-joined. */
  private val odsTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%46=0),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id, string_agg(row, chr(10) ORDER BY i) AS txt
      |FROM r GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.odpSlides: 3-word paragraph lines in document
    * order (page framing flattens).
    */
  private val odpSlides: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%62=0),
      |l AS (SELECT doc_id, i, array_to_string(w[3*i+1:3*i+3],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//3)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.xpsText: 4-word Glyphs lines in page order. */
  private val xpsText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%79=0),
      |l AS (SELECT doc_id, i, array_to_string(w[4*i+1:4*i+4],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//4)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  private val odtExplode: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%43=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i)),
      |r AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |      string_agg(line, chr(10) ORDER BY i) AS txt
      |      FROM l GROUP BY doc_id)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, txt,
      |       CASE WHEN txt='' THEN 'empty-file' ELSE '' END AS reason FROM r
      |UNION ALL SELECT doc_id,
      | sha256('64:'||sha256('pic '||doc_id)||'64:'||rid||'1:0'||'0:'
      |   ||octet_length(encode('Pictures/img1.bin'))||':Pictures/img1.bin'),
      | rid, 1, 'pic '||doc_id, '' FROM r WHERE doc_id%86=0""".stripMargin

  /** Mirror of Queries.xlsTable: the xlsxTable construction at %15 —
    * two-word tab rows + 'total<TAB><id>'.
    */
  private val xlsTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%15=0),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id,
      | string_agg(row, chr(10) ORDER BY i) || chr(10) || 'total' || chr(9) || doc_id AS txt
      |FROM r GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.dbfTable: header K/V + two-word rows (odd tails
    * pad with an empty value); %66 docs lose their FIRST row (deleted
    * flag). Empty-body edge handled by the left join.
    */
  private val dbfTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%33=0),
      |r AS (SELECT doc_id, i,
      |        w[2*i+1] || chr(9) || coalesce(w[2*i+2],'') AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i)
      |      WHERE NOT (doc_id%66=0 AND i=0)),
      |a AS (SELECT doc_id, string_agg(row, chr(10) ORDER BY i) AS body
      |      FROM r GROUP BY doc_id)
      |SELECT p.doc_id,
      | 'K' || chr(9) || 'V' ||
      |   CASE WHEN a.body IS NULL THEN '' ELSE chr(10) || a.body END AS txt,
      | 'dbf' AS kind
      |FROM p LEFT JOIN a ON p.doc_id = a.doc_id""".stripMargin

  /** Mirror of Queries.xlsDecrypt: VelvetSweatshop-encrypted workbooks
    * extract the exact q_xls_table text; %115 real-password docs classify
    * encrypted with empty text.
    */
  private val xlsDecrypt: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%23=0),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id,
      | CASE WHEN doc_id%115=0 THEN ''
      |      ELSE string_agg(row, chr(10) ORDER BY i) || chr(10) || 'total' || chr(9) || doc_id END AS txt,
      | CASE WHEN doc_id%115=0 THEN 'encrypted' ELSE '' END AS reason
      |FROM r GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.ooxmlDecrypt: VelvetSweatshop-encrypted .docx
    * packages extract their 5-word paragraphs; %178 real-password docs
    * classify encrypted with empty text.
    */
  private val ooxmlDecrypt: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%89=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id,
      | CASE WHEN doc_id%178=0 THEN '' ELSE string_agg(line, chr(10) ORDER BY i) END AS txt,
      | CASE WHEN doc_id%178=0 THEN 'encrypted' ELSE '' END AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pdfEncrypted: %38 docs classify encrypted (empty
    * text), the rest extract their 5-word lines.
    */
  private val pdfEncrypted: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%19=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id,
      | CASE WHEN doc_id%38=0 THEN '' ELSE string_agg(line, chr(10) ORDER BY i) END AS txt,
      | CASE WHEN doc_id%38=0 THEN 'encrypted' ELSE '' END AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pdfDecrypt: owner-restricted docs (%29) decrypt to
    * the full text; real-user-password docs (%58) classify encrypted.
    */
  private val pdfDecrypt: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%29=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id,
      | CASE WHEN doc_id%58=0 THEN '' ELSE string_agg(line, chr(10) ORDER BY i) END AS txt,
      | CASE WHEN doc_id%58=0 THEN 'encrypted' ELSE '' END AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.docObjects: the .doc root carries the 5-word-line
    * body; the ObjectPool text object is a level-1 child.
    */
  private val docObjects: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%21=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i)),
      |r AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |      string_agg(line, chr(10) ORDER BY i) AS txt
      |      FROM l GROUP BY doc_id)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, txt,
      |       CASE WHEN txt='' THEN 'empty-file' ELSE '' END AS reason FROM r
      |UNION ALL SELECT doc_id,
      | sha256('64:'||sha256('obj '||doc_id)||'64:'||rid||'1:0'||'0:'
      |   ||octet_length(encode('ObjectPool/_1000/obj1.txt'))||':ObjectPool/_1000/obj1.txt'),
      | rid, 1, 'obj '||doc_id, '' FROM r""".stripMargin

  /** Mirror of Queries.pptText: 5-word lines in document order at %17. */
  private val pptText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%17=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.lnkText: target path from the first word, name
    * and size lines.
    */
  private val lnkText: String =
    """SELECT doc_id,
      | 'target: C:\docs\' || string_split(text,' ')[1] || '.doc' || chr(10) ||
      | 'name: opened ' || doc_id || chr(10) ||
      | 'size: ' || (doc_id + 7) AS txt,
      | 'lnk' AS kind
      |FROM documents WHERE doc_id%47=0""".stripMargin

  /** Mirror of Queries.wpdText: 5-word hard-return lines; %78 docs are
    * password-flagged and classify encrypted with empty text.
    */
  private val wpdText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%39=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id,
      | CASE WHEN doc_id%78=0 THEN '' ELSE string_agg(line, chr(10) ORDER BY i) END AS txt,
      | CASE WHEN doc_id%78=0 THEN 'encrypted' ELSE '' END AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.artifactLookup: the level-1 embed fetched by its
    * independently recomputed digest, with the content-addressed path.
    */
  private val artifactLookup: String =
    """WITH m AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |  CASE WHEN doc_id%21=0 THEN ''
      |       WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
      |       ELSE 'ocr '||doc_id END AS content
      | FROM documents WHERE doc_id%3=0)
      |SELECT doc_id,
      | sha256(CASE WHEN content='' THEN '0:' ELSE '64:'||sha256(content) END
      |   ||'64:'||rid||'1:0'||'0:'||'0:') AS child_id,
      | 1 AS level,
      | CASE WHEN doc_id%21=0 THEN '' ELSE 'ocr '||doc_id END AS txt,
      | 'art/'||substr(rid,1,2)||'/'||rid AS media_path
      |FROM m""".stripMargin

  /** Mirror of Queries.docxExplode: the docx PACKAGE root carries the
    * 5-words-per-line body text; the %12 media part is a level-1 child.
    */
  private val docxExplode: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%6=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i)),
      |r AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |      string_agg(line, chr(10) ORDER BY i) AS txt
      |      FROM l GROUP BY doc_id)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, txt, '' AS reason FROM r
      |UNION ALL SELECT doc_id,
      | sha256('64:'||sha256('img '||doc_id)||'64:'||rid||'1:0'||'0:'
      |   ||octet_length(encode('word/media/img1.bin'))||':word/media/img1.bin'),
      | rid, 1, 'img '||doc_id, '' FROM r WHERE doc_id%12=0""".stripMargin

  /** Mirror of Queries.oneText: 5-word RichEditTextUnicode paragraphs
    * back out of the revision-store walk.
    */
  private val oneText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%107=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pubText: 5-word Quill-story paragraphs back out of
    * the CHNKINK chunk-index walk.
    */
  private val pubText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%109=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.msgRtf: 5-word lines back out of the LZFu
    * decompress + RTF render of a PR_RTF_COMPRESSED-only message.
    */
  private val msgRtf: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%111=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.hwpText: 5-word PARA_TEXT paragraphs back out of
    * the deflated-section record walk; every paragraph keeps its
    * paragraph-break newline (char 13 -> chr(10)).
    */
  private val hwpText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%113=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line || chr(10), '' ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.oneFiles: the root's 5-word paragraphs (level 0)
    * plus the embedded FileDataStoreObject text child (level 1).
    */
  private val oneFiles: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%117=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, 0 AS level, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id
      |UNION ALL
      |SELECT doc_id, 1 AS level, 'embedded note ' || doc_id AS txt FROM p""".stripMargin

  /** Mirror of Queries.appleText: transport envelope (empty level 0) +
    * the data fork's verbatim text at level 1.
    */
  private val appleText: String =
    """WITH p AS (SELECT doc_id, text FROM documents WHERE doc_id%121=0)
      |SELECT doc_id, 0 AS level, '' AS txt FROM p
      |UNION ALL
      |SELECT doc_id, 1 AS level, text AS txt FROM p""".stripMargin

  /** Mirror of Queries.pdfCid: 5-word lines back out of the ToUnicode
    * CMap decode of 2-byte glyph codes.
    */
  private val pdfCid: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%123=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pdfForm: the page line plus the three terminal
    * field values as `name: value` lines, document order, the kid dotted
    * under its parent.
    */
  private val pdfForm: String =
    """SELECT doc_id,
      |  'form doc '||doc_id||chr(10)||'applicant: name '||doc_id||chr(10)
      |    ||'agree: Yes'||chr(10)||'grp.sub: deep '||doc_id AS txt,
      |  '' AS reason
      |FROM documents WHERE doc_id%71=0""".stripMargin

  /** Mirror of Queries.pdfObjStm: same surface as pdfForm — the modern
    * object-stream layout must be invisible in the output.
    */
  private val pdfObjStm: String =
    """SELECT doc_id,
      |  'modern doc '||doc_id||chr(10)||'applicant: name '||doc_id||chr(10)
      |    ||'agree: Yes'||chr(10)||'grp.sub: deep '||doc_id AS txt,
      |  '' AS reason
      |FROM documents WHERE doc_id%127=0""".stripMargin

  /** Mirror of Queries.pdfXfa: the page line plus the datasets packet's
    * two values in element order.
    */
  private val pdfXfa: String =
    """SELECT doc_id,
      |  'xfa doc '||doc_id||chr(10)||'name '||doc_id||chr(10)||'town '||doc_id AS txt,
      |  '' AS reason
      |FROM documents WHERE doc_id%131=0""".stripMargin

  /** Mirror of Queries.vsdxText: 5-word shape texts back out of the
    * two-page drawing walk (page split preserves line order).
    */
  private val vsdxText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%119=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt, '' AS reason
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.iworkText: 5-word sf:p paragraphs back out of the
    * gzipped legacy-Pages index.
    */
  private val iworkText: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%103=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.xlsbTable: the xlsx construction at %101, decoded
    * out of BIFF12 records.
    */
  private val xlsbTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%101=0),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id,
      | string_agg(row, chr(10) ORDER BY i) || chr(10) || 'total' || chr(9) || doc_id AS txt
      |FROM r GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.xlsxTable: two-word tab rows + 'total<TAB><id>'. */
  private val xlsxTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%7=0),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id,
      | string_agg(row, chr(10) ORDER BY i) || chr(10) || 'total' || chr(9) || doc_id AS txt
      |FROM r GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pptxSlides: the 5-word lines reordered slide-major
    * (even line indices first, then odd), paragraphs newline-joined.
    */
  private val pptxSlides: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents WHERE doc_id%11=0),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i%2, i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.tgzExplode: gzip root -> tar container (canonical
    * entry id) -> two file entries.
    */
  private val tgzExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%9=0),
      |t AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256(
      |     '5:x.txt'||octet_length(encode('xray '||doc_id))||':xray '||doc_id
      |   ||'5:y.txt'||octet_length(encode('yank '||doc_id))||':yank '||doc_id)
      |   ||'64:'||rid||'1:0'||'0:'||'10:bundle.tar') AS tid
      | FROM z)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id, tid, rid, 1, '', 'empty-file' FROM t
      |UNION ALL SELECT doc_id,
      | sha256('64:'||sha256('xray '||doc_id)||'64:'||tid||'1:0'||'0:'||'5:x.txt'),
      | tid, 2, 'xray '||doc_id, '' FROM t
      |UNION ALL SELECT doc_id,
      | sha256('64:'||sha256('yank '||doc_id)||'64:'||tid||'1:1'||'0:'||'5:y.txt'),
      | tid, 2, 'yank '||doc_id, '' FROM t""".stripMargin

  /** Mirror of Queries.emlExplode: body + two attachments per %5 doc. */
  private val emlExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%5=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level,
      |       'body words '||doc_id AS txt, '' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('payload '||doc_id)||'64:'||rid||'1:0'||'0:'
      |    ||octet_length(encode('att-'||doc_id||'.bin'))||':att-'||doc_id||'.bin'),
      |  rid, 1, 'payload '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('second attachment '||doc_id)||'64:'||rid||'1:1'||'0:'||'9:notes.txt'),
      |  rid, 1, 'second attachment '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.emlxExplode: identical tree to emlExplode (the
    * framing must be invisible), different modulus.
    */
  private val emlxExplode: String = emlExplode.replace("doc_id%5=0", "doc_id%85=0")

  /** Mirror of Queries.mhtmlExplode: the page save's extracted main text
    * on the root, two resource children named by their URL's last path
    * segment (query string stripped from pix…dat).
    */
  private val mhtmlExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%49=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level,
      |       'title '||doc_id||chr(10)||'saved page '||doc_id AS txt,
      |       '' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('body font '||doc_id)||'64:'||rid||'1:0'||'0:'
      |    ||octet_length(encode('style'||doc_id||'.css'))||':style'||doc_id||'.css'),
      |  rid, 1, 'body font '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('pixel data '||doc_id)||'64:'||rid||'1:1'||'0:'
      |    ||octet_length(encode('pix'||doc_id||'.dat'))||':pix'||doc_id||'.dat'),
      |  rid, 1, 'pixel data '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.rarExplode: two stored members around a refused
    * compressed one — ordinals 0 and 2 prove the skip is counted, not
    * collapsed; the SQL is identical for the 4.x and 5.x builds.
    */
  private val rarExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%59=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('rrr '||doc_id)||'64:'||rid||'1:0'||'0:'||'5:r.txt'),
      |  rid, 1, 'rrr '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('sss '||doc_id)||'64:'||rid||'1:2'||'0:'||'5:s.txt'),
      |  rid, 1, 'sss '||doc_id, '' FROM z""".stripMargin

  /** Mirror of Queries.emlHeaders: the normalized header multimap —
    * repeated Received headers concatenate; keys normalize and sort.
    */
  private val emlHeaders: String =
    """WITH z AS (SELECT doc_id FROM documents WHERE doc_id%5=0)
      |SELECT doc_id, 'tika_metadata_content_type' AS norm_key,
      |       'multipart/mixed; boundary="b'||doc_id||'"' AS vals FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_from', 'sender'||doc_id||'@example.org' FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_received', 'hop1 '||doc_id||'|hop2 '||doc_id FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_subject', 'subj '||doc_id FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_to', 'dest'||doc_id||'@example.org' FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_x_mailer', 'graft '||(doc_id%3) FROM z""".stripMargin

  /** Mirror of Queries.msgHeaders: the MAPI subject/from promoted through
    * key normalization.
    */
  private val msgHeaders: String =
    """WITH z AS (SELECT doc_id FROM documents WHERE doc_id%9=0)
      |SELECT doc_id, 'tika_metadata_from' AS norm_key,
      |       'sender '||doc_id AS vals FROM z
      |UNION ALL SELECT doc_id, 'tika_metadata_subject', 'subject '||doc_id FROM z""".stripMargin

  /** Mirror of Queries.htmlCharsetQ: the boilerplate page's title+content
    * with the accented prefix — reproducible only if the engine decoded
    * the declared windows-1252 charset correctly.
    */
  private val htmlCharset: String =
    """SELECT doc_id,
      |  'title '||doc_id||chr(10)||
      |  trim('café déjà vu '||array_to_string(string_split(text,' ')[1:5],' ')) AS txt
      |FROM documents WHERE doc_id%23=0""".stripMargin

  private val pdfBytes: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents),
      |l AS (SELECT doc_id, i, array_to_string(w[5*i+1:5*i+5],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//5)) AS t(i))
      |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
      |FROM l GROUP BY doc_id""".stripMargin

  private val LENC_REL = lencSql("rel0")
  private val LENC_RES = lencSql("res0")

  /** Mirror of Queries.csvTable: two-word tab-joined rows + the quoted
    * final row with embedded comma and "" escapes.
    */
  private val csvTable: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents),
      |r AS (SELECT doc_id, i, array_to_string(w[2*i+1:2*i+2], chr(9)) AS row
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//2)) AS t(i))
      |SELECT doc_id,
      | string_agg(row, chr(10) ORDER BY i) || chr(10) ||
      | 'x,"y" '||doc_id||chr(9)||'tail' AS txt
      |FROM r GROUP BY doc_id""".stripMargin

  private val embedNamed: String =
    s"""WITH m AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid,
      |  CASE WHEN doc_id%2=0 THEN 'att-'||doc_id||'.txt' ELSE '' END AS res0,
      |  CASE WHEN doc_id%5=0 THEN 'rId'||(doc_id%97) ELSE '' END AS rel0
      | FROM documents WHERE doc_id%3=0 AND doc_id%21<>0),
      |e AS (SELECT doc_id, rid, res0, rel0,
      |  sha256('64:'||sha256('att '||doc_id)||'64:'||rid||'1:0'||
      |    ${LENC_REL}||${LENC_RES}) AS e0,
      |  sha256('64:'||sha256('proj'||'att '||doc_id)||'64:'||rid||'1:0'||
      |    ${LENC_REL}||${LENC_RES}) AS e0s
      | FROM m)
      |SELECT doc_id, 'e0' AS embed_key, e0 AS child_id, e0s AS child_id_salted,
      |  CASE WHEN res0='' THEN 'untitled_0' ELSE res0 END AS name,
      |  CASE WHEN res0='' THEN 'untitled_0' ELSE res0 END AS name_legacy FROM e
      |UNION ALL SELECT doc_id, 'e1', sha256('64:'||sha256('img '||doc_id)||'64:'||rid||'1:1'||'0:'||'0:'),
      |  sha256('64:'||sha256('proj'||'img '||doc_id)||'64:'||rid||'1:1'||'0:'||'0:'),
      |  'untitled_1', 'untitled_1' FROM e
      |UNION ALL SELECT doc_id, 'n0', sha256('64:'||sha256('sub '||doc_id)||'64:'||e0||'1:0'||'0:'||'0:'),
      |  sha256('64:'||sha256('proj'||'sub '||doc_id)||'64:'||e0s||'1:0'||'0:'||'0:'),
      |  'untitled_0', 'untitled_2' FROM e""".stripMargin

  private val embedConcat: String =
    """WITH m AS (SELECT doc_id,
      |  CASE WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
      |       ELSE 'ocr '||doc_id END AS c
      | FROM documents WHERE doc_id%3=0 AND doc_id%21<>0)
      |SELECT doc_id,
      | '<div class="package-entry"><h1>untitled_0</h1><p>'||
      |   replace(replace(replace(c,'&','&amp;'),'<','&lt;'),'>','&gt;')||'</p></div>'
      | ||CASE WHEN doc_id%2=0
      |   THEN '<div class="package-entry"><h1>extra.txt</h1><p>x '||doc_id||'</p></div>'
      |   ELSE '' END
      | ||CASE WHEN doc_id%11=0
      |   THEN '<div class="package-entry"><h1>untitled_'||(CASE WHEN doc_id%2=0 THEN 2 ELSE 1 END)
      |     ||'</h1><p class="error">encrypted</p></div>'
      |   ELSE '' END AS html,
      | (CASE WHEN doc_id%11=0 THEN 1 ELSE 0 END)::BIGINT AS n_failed
      |FROM m""".stripMargin

  private val mediaDataUri: String =
    """SELECT doc_id,
      | '<img src="data:application/octet-stream;base64,'||
      | to_base64(encode(CASE WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
      |   ELSE 'ocr '||doc_id END))||'">' AS html
      |FROM documents WHERE doc_id%3=0 AND doc_id%21<>0""".stripMargin

  private val metaIso: String =
    """WITH b AS (SELECT doc_id, 1500000000 + doc_id*13 AS es FROM documents)
      |SELECT doc_id, 'dcterms_modified' AS field,
      | es::VARCHAR||'|'||strftime(to_timestamp(es+86400) AT TIME ZONE 'UTC',
      |   '%a, %d %b %Y %H:%M:%S GMT')
      |   ||CASE WHEN doc_id%7=0 THEN '|not a date' ELSE '' END AS raw_vals,
      | CASE WHEN doc_id%7=0 THEN ''
      |   ELSE strftime(to_timestamp(es) AT TIME ZONE 'UTC','%Y-%m-%dT%H:%M:%SZ')||'|'||
      |        strftime(to_timestamp(es+86400) AT TIME ZONE 'UTC','%Y-%m-%dT%H:%M:%SZ') END AS iso_vals,
      | doc_id%7<>0 AS has_iso
      |FROM b""".stripMargin

  private val reconcile: String =
    """SELECT sha256(doc_id::VARCHAR) AS root_id, 1::BIGINT AS n_children,
      |       (CASE WHEN doc_id%21=0 THEN 1 ELSE 0 END)::BIGINT AS n_empty
      |FROM documents WHERE doc_id%3=0""".stripMargin

  private val extractLineage: String =
    """SELECT doc_id, 'SUCCESS' AS status,
      | (3 + CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END + CASE WHEN doc_id%13=0 THEN 1 ELSE 0 END)::BIGINT AS n_spans_in,
      | (3 + CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END + CASE WHEN doc_id%13=0 THEN 1 ELSE 0 END)::BIGINT AS n_spans_out
      |FROM documents""".stripMargin

  private val lineageTaxonomy: String =
    """SELECT doc_id, CASE doc_id%23
      | WHEN 1 THEN 'FAILURE_NOT_DECRYPTED'
      | WHEN 2 THEN 'FAILURE_NOT_PARSED'
      | WHEN 3 THEN 'FAILURE_NOT_FOUND'
      | WHEN 4 THEN 'FAILURE_UNREADABLE'
      | ELSE 'SUCCESS' END AS status
      |FROM documents""".stripMargin

  private val reportStatus: String =
    """WITH s AS (SELECT CASE doc_id%23
      | WHEN 1 THEN 'FAILURE_NOT_DECRYPTED'
      | WHEN 2 THEN 'FAILURE_NOT_PARSED'
      | WHEN 3 THEN 'FAILURE_NOT_FOUND'
      | WHEN 4 THEN 'FAILURE_UNREADABLE'
      | ELSE 'SUCCESS' END AS status FROM documents)
      |SELECT status, count(*)::BIGINT AS n FROM s GROUP BY status""".stripMargin

  private val scanFilter: String =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id%37<>0 AND source<>'src13' AND n_chars BETWEEN 100 AND 500""".stripMargin

  private val queueDedup: String =
    """WITH d AS (SELECT doc_id, text, source FROM documents
      | UNION ALL SELECT doc_id+1000000, text, source FROM documents WHERE doc_id<100)
      |SELECT source, count(*)::BIGINT AS n_total, count(DISTINCT text)::BIGINT AS n_distinct
      |FROM d GROUP BY source""".stripMargin

  private val semiIntersect: String =
    "SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)"

  private val antiComplement: String =
    "SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey AND o.o_orderkey%7=0)"

  private val resumeAnti: String =
    "SELECT o_orderkey FROM orders WHERE o_orderkey%5>=2"

  private val rehash: String =
    """SELECT doc_id, regexp_replace(source,'^src','corpus/') AS new_path,
      | sha256(regexp_replace(source,'^src','corpus/')||'/'||doc_id::VARCHAR) AS new_id
      |FROM documents""".stripMargin

  private val copyTag: String =
    "SELECT p_partkey, string_split(p_type,' ')[1] AS base_type, 'batch-1' AS tag FROM part"

  private val metaKeys: String =
    """WITH k AS (SELECT doc_id, source,
      | (['Content-Type','dcterms:created','X-Parsed-By','Message-ID','Page Count!'])[(doc_id%5)+1] AS raw_key
      | FROM documents)
      |SELECT doc_id, raw_key,
      | 'tika_metadata_'||regexp_replace(lower(raw_key),'[^a-z0-9_]','_','g') AS norm_key,
      | source AS value
      |FROM k""".stripMargin

  private val metaDates: String =
    """WITH b AS (SELECT doc_id, 1400000000 + doc_id*997 AS es FROM documents)
      |SELECT doc_id,
      | CASE doc_id%4
      |  WHEN 0 THEN es::VARCHAR
      |  WHEN 1 THEN (es*1000 + doc_id%1000)::VARCHAR
      |  WHEN 2 THEN strftime(to_timestamp(es) AT TIME ZONE 'UTC', '%Y%m%d%H%M%S')
      |  ELSE strftime(to_timestamp(es) AT TIME ZONE 'UTC', '%a, %d %b %Y %H:%M:%S GMT')
      | END AS raw,
      | strftime(to_timestamp(es) AT TIME ZONE 'UTC', '%Y-%m-%dT%H:%M:%SZ') AS iso
      |FROM b""".stripMargin

  private val metaMap: String =
    """SELECT doc_id, 'tika_metadata_author' AS norm_key, 'author '||(doc_id%7) AS vals FROM documents
      |UNION ALL SELECT doc_id, 'tika_metadata_content_type', 'text/plain; charset=utf-8' FROM documents
      |UNION ALL SELECT doc_id, 'tika_metadata_dcterms_created', (1400000000+doc_id)::VARCHAR FROM documents
      |UNION ALL SELECT doc_id, 'tika_metadata_resourcename', 'doc-'||doc_id||'.txt' FROM documents""".stripMargin

  private val ocrCache: String =
    """SELECT doc_id,
      | CASE WHEN doc_id%2=0 THEN 'cache' ELSE 'fresh' END AS src,
      | CASE WHEN doc_id%2=0 THEN 'cached '||doc_id ELSE 'computed '||doc_id END AS text
      |FROM documents WHERE doc_id%3=0 AND doc_id%21<>0""".stripMargin

  private val mediaLinks: String =
    """SELECT doc_id,
      | '<a href="art/'||substr(sha256(doc_id::VARCHAR),1,2)||'/'||sha256(doc_id::VARCHAR)||'" download>'||
      | CASE WHEN doc_id%21=0 THEN 'untitled_0'
      |      WHEN doc_id%27=0 THEN 'chain:ocr '||doc_id||'>sub '||doc_id
      |      ELSE 'ocr '||doc_id END||'</a>' AS link
      |FROM documents WHERE doc_id%3=0""".stripMargin

  private val stopEnSql = "('the','a','and','of','to','in')"
  private val stopFrSql = "('le','la','et','les','des','un')"
  private val stopDeSql = "('der','die','und','das','ein','zu')"

  private val langId: String =
    s"""WITH c AS (SELECT doc_id,
       | len(list_filter(string_split(text,' '), x -> x IN $stopEnSql)) AS en,
       | len(list_filter(string_split(text,' '), x -> x IN $stopFrSql)) AS fr,
       | len(list_filter(string_split(text,' '), x -> x IN $stopDeSql)) AS de
       | FROM documents)
       |SELECT doc_id, CASE WHEN en>=fr AND en>=de AND en>0 THEN 'en'
       |  WHEN fr>=de AND fr>0 THEN 'fr' WHEN de>0 THEN 'de' ELSE 'und' END AS lang_pred
       |FROM c""".stripMargin

  /** Per-language scoring CASE generated from LangId.Profiles — the SQL
    * oracle and the Scala classifier share one profile definition.
    */
  private def langCase(grams: Vector[String]): String =
    "sum(CASE tg " + grams.zipWithIndex.map { case (g, i) =>
      s"WHEN '$g' THEN ${grams.length - i}"
    }.mkString(" ") + " ELSE 0 END)"

  private val langTrigram: String = {
    val profs = graft.core.text.LangId.Profiles.toMap
    s"""WITH base AS (SELECT doc_id, ' '||lower(text)||' ' AS t FROM documents),
       |g AS (SELECT doc_id, substr(t, i, 3) AS tg
       |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM base)),
       |s AS (SELECT doc_id,
       |  ${langCase(profs("en"))} AS en,
       |  ${langCase(profs("fr"))} AS fr,
       |  ${langCase(profs("de"))} AS de,
       |  ${langCase(profs("es"))} AS es
       | FROM g GROUP BY doc_id),
       |c AS (SELECT b.doc_id, coalesce(en,0) AS en, coalesce(fr,0) AS fr,
       |             coalesce(de,0) AS de, coalesce(es,0) AS es
       |      FROM base b LEFT JOIN s USING(doc_id))
       |SELECT doc_id,
       | CASE WHEN en>0 AND en>=fr AND en>=de AND en>=es THEN 'en'
       |      WHEN fr>0 AND fr>=de AND fr>=es THEN 'fr'
       |      WHEN de>0 AND de>=es THEN 'de'
       |      WHEN es>0 THEN 'es' ELSE 'und' END AS lang_pred,
       | en::BIGINT AS s_en, fr::BIGINT AS s_fr,
       | de::BIGINT AS s_de, es::BIGINT AS s_es
       |FROM c""".stripMargin
  }

  private val quality: String =
    s"""WITH c AS (SELECT doc_id, len(text) AS n_chars,
       |  len(string_split(text,' ')) AS n,
       |  len(list_filter(string_split(text,' '), x -> x IN $stopEnSql)) AS n_stop,
       |  len(list_distinct(string_split(text,' '))) AS uniq
       | FROM documents)
       |SELECT doc_id, n::BIGINT AS n_tokens, n_chars::BIGINT AS n_chars, n_stop::BIGINT AS n_stop,
       | (100*uniq//n)::BIGINT AS uniq_pct,
       | (least(40, n//2) + least(30, 100*n_stop//n) + least(30, (100*uniq//n)//3))::BIGINT AS score
       |FROM c""".stripMargin

  private val qualityGopher: String =
    s"""WITH c AS (SELECT doc_id,
       |  string_split(text,' ') AS w,
       |  len(string_split(text,' ')) AS n FROM documents),
       |m AS (SELECT doc_id, n,
       |  list_sum(list_transform(w, x -> len(x))) AS len_sum,
       |  len(list_filter(w, x -> x IN $stopEnSql)) AS n_stop,
       |  len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
       |  len(list_distinct(w)) AS uniq
       | FROM c)
       |SELECT doc_id, n::BIGINT AS n_words,
       | (100*len_sum//n)::BIGINT AS mean_wlen_x100,
       | n_stop::BIGINT AS n_stop,
       | (100*alpha//n)::BIGINT AS alpha_pct,
       | (100*uniq//n)::BIGINT AS uniq_pct,
       | (CASE WHEN n BETWEEN 10 AND 100000
       |   AND 100*len_sum//n BETWEEN 200 AND 1200
       |   AND n_stop >= 1 AND 100*alpha//n >= 80 AND 100*uniq//n >= 20
       |  THEN 1 ELSE 0 END)::BIGINT AS passes
       |FROM m""".stripMargin

  private val tokenCount: String =
    """SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_ws,
      | list_sum(list_transform(string_split(text,' '), x -> (len(x)+3)//4))::BIGINT AS n_subword
      |FROM documents""".stripMargin

  /** Cross-engine NFC check: DuckDB's utf8proc `nfc_normalize` and the
    * engine's java.text.Normalizer both implement UAX #15 NFC — md5 of
    * the outputs must agree byte-for-byte on the synthesized
    * decomposed/precomposed fixtures (chr() literals keep the SQL ASCII).
    */
  private val normalizeNfc: String =
    """WITH r AS (SELECT doc_id,
      |  CASE WHEN doc_id%3=0 THEN 'cafe'||chr(769)||' vin'||chr(771)||'a '||text
      |       WHEN doc_id%3=1 THEN 'caf'||chr(233)||' vi'||chr(241)||'a '||text
      |       ELSE text END AS raw FROM documents),
      |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nf FROM r)
      |SELECT doc_id, (raw <> nf)::BIGINT AS changed,
      |  length(raw)::BIGINT AS n_raw, length(nf)::BIGINT AS n_nfc,
      |  substr(md5(nf),1,8) AS h8
      |FROM n""".stripMargin

  private val pow31Sql =
    "([1,31,961,29791,923521,28629151,887503681,27512614111]::BIGINT[])"

  private val fingerprint: String =
    s"""WITH e AS (SELECT doc_id,
       |  unnest(string_split(text,' ')) AS word,
       |  unnest(generate_series(1, len(string_split(text,' ')))) AS i
       | FROM documents),
       |h AS (SELECT doc_id, i, substr(md5(word),1,8) AS h8 FROM e)
       |SELECT doc_id,
       | (sum((${hex2int("h8")} % 1000003) * $pow31Sql[((i-1)%8)+1]) % 2038074743)::BIGINT AS fp
       |FROM h GROUP BY doc_id""".stripMargin

  private val winnow: String =
    s"""WITH e AS (SELECT doc_id,
       |  unnest(string_split(text,' ')) AS word,
       |  unnest(generate_series(1, len(string_split(text,' ')))) AS i
       | FROM documents),
       |c AS (SELECT doc_id, i, ${hex2int("substr(md5(word),1,8)")} AS cd FROM e),
       |m AS (SELECT doc_id, min(cd) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm FROM c)
       |SELECT doc_id, count(DISTINCT wm)::BIGINT AS n_fp FROM m GROUP BY doc_id""".stripMargin

  private val profile: String =
    """WITH r AS (SELECT source, doc_id, n_chars,
      |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
      |  count(*) OVER (PARTITION BY source) AS cnt FROM documents)
      |SELECT source, max(cnt)::BIGINT AS n_docs, min(n_chars)::BIGINT AS min_chars,
      | max(n_chars)::BIGINT AS max_chars,
      | max(CASE WHEN rk=(cnt+1)//2 THEN n_chars END)::BIGINT AS median_chars
      |FROM r GROUP BY source""".stripMargin

  /** Mirror of Queries.piiScrub: same injected text, same RE2 regexes. */
  private val piiScrub: String =
    """WITH d AS (SELECT doc_id,
      |  text||' contact x'||doc_id||'@mail.com or '||
      |  (doc_id%900+100)||'-'||(doc_id%800+100)||'-'||(doc_id%9000+1000) AS text
      | FROM documents)
      |SELECT doc_id,
      | len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+'))::BIGINT AS n_emails,
      | len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
      | regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
      |                '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
      |FROM d""".stripMargin

  /** Mirror of Queries.repetitionQ: 4-word lines, distinct count, dup pct. */
  private val repetition: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents),
      |l AS (SELECT doc_id, array_to_string(w[4*i+1:4*i+4],' ') AS line
      |      FROM p, LATERAL unnest(generate_series(0, (m-1)//4)) AS t(i))
      |SELECT doc_id, count(*)::BIGINT AS n_lines,
      | count(DISTINCT line)::BIGINT AS n_distinct,
      | (100*(count(*)-count(DISTINCT line))//count(*))::BIGINT AS dup_pct
      |FROM l GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.prepSummary: the full prep funnel recomputed
    * independently — Gopher gate inline, window-min exact dedup, bigram
    * decontamination, per-source counts.
    */
  private val prepSummary: String =
    """WITH d AS (SELECT doc_id, source, text FROM documents
      | UNION ALL SELECT doc_id+1000000, source, text FROM documents WHERE doc_id<100),
      |m AS (SELECT doc_id, source, text,
      |  len(string_split(text,' ')) AS n,
      |  list_sum(list_transform(string_split(text,' '), x -> len(x))) AS len_sum,
      |  len(list_filter(string_split(text,' '),
      |      x -> x IN ('the','a','and','of','to','in'))) AS n_stop,
      |  len(list_filter(string_split(text,' '), x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
      |  len(list_distinct(string_split(text,' '))) AS uniq
      | FROM d),
      |g AS (SELECT doc_id, source, text FROM m
      |      WHERE n BETWEEN 10 AND 100000 AND 100*len_sum//n BETWEEN 200 AND 1200
      |        AND n_stop >= 1 AND 100*alpha//n >= 80 AND 100*uniq//n >= 20),
      |k AS (SELECT doc_id, source, text FROM (
      |      SELECT doc_id, source, text,
      |        min(doc_id) OVER (PARTITION BY md5(text)) AS k0 FROM g)
      |      WHERE doc_id = k0),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+1],' ') AS s
      |  FROM (SELECT doc_id, string_split(text,' ') AS w,
      |        unnest(generate_series(1, len(string_split(text,' '))-1)) AS i FROM k)),
      |bm AS (SELECT DISTINCT array_to_string(w[i:i+1],' ') AS s
      |  FROM (SELECT string_split(text,' ') AS w,
      |        unnest(generate_series(1, len(string_split(text,' '))-1)) AS i
      |        FROM documents WHERE doc_id%97=0)),
      |f AS (SELECT doc_id FROM sh JOIN bm USING(s) GROUP BY doc_id HAVING count(*) >= 20),
      |c AS (SELECT * FROM k WHERE doc_id NOT IN (SELECT doc_id FROM f)),
      |s0 AS (SELECT source, count(*)::BIGINT AS n_in FROM d GROUP BY source),
      |s1 AS (SELECT source, count(*)::BIGINT AS n_quality FROM g GROUP BY source),
      |s2 AS (SELECT source, count(*)::BIGINT AS n_kept FROM k GROUP BY source),
      |s3 AS (SELECT source, count(*)::BIGINT AS n_clean FROM c GROUP BY source)
      |SELECT s0.source, n_in, coalesce(n_quality,0)::BIGINT AS n_quality,
      | coalesce(n_kept,0)::BIGINT AS n_kept, coalesce(n_clean,0)::BIGINT AS n_clean
      |FROM s0 LEFT JOIN s1 USING(source) LEFT JOIN s2 USING(source)
      |LEFT JOIN s3 USING(source)""".stripMargin

  /** Mirror of Queries.tokenBpe: same injected text, same RE2 classes. */
  private val tokenBpe: String =
    """WITH d AS (SELECT doc_id,
      |  text||' v'||(doc_id%10)||'.2, end-'||doc_id||'!' AS text FROM documents)
      |SELECT doc_id,
      | len(regexp_extract_all(text, '[a-z]+'))::BIGINT AS n_alpha,
      | len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_num,
      | len(regexp_extract_all(text, '[^a-z0-9 ]'))::BIGINT AS n_punct
      |FROM d""".stripMargin

  /** Mirror of Queries.cosineZipwith over the quantized ints. */
  private val cosineZipwith: String =
    """WITH q AS (SELECT vec_id,
      | list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS qv
      | FROM embeddings)
      |SELECT vec_id,
      | list_sum(list_transform(generate_series(1,64), i -> qv[i]*qv[65-i]))::BIGINT AS dot_rev,
      | list_sum(list_transform(qv, x -> x*x))::BIGINT AS norm2
      |FROM q""".stripMargin

  private val dedupExact: String =
    s"""SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_copies, min(doc_id) AS keeper_id
       |FROM $dupDocs AS d GROUP BY md5(text)""".stripMargin

  /** Mirrors Dedup.minhashPairs INCLUDING the per-bucket cap (10000 lowest
    * doc_ids kept) — the operator and oracle must share the cap semantics,
    * not just happen to agree while fixture buckets are small.
    */
  private val dedupMinhash: String =
    s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS words,
       |  len(string_split(text,' ')) AS m FROM $dupDocs AS d),
       |si AS (SELECT doc_id, words, unnest(generate_series(1, greatest(1, m-2))) AS i FROM w),
       |cx AS (SELECT doc_id, ${hex2int("substr(md5(array_to_string(words[i:i+2],' ')),1,8)")} AS x FROM si),
       |sg AS (SELECT doc_id, hi, min(((2*hi+3)*x + (7*hi+1)) % 2038074743) AS v
       |       FROM cx, (SELECT unnest(generate_series(0,11)) AS hi) hs GROUP BY doc_id, hi),
       |k0 AS (SELECT doc_id, (hi//3)||':'||string_agg(v::VARCHAR, ',' ORDER BY hi) AS key
       |      FROM sg GROUP BY doc_id, hi//3),
       |k AS (SELECT doc_id, key FROM (
       |      SELECT doc_id, key,
       |        row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rk FROM k0)
       |      WHERE rk<=10000)
       |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |FROM k l JOIN k r ON l.key=r.key AND l.doc_id<r.doc_id""".stripMargin

  /** Mirror of Queries.dedupIncremental: the new shard (doc_id%3=0) joins
    * the committed remainder's band keys (committed side capped per key,
    * lowest ids — the BoundedMinIds semantics); flagged incoming docs
    * carry their smallest committed match.
    */
  private val dedupIncremental: String =
    s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS words,
       |  len(string_split(text,' ')) AS m FROM $dupDocs AS d),
       |si AS (SELECT doc_id, words, unnest(generate_series(1, greatest(1, m-2))) AS i FROM w),
       |cx AS (SELECT doc_id, ${hex2int("substr(md5(array_to_string(words[i:i+2],' ')),1,8)")} AS x FROM si),
       |sg AS (SELECT doc_id, hi, min(((2*hi+3)*x + (7*hi+1)) % 2038074743) AS v
       |       FROM cx, (SELECT unnest(generate_series(0,11)) AS hi) hs GROUP BY doc_id, hi),
       |k0 AS (SELECT doc_id, (hi//3)||':'||string_agg(v::VARCHAR, ',' ORDER BY hi) AS key
       |      FROM sg GROUP BY doc_id, hi//3),
       |ke AS (SELECT doc_id, key FROM (
       |      SELECT doc_id, key,
       |        row_number() OVER (PARTITION BY key ORDER BY doc_id) AS rk
       |      FROM k0 WHERE doc_id%3<>0)
       |      WHERE rk<=10000),
       |ki AS (SELECT doc_id, key FROM k0 WHERE doc_id%3=0)
       |SELECT i.doc_id, min(e.doc_id)::BIGINT AS dup_of
       |FROM ki i JOIN ke e ON i.key=e.key
       |GROUP BY i.doc_id""".stripMargin

  /** Mirror of Queries.dedupCluster: connected components of the minhash
    * pair graph via a recursive reachability closure, component = min
    * reachable id. (The closure is O(component^2) rows — fine for the
    * oracle's fixture-sized components; the ENGINE uses label
    * propagation, which is the scalable formulation.)
    */
  private val dedupCluster: String =
    s"""WITH RECURSIVE e AS (
       |  SELECT a AS s, b AS d FROM ( $dedupMinhash ) p
       |  UNION ALL SELECT b AS s, a AS d FROM ( $dedupMinhash ) p2),
       |n AS (SELECT DISTINCT s AS id FROM e),
       |reach(id, r) AS (
       |  SELECT id, id FROM n
       |  UNION
       |  SELECT reach.id, e.d FROM reach JOIN e ON reach.r = e.s)
       |SELECT id AS doc_id, min(r)::BIGINT AS component
       |FROM reach GROUP BY id""".stripMargin

  /** Mirror of Queries.clusterRep: the cluster CTE joined with the
    * quality score over the SAME injected corpus; representative picked
    * by the identical composite key.
    */
  private val clusterRep: String =
    s"""WITH comp AS ( $dedupCluster ),
       |inj AS (SELECT doc_id, text FROM documents
       |        UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100),
       |q AS (SELECT doc_id,
       |  (least(40, n//2) + least(30, 100*n_stop//n) + least(30, (100*uniq//n)//3))::BIGINT AS score
       | FROM (SELECT doc_id, len(string_split(text,' ')) AS n,
       |   len(list_filter(string_split(text,' '), x -> x IN $stopEnSql)) AS n_stop,
       |   len(list_distinct(string_split(text,' '))) AS uniq FROM inj) c)
       |SELECT comp.component, arg_min(comp.doc_id, -q.score * 10000000000 + comp.doc_id)::BIGINT AS rep_id,
       |  count(*)::BIGINT AS n_members, max(q.score)::BIGINT AS rep_score
       |FROM comp JOIN q ON comp.doc_id = q.doc_id
       |GROUP BY comp.component""".stripMargin


  private val dedupSimhash: String =
    s"""WITH e AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
       |c AS (SELECT doc_id, ${hex2int("substr(md5(word),1,8)")} AS x FROM e),
       |bt AS (SELECT doc_id, b, sum(CASE WHEN (x//(1::BIGINT<<b))%2=1 THEN 1 ELSE -1 END) AS s
       |       FROM c, (SELECT unnest(generate_series(0,31)) AS b) bs GROUP BY doc_id, b)
       |SELECT doc_id, sum(CASE WHEN s>0 THEN (1::BIGINT<<b) ELSE 0 END)::BIGINT AS simhash
       |FROM bt GROUP BY doc_id""".stripMargin

  private val dedupEdit: String =
    s"""SELECT cand.a, cand.b, levenshtein(da.text, db.text)::BIGINT AS dist
       |FROM ( $dedupMinhash ) cand
       |JOIN $dupDocs da ON da.doc_id=cand.a
       |JOIN $dupDocs db ON db.doc_id=cand.b
       |WHERE levenshtein(da.text, db.text) <= 20""".stripMargin

  private val decontaminate: String =
    """WITH sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+1],' ') AS s
      | FROM (SELECT doc_id, string_split(text,' ') AS w,
      |       unnest(generate_series(1, len(string_split(text,' '))-1)) AS i FROM documents)),
      |b AS (SELECT DISTINCT s FROM sh WHERE doc_id%97=0)
      |SELECT doc_id, count(*)::BIGINT AS n_shared
      |FROM sh JOIN b USING(s) WHERE doc_id%97<>0
      |GROUP BY doc_id HAVING count(*) >= 20""".stripMargin

  /** Bit-exact mirror of Queries.bloomStatsQ: rebuild the k=2, m=2^20
    * Bloom bitmap with the SAME md5-hex-window positions and the same
    * bit_or/shift/AND arithmetic (two's-complement 64-bit in both
    * engines), then count the corpus shingles whose two bits are set.
    * One wrong bit anywhere in the sketch changes n_candidates.
    */
  private val bloomStats: String = {
    val p1 = s"(${hex2int("substr(md5(s),1,8)")} % 1048576)"
    val p2 = s"(${hex2int("substr(md5(s),9,8)")} % 1048576)"
    // DuckDB's << overflow-checks 1<<63 (Spark's shiftleft wraps): the
    // sign bit needs its literal spelled out
    def bitOf(p: String): String =
      s"(CASE WHEN ($p)%64 = 63 THEN (-9223372036854775807-1)::BIGINT" +
        s" ELSE (1::BIGINT << (($p)%64)::INT) END)"
    s"""WITH sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+1],' ') AS s
       | FROM (SELECT doc_id, string_split(text,' ') AS w,
       |       unnest(generate_series(1, len(string_split(text,' '))-1)) AS i FROM documents)),
       |b AS (SELECT DISTINCT s FROM sh WHERE doc_id%97=0),
       |cor AS (SELECT doc_id, s FROM sh WHERE doc_id%97<>0),
       |bp AS (SELECT $p1 AS p FROM b UNION ALL SELECT $p2 AS p FROM b),
       |bits AS (SELECT p//64 AS w, bit_or(${bitOf("p")}) AS bits FROM bp GROUP BY 1),
       |cp AS (SELECT doc_id, s, $p1 AS p1, $p2 AS p2 FROM cor),
       |cand AS (SELECT cp.doc_id, cp.s FROM cp
       |  JOIN bits b1 ON b1.w = cp.p1//64 AND (b1.bits & ${bitOf("cp.p1")}) <> 0
       |  JOIN bits b2 ON b2.w = cp.p2//64 AND (b2.bits & ${bitOf("cp.p2")}) <> 0)
       |SELECT (SELECT count(*) FROM cor)::BIGINT AS n_shingles,
       |  (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
       |  (SELECT count(*) FROM cand JOIN b USING (s))::BIGINT AS n_confirmed""".stripMargin
  }

  /** Shared by the jaccard queries: injected ubiquitous bigram + distinct
    * shingles + the df>N/10 hot set.
    */
  private val jaccardPrelude: String =
    """WITH d AS (SELECT doc_id, text||' ubiq bigram' AS text FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+1],' ') AS shingle
      | FROM (SELECT doc_id, string_split(text,' ') AS words,
      |       unnest(generate_series(1, len(string_split(text,' '))-1)) AS i FROM d)),
      |cap AS (SELECT count(*)//10 AS cap FROM documents)""".stripMargin

  private val dedupJaccard: String =
    s"""$jaccardPrelude,
      |hot AS (SELECT shingle FROM sh GROUP BY shingle
      |        HAVING count(*) > (SELECT cap FROM cap)),
      |r AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS sz FROM r GROUP BY doc_id),
      |it AS (SELECT p.doc_id AS a, q.doc_id AS b, count(*) AS inter
      |       FROM r p JOIN r q ON p.shingle=q.shingle AND p.doc_id%50=0 AND p.doc_id<>q.doc_id
      |       GROUP BY p.doc_id, q.doc_id)
      |SELECT a, b, inter::BIGINT AS inter, (sa.sz+sb.sz-inter)::BIGINT AS uni
      |FROM it JOIN sz sa ON sa.doc_id=a JOIN sz sb ON sb.doc_id=b
      |WHERE inter*5 >= sa.sz+sb.sz-inter""".stripMargin

  private val jaccardDropped: String =
    s"""$jaccardPrelude,
      |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
      |SELECT sum(CASE WHEN df > (SELECT cap FROM cap) THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
      |       max(df)::BIGINT AS max_df FROM df""".stripMargin

  /** Quantized-embedding prelude shared by cosine queries. */
  private val quantEmb: String =
    """WITH q AS (SELECT vec_id,
      |  list_transform(embedding, x -> round(x::DOUBLE*1000)::BIGINT) AS qv
      | FROM embeddings)""".stripMargin

  /** Cosine over quantized vectors; zero-norm vectors yield 0.0 exactly like
    * Knn.cosineQ (a bare divide would produce a non-finite DuckDB value and
    * diverge).
    */
  private def cosExpr(a: String, b: String): String =
    s"""(CASE WHEN list_sum(list_transform($a, x->x*x))=0
       |       OR list_sum(list_transform($b, x->x*x))=0 THEN 0.0
       | ELSE list_sum(list_transform(generate_series(1,64), i -> $a[i]*$b[i]))::DOUBLE /
       |  (sqrt(list_sum(list_transform($a, x->x*x))::DOUBLE) *
       |   sqrt(list_sum(list_transform($b, x->x*x))::DOUBLE)) END)""".stripMargin

  private val dedupCosine: String =
    s"""$quantEmb,
       |pr AS (SELECT vec_id AS a, qv AS pa FROM q WHERE vec_id%50=0)
       |SELECT a, vec_id AS b FROM pr, q
       |WHERE a<>vec_id AND ${cosExpr("pa", "qv")} >= 0.3""".stripMargin

  private val knnBrute: String =
    s"""$quantEmb,
       |pr AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id%100=0),
       |sc AS (SELECT probe_id, vec_id AS neighbor_id, ${cosExpr("pq", "qv")} AS cos
       |       FROM pr, q WHERE probe_id<>vec_id),
       |r AS (SELECT probe_id, neighbor_id,
       |      row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM sc)
       |SELECT probe_id, rk::BIGINT AS rnk, neighbor_id FROM r WHERE rk<=5""".stripMargin

  /** Multi-table LSH mirror of Knn.lshTopK: BitsPerTable=3 sign bits per
    * table, NumTables=10 tables (plane index = t*3+p), per-(t,bucket) cap
    * 10000 by lowest vec_id, OR-amplified distinct candidates, exact cosine
    * top-5.
    */
  private val knnLsh: String =
    s"""$quantEmb,
       |dot AS (SELECT vec_id, t, p,
       |  list_sum(list_transform(generate_series(1,64),
       |    i -> ((((t*3+p)*64+(i-1))*2654435761)%65536-32768)*qv[i])) AS d
       |  FROM q, (SELECT unnest(generate_series(0,9)) AS t) ts,
       |          (SELECT unnest(generate_series(0,2)) AS p) ps),
       |mem AS (SELECT vec_id, t, sum(CASE WHEN d>0 THEN (1::BIGINT<<p) ELSE 0 END)::BIGINT AS bucket
       |        FROM dot GROUP BY vec_id, t),
       |cap AS (SELECT vec_id, t, bucket FROM (
       |        SELECT vec_id, t, bucket,
       |          row_number() OVER (PARTITION BY t, bucket ORDER BY vec_id) AS rk FROM mem)
       |        WHERE rk<=10000),
       |pb AS (SELECT vec_id AS probe_id, t, bucket FROM mem WHERE vec_id%100=0),
       |cand AS (SELECT DISTINCT probe_id, c.vec_id AS neighbor_id
       |         FROM pb JOIN cap c USING(t, bucket) WHERE probe_id<>c.vec_id),
       |sc AS (SELECT probe_id, neighbor_id, ${cosExpr("pq", "qv")} AS cos
       |       FROM cand
       |       JOIN (SELECT vec_id, qv FROM q) cq ON cq.vec_id=neighbor_id
       |       JOIN (SELECT vec_id AS probe_id, qv AS pq FROM q) pq USING(probe_id)),
       |r AS (SELECT probe_id, neighbor_id,
       |      row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM sc)
       |SELECT probe_id, rk::BIGINT AS rnk, neighbor_id FROM r WHERE rk<=5""".stripMargin

  /** Mirror of Knn.semanticDedup: IVF-quantizer assignment (16 lowest-id
    * seeds, ties to the lowest list), then duplicate = any lower-id
    * cluster-mate at cosine >= 0.3.
    */
  private val dedupSemantic: String =
    s"""$quantEmb,
       |sd AS (SELECT vec_id AS list_id, qv AS sv FROM q ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, list_id, qv FROM (
       |  SELECT q.vec_id, sd.list_id, q.qv,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosExpr("qv", "sv")} DESC, sd.list_id) AS rk
       |  FROM q CROSS JOIN sd) WHERE rk=1),
       |dup AS (SELECT DISTINCT a.vec_id
       |        FROM asg a JOIN asg b ON a.list_id=b.list_id AND b.vec_id<a.vec_id
       |        WHERE ${cosExpr("a.qv", "b.qv")} >= 0.3)
       |SELECT a.vec_id, a.list_id::BIGINT AS cluster,
       |  (CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM asg a LEFT JOIN dup d USING(vec_id)""".stripMargin

  /** IVF-flat mirror of Knn.ivfTopK: 16 lowest-id seed lists, exact-cosine
    * assignment (ties to lowest list id), probes search their 8 nearest
    * lists, exact top-5 within candidates.
    */
  private val knnIvf: String =
    s"""$quantEmb,
       |sd AS (SELECT vec_id AS list_id, qv AS sv FROM q ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, list_id FROM (
       |  SELECT q.vec_id, sd.list_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosExpr("qv", "sv")} DESC, sd.list_id) AS rk
       |  FROM q CROSS JOIN sd) WHERE rk=1),
       |pr AS (SELECT vec_id AS probe_id, qv AS pq FROM q WHERE vec_id%100=0),
       |pl AS (SELECT probe_id, list_id FROM (
       |  SELECT pr.probe_id, sd.list_id,
       |    row_number() OVER (PARTITION BY pr.probe_id
       |      ORDER BY ${cosExpr("pq", "sv")} DESC, sd.list_id) AS rk
       |  FROM pr CROSS JOIN sd) WHERE rk<=8),
       |cand AS (SELECT probe_id, a.vec_id AS neighbor_id
       |         FROM pl JOIN asg a USING(list_id) WHERE a.vec_id<>probe_id),
       |sc AS (SELECT probe_id, neighbor_id, ${cosExpr("pq", "qv")} AS cos
       |       FROM cand
       |       JOIN (SELECT vec_id, qv FROM q) cq ON cq.vec_id=neighbor_id
       |       JOIN (SELECT vec_id AS probe_id, qv AS pq FROM q) pq USING(probe_id)),
       |r AS (SELECT probe_id, neighbor_id,
       |      row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rk FROM sc)
       |SELECT probe_id, rk::BIGINT AS rnk, neighbor_id FROM r WHERE rk<=5""".stripMargin

  /** Mirror of Knn.ivfStats derivation: nLists = max(16, ceil(sqrt(N))),
    * nProbe = max(2, nLists/8) — sqrt/ceil are IEEE-exact on both engines.
    * assign_scan mirrors Knn.assignScanBound: the flat coarse scan up to
    * 4096 lists, the two-level sqrt(nLists) bound above it.
    */
  private val ivfStats: String =
    """WITH n AS (SELECT count(*)::BIGINT AS n_vecs FROM embeddings),
      |p AS (SELECT n_vecs, greatest(16, ceil(sqrt(n_vecs::DOUBLE))::BIGINT) AS n_lists FROM n),
      |q AS (SELECT n_vecs, n_lists, greatest(2, n_lists//8) AS n_probe FROM p)
      |SELECT n_vecs, n_lists::BIGINT AS n_lists, n_probe::BIGINT AS n_probe,
      | (n_vecs//n_lists)::BIGINT AS avg_list_size,
      | (100*n_probe//n_lists)::BIGINT AS selectivity_pct,
      | (CASE WHEN n_lists <= 4096 THEN n_lists
      |       ELSE ceil(sqrt(n_lists::DOUBLE))::BIGINT
      |            + 2*((n_lists + ceil(sqrt(n_lists::DOUBLE))::BIGINT - 1)
      |                 // ceil(sqrt(n_lists::DOUBLE))::BIGINT) END)::BIGINT AS assign_scan
      |FROM q""".stripMargin

  /** Mirror of Knn.deriveBits/lshStats: smallest b in [3,24] with
    * n/2^b <= 1000 — integer arithmetic only, no float log.
    */
  private val lshStats: String =
    """WITH n AS (SELECT count(*)::BIGINT AS n_vecs FROM embeddings),
      |b AS (SELECT n_vecs, coalesce(
      |        (SELECT min(x) FROM (SELECT unnest(generate_series(3,24)) AS x)
      |         WHERE n_vecs//(1::BIGINT<<x) <= 1000), 24) AS bits FROM n)
      |SELECT n_vecs, bits::BIGINT AS bits, 10::BIGINT AS tables,
      | (1::BIGINT<<bits)::BIGINT AS buckets_per_table,
      | (n_vecs//(1::BIGINT<<bits))::BIGINT AS expected_occupancy
      |FROM b""".stripMargin

  private val eventsWindow: String =
    """SELECT strftime(to_timestamp((floor(epoch(ts))::BIGINT//300)*300) AT TIME ZONE 'UTC',
      |  '%Y-%m-%d %H:%M:%S') AS win, event_type,
      | count(*)::BIGINT AS n, sum(floor(value*100)::BIGINT)::BIGINT AS cents
      |FROM events GROUP BY 1, 2""".stripMargin

  private val sessionize: String =
    """WITH x AS (SELECT user_id, event_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM events),
      |s AS (SELECT user_id, event_id, ts,
      |  sum(CASE WHEN pts IS NULL OR floor(epoch(ts))::BIGINT - floor(epoch(pts))::BIGINT > 1800
      |      THEN 1 ELSE 0 END)
      |  OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x)
      |SELECT user_id, sid::BIGINT AS session_id, count(*)::BIGINT AS n_events,
      | strftime(min(ts),'%Y-%m-%d %H:%M:%S') AS start_ts,
      | strftime(max(ts),'%Y-%m-%d %H:%M:%S') AS end_ts
      |FROM s GROUP BY user_id, sid""".stripMargin

  private val exprCode32: String =
    s"""SELECT doc_id, ${hex2int("substr(md5(text),1,8)")} AS code FROM documents"""

  /** Mirror of Queries.importanceSample: hash draw under capped-length
    * weight.
    */
  private val importanceSample: String = {
    val draw = s"(${hex2int("substr(md5(text),1,8)")} % 256)"
    s"""SELECT doc_id,
       | LEAST(255, len(string_split(text,' ')))::BIGINT AS weight,
       | $draw::BIGINT AS draw,
       | (CASE WHEN $draw < LEAST(255, len(string_split(text,' '))) THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM documents""".stripMargin
  }

  /** Mirror of Queries.domainBalance: hash domains, per-domain counts,
    * inverse-frequency keep thresholds off the global min count.
    */
  private val domainBalance: String = {
    val domain = s"(${hex2int("substr(md5(text),1,8)")} % 16)"
    val draw = s"(${hex2int("substr(md5(text || '~draw'),1,8)")} % 256)"
    s"""WITH d AS (SELECT doc_id, $domain::BIGINT AS domain, $draw::BIGINT AS draw
       |           FROM documents),
       |c AS (SELECT domain, count(*)::BIGINT AS n_domain FROM d GROUP BY domain),
       |m AS (SELECT min(n_domain) AS min_cnt FROM c)
       |SELECT doc_id, domain, n_domain,
       | LEAST(256, (min_cnt * 256) // n_domain)::BIGINT AS threshold,
       | (CASE WHEN draw < LEAST(256, (min_cnt * 256) // n_domain)
       |       THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM d JOIN c USING (domain) CROSS JOIN m""".stripMargin
  }

  /** Mirror of Queries.embedQuant: the identical double-precision
    * quantization expression (x*127.0/s + 0.5 floored — single IEEE ops,
    * no reassociation), integer stats of the quantized vectors.
    */
  private val embedQuant: String =
    """WITH q AS (SELECT vec_id,
      |  len(embedding)::BIGINT AS n_dims,
      |  list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS s,
      |  embedding FROM embeddings),
      |t AS (SELECT vec_id, n_dims,
      |  list_transform(embedding, x -> CASE WHEN s = 0 THEN 0
      |    ELSE floor(x::DOUBLE * 127.0 / s + 0.5)::BIGINT END) AS qs
      | FROM q)
      |SELECT vec_id, n_dims,
      |  list_min(qs)::BIGINT AS q_min,
      |  list_max(qs)::BIGINT AS q_max,
      |  list_sum(qs)::BIGINT AS q_sum,
      |  list_sum(list_transform(qs, qq -> qq * qq))::BIGINT AS q_norm2
      |FROM t""".stripMargin

  /** Mirror of Queries.domainMix: alpha=1/2 temperature thresholds over
    * floor(sqrt(n_domain)) — IEEE sqrt is identical in both engines.
    */
  private val domainMix: String = {
    val domain = s"(${hex2int("substr(md5(text),1,8)")} % 16)"
    val draw = s"(${hex2int("substr(md5(text || '~mixdraw'),1,8)")} % 256)"
    s"""WITH d AS (SELECT doc_id, $domain::BIGINT AS domain, $draw::BIGINT AS draw
       |           FROM documents),
       |c AS (SELECT domain, count(*)::BIGINT AS n_domain FROM d GROUP BY domain),
       |m AS (SELECT min(n_domain) AS min_cnt FROM c)
       |SELECT doc_id, domain, n_domain,
       | LEAST(256, (CAST(floor(sqrt(min_cnt)) AS BIGINT) * 256)
       |   // CAST(floor(sqrt(n_domain)) AS BIGINT))::BIGINT AS threshold,
       | (CASE WHEN draw < LEAST(256, (CAST(floor(sqrt(min_cnt)) AS BIGINT) * 256)
       |   // CAST(floor(sqrt(n_domain)) AS BIGINT)) THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM d JOIN c USING (domain) CROSS JOIN m""".stripMargin
  }

  /** Mirror of Queries.packSequences: per-bucket running token sum into
    * capacity-256 bins.
    */
  private val packSequences: String = {
    val bucket = s"(${hex2int("substr(md5(text),1,8)")} % nb)"
    s"""WITH cnt AS (SELECT GREATEST(100, (count(*) + 999) // 1000) AS nb FROM documents),
       |t AS (SELECT doc_id, $bucket::BIGINT AS bucket,
       |  len(string_split(text,' '))::BIGINT AS n_tok FROM documents, cnt),
       |c AS (SELECT doc_id, bucket, n_tok,
       |  sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
       |SELECT doc_id, bucket, n_tok, cum::BIGINT AS cum,
       |  ((cum - n_tok) // 256)::BIGINT AS bin FROM c""".stripMargin
  }

  /** Mirror of Queries.codecExplode: xz and lz4 text members, plus the
    * %86 snappy-wrapped zip recomputed like the other codec-nested zips.
    */
  private val codecExplode: String =
    """WITH z AS (SELECT doc_id, sha256(doc_id::VARCHAR) AS rid
      |           FROM documents WHERE doc_id%43=0),
      |n AS (SELECT doc_id, rid,
      |  sha256('64:'||sha256('5:s.txt'||octet_length(encode('sinner '||doc_id))||':sinner '||doc_id)
      |    ||'64:'||rid||'1:4'||'0:'||'0:') AS ns
      | FROM z WHERE doc_id%86=0)
      |SELECT doc_id, rid AS node_id, '' AS parent_id, 0 AS level, '' AS txt,
      |       'empty-file' AS reason FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('xzp '||doc_id)||'64:'||rid||'1:0'||'0:'||'0:'),
      |  rid, 1, 'xzp '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('lzf '||doc_id)||'64:'||rid||'1:1'||'0:'||'0:'),
      |  rid, 1, 'lzf '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('unz '||doc_id)||'64:'||rid||'1:2'||'0:'||'0:'),
      |  rid, 1, 'unz '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('lzm '||doc_id)||'64:'||rid||'1:3'||'0:'||'0:'),
      |  rid, 1, 'lzm '||doc_id, '' FROM z
      |UNION ALL SELECT doc_id, ns, rid, 1, '', 'empty-file' FROM n
      |UNION ALL SELECT doc_id,
      |  sha256('64:'||sha256('sinner '||doc_id)||'64:'||ns||'1:0'||'0:'||'5:s.txt'),
      |  ns, 2, 'sinner '||doc_id, '' FROM n""".stripMargin

  /** Mirror of Queries.splitAssign: content-hash bucket + split label. */
  /** Mirror of Queries.corpusCard: quality/lang/split/dup signals joined
    * in one aggregation, all integer-exact.
    */
  private val corpusCard: String = {
    val bucket = s"(${hex2int("substr(md5(text),1,8)")} % 100)"
    s"""WITH q AS (SELECT doc_id, text,
       |  len(string_split(text,' ')) AS n,
       |  len(list_filter(string_split(text,' '), x -> x IN $stopEnSql)) AS en,
       |  len(list_filter(string_split(text,' '), x -> x IN $stopFrSql)) AS fr,
       |  len(list_filter(string_split(text,' '), x -> x IN $stopDeSql)) AS de,
       |  len(list_distinct(string_split(text,' '))) AS uniq FROM documents),
       |s AS (SELECT doc_id, text, n::BIGINT AS n_tokens,
       |  (least(40, n//2) + least(30, 100*en//n) + least(30, (100*uniq//n)//3))::BIGINT AS score,
       |  CASE WHEN en>=fr AND en>=de AND en>0 THEN 'en'
       |       WHEN fr>=de AND fr>0 THEN 'fr' WHEN de>0 THEN 'de' ELSE 'und' END AS lang,
       |  CASE WHEN $bucket < 80 THEN 'train'
       |       WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split FROM q)
       |SELECT split, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
       |  (sum(score) * 100 // count(*))::BIGINT AS score_x100,
       |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
       |  (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_dup_docs
       |FROM s GROUP BY split""".stripMargin
  }

  private val splitAssign: String = {
    val bucket = s"(${hex2int("substr(md5(text),1,8)")} % 100)"
    s"""SELECT doc_id, $bucket::BIGINT AS bucket,
       | CASE WHEN $bucket < 80 THEN 'train'
       |      WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Mirror of Queries.robotsFilterQ: longest-match REP decisions over
    * the three synthetic hosts' rules.
    */
  private val robotsFilter: String =
    """SELECT doc_id,
      | (CASE WHEN doc_id%7=0 THEN 'ftp' ELSE 'http' END) || '://' ||
      | (CASE doc_id%3 WHEN 0 THEN 'good.example' WHEN 1 THEN 'spam.example'
      |       ELSE 'sub.bad.example' END) ||
      | '/p' || doc_id || (CASE WHEN doc_id%5=0 THEN '?track=1' ELSE '' END) AS url,
      | CASE WHEN doc_id%3=1 THEN 'blocked'
      |      WHEN doc_id%3=0 AND doc_id::VARCHAR LIKE '1%'
      |           AND doc_id::VARCHAR NOT LIKE '12%' THEN 'blocked'
      |      ELSE 'fetch' END AS verdict,
      | CASE WHEN doc_id%3=1 THEN '/'
      |      WHEN doc_id%3=0 AND doc_id::VARCHAR LIKE '12%' THEN '/p12'
      |      WHEN doc_id%3=0 AND doc_id::VARCHAR LIKE '1%' THEN '/p1'
      |      ELSE '' END AS rule
      |FROM documents""".stripMargin

  /** Mirror of Queries.urlDedupQ: the canonical form recomputes
    * ARITHMETICALLY from doc_id (the messy-URL construction is
    * deterministic), so every normalization rule — case, default port,
    * fragment, tracking params, trailing slash, kept real params — is
    * hash-checked: a missed rule splits a group and changes the counts.
    */
  private val urlDedup: String =
    """SELECT 'http://'
      |  ||(CASE WHEN doc_id%23=0 THEN 'User@' ELSE '' END)
      |  ||'site'||((doc_id%100)%10)||'.example/p'||(doc_id%100)
      |  ||(CASE WHEN doc_id%17=0 AND doc_id%19=0 THEN '?id=7&pfbclid=9'
      |          WHEN doc_id%17=0 THEN '?id=7'
      |          WHEN doc_id%19=0 THEN '?pfbclid=9'
      |          ELSE '' END) AS canon_url,
      | count(*)::BIGINT AS n_copies, min(doc_id)::BIGINT AS keeper_id
      |FROM documents GROUP BY 1""".stripMargin

  /** Mirror of Queries.urlFilterQ: the deterministic crawl URLs with the
    * rule cascade (scheme, domain suffix, keyword) and first-matching
    * reason.
    */
  private val urlFilter: String =
    """WITH u AS (SELECT doc_id,
      |  (CASE WHEN doc_id%7=0 THEN 'ftp' ELSE 'http' END)||'://'||
      |  (CASE doc_id%3 WHEN 0 THEN 'good.example' WHEN 1 THEN 'spam.example'
      |        ELSE 'sub.bad.example' END)||
      |  '/p'||doc_id||(CASE WHEN doc_id%5=0 THEN '?track=1' ELSE '' END) AS url
      | FROM documents),
      |h AS (SELECT doc_id, url,
      |       regexp_extract(lower(url), '^https?://([^/?#]+)', 1) AS host FROM u),
      |r AS (SELECT doc_id, url, host,
      |  CASE WHEN host='' THEN 'bad-scheme'
      |       WHEN host='spam.example' OR host LIKE '%.spam.example'
      |         OR host='bad.example' OR host LIKE '%.bad.example' THEN 'blocked-domain'
      |       WHEN lower(url) LIKE '%track%' THEN 'blocked-keyword'
      |       ELSE '' END AS reason FROM h)
      |SELECT doc_id, url, host, reason,
      |  (CASE WHEN reason='' THEN 1 ELSE 0 END)::BIGINT AS kept FROM r""".stripMargin

  /** Mirror of Queries.webFunnel: every stage count recomputed — url
    * rules (%3 host class, %5 keyword, %7 scheme), first-owner content
    * dedup, bigram decontamination vs the %97 benchmark.
    */
  private val webFunnel: String =
    """WITH p AS (SELECT doc_id,
      |  trim('warc body '||array_to_string(string_split(text,' ')[1:2],' ')) AS content,
      |  array_to_string(string_split(text,' ')[1:2],' ') AS tail
      | FROM documents),
      |k AS (SELECT doc_id, content FROM p
      |      WHERE doc_id%7<>0 AND doc_id%3=0 AND doc_id%5<>0),
      |u AS (SELECT doc_id, content FROM k
      |      WHERE doc_id = (SELECT min(doc_id) FROM k k2 WHERE k2.content = k.content)),
      |bg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+1],' ') AS bg
      |       FROM (SELECT doc_id, string_split(tail,' ') AS w,
      |             len(string_split(tail,' ')) AS m FROM p),
      |       LATERAL unnest(generate_series(1, m-1)) AS t(i)),
      |bench AS (SELECT DISTINCT bg FROM bg WHERE doc_id%97=0),
      |flagged AS (SELECT DISTINCT b.doc_id FROM bg b
      |            JOIN bench USING(bg) JOIN u USING(doc_id)),
      |clean AS (SELECT doc_id FROM u WHERE doc_id%97<>0
      |          AND doc_id NOT IN (SELECT doc_id FROM flagged))
      |SELECT (SELECT count(*) FROM p)::BIGINT AS n_pages,
      |       (SELECT count(*) FROM k)::BIGINT AS n_url_kept,
      |       (SELECT count(*) FROM u)::BIGINT AS n_unique,
      |       (SELECT count(*) FROM clean)::BIGINT AS n_clean""".stripMargin

  /** Mirror of Queries.wordFreqScore: corpus unigram counts joined back,
    * mean frequency x100 in integer arithmetic.
    */
  /** Mirror of Queries.rareTerms: df over deduped doc-terms, per-doc
    * top-3 by (df, term).
    */
  /** Mirror of Queries.bpeMerges: two unrolled merge rounds — pair counts
    * weighted by word frequency over double-separator sequences, top pair
    * by (count DESC, lhs, rhs), merge applied by the same boundary-sharing
    * `replace`.
    */
  private val bpeMerges: String =
    """WITH w AS (SELECT word, count(*)::BIGINT AS freq FROM (
      |    SELECT unnest(string_split(text,' ')) AS word FROM documents)
      |  WHERE word <> '' GROUP BY word),
      |s0 AS (SELECT freq, chr(1)||chr(1) ||
      |         array_to_string(string_split(word,''), chr(1)||chr(1)) ||
      |         chr(1)||chr(1) AS seq FROM w),
      |p1 AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, sum(freq)::BIGINT AS cnt FROM (
      |    SELECT freq, list_filter(string_split(seq, chr(1)||chr(1)), x -> x <> '') AS syms
      |    FROM s0), LATERAL unnest(generate_series(1, len(syms)-1)) AS t(i)
      |  GROUP BY 1, 2),
      |m1 AS (SELECT lhs, rhs, cnt FROM p1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      |s1 AS (SELECT s0.freq, replace(s0.seq,
      |         chr(1)||m1.lhs||chr(1)||chr(1)||m1.rhs||chr(1),
      |         chr(1)||m1.lhs||m1.rhs||chr(1)) AS seq FROM s0, m1),
      |p2 AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs, sum(freq)::BIGINT AS cnt FROM (
      |    SELECT freq, list_filter(string_split(seq, chr(1)||chr(1)), x -> x <> '') AS syms
      |    FROM s1), LATERAL unnest(generate_series(1, len(syms)-1)) AS t(i)
      |  GROUP BY 1, 2),
      |m2 AS (SELECT lhs, rhs, cnt FROM p2 ORDER BY cnt DESC, lhs, rhs LIMIT 1)
      |SELECT 1::BIGINT AS merge_rank, lhs, rhs, cnt FROM m1
      |UNION ALL SELECT 2::BIGINT, lhs, rhs, cnt FROM m2""".stripMargin

  private val rareTerms: String =
    """WITH t AS (SELECT DISTINCT doc_id, term FROM (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
      |  WHERE term <> ''),
      |d AS (SELECT term, count(*) AS df FROM t GROUP BY term),
      |r AS (SELECT t.doc_id, t.term, d.df,
      |  row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.term) AS rnk
      |  FROM t JOIN d USING(term))
      |SELECT doc_id, term, df, rnk::BIGINT AS rnk FROM r WHERE rnk <= 3""".stripMargin

  /** Mirror of Queries.chunkOverlap: 8-word windows at stride 4. */
  private val chunkOverlap: String =
    """WITH p AS (SELECT doc_id, string_split(text,' ') AS w,
      |  len(string_split(text,' ')) AS m FROM documents)
      |SELECT doc_id, i::BIGINT AS chunk_idx,
      |  array_to_string(w[4*i+1:4*i+8],' ') AS chunk,
      |  least(8, m - 4*i)::BIGINT AS n_words
      |FROM p, LATERAL unnest(generate_series(0, (m-1)//4)) AS t(i)""".stripMargin

  private val wordFreq: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      |w2 AS (SELECT doc_id, w FROM w WHERE w <> ''),
      |c AS (SELECT w, count(*) AS cnt FROM w2 GROUP BY w)
      |SELECT doc_id, count(*)::BIGINT AS n_words, sum(cnt)::BIGINT AS freq_sum,
      |  ((sum(cnt)*100)//count(*))::BIGINT AS mean_freq_x100
      |FROM w2 JOIN c USING (w) GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.surprisalScore: per-token bit length of
    * total/count (ilog2 surrogate), summed per doc, mean x100 integral.
    */
  private val surprisal: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      |w2 AS (SELECT doc_id, w FROM w WHERE w <> ''),
      |c AS (SELECT w, count(*) AS cnt FROM w2 GROUP BY w),
      |t AS (SELECT sum(cnt) AS total FROM c)
      |SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |  sum(length(bin(total//cnt)))::BIGINT AS surprisal_bits,
      |  ((sum(length(bin(total//cnt)))*100)//count(*))::BIGINT AS mean_bits_x100
      |FROM w2 JOIN c USING (w) CROSS JOIN t GROUP BY doc_id""".stripMargin

  /** Add-one-smoothed bigram-LM scoring mirror of SparkEntry.perplexity:
    * bigrams via lag() over ordinality-positioned tokens of the
    * empty-filtered split list (the same adjacency the Spark slice+zip
    * produces), Laplace surprisal as length(bin((c1+V)//(c2+1))).
    */
  private val perplexitySql: String =
    """WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      |            FROM documents),
      |tok AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos FROM ws),
      |bg AS (SELECT doc_id, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1, w AS w2
      |       FROM tok),
      |bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w1 IS NOT NULL),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg2 GROUP BY w1, w2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg2 GROUP BY w1),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok)
      |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |  sum(length(bin((c1 + v) // (c2 + 1))))::BIGINT AS ppl_bits,
      |  ((sum(length(bin((c1 + v) // (c2 + 1)))) * 100) // count(*))::BIGINT AS mean_bits_x100
      |FROM bg2 JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      |GROUP BY doc_id""".stripMargin

  /** Mirror of Queries.pplBuckets: exact terciles of the bigram-LM score
    * via histogram + cumulative sum over the distinct score values; low
    * perplexity = head (the CCNet keep-slice).
    */
  private val pplBucketsSql: String =
    s"""WITH s AS ($perplexitySql),
       |p AS (SELECT doc_id, mean_bits_x100 AS ppl FROM s),
       |h AS (SELECT ppl, count(*) AS c FROM p GROUP BY 1),
       |ct AS (SELECT sum(c) AS cnt FROM h),
       |cu AS (SELECT ppl, sum(c) OVER (ORDER BY ppl) AS cum FROM h),
       |t AS (SELECT min(CASE WHEN cum*3 >= cnt THEN ppl END) AS t1,
       |             min(CASE WHEN cum*3 >= cnt*2 THEN ppl END) AS t2
       |      FROM cu CROSS JOIN ct)
       |SELECT doc_id, ppl,
       |  CASE WHEN ppl <= t1 THEN 'head' WHEN ppl <= t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM p CROSS JOIN t""".stripMargin

  /** BIGINT value of the idx-th (1-based) UTF-8 BYTE of `textExpr` — byte
    * semantics matching Media's binary processing (ord()/substr() would use
    * character semantics and diverge on non-ASCII).
    */
  private def byteAt(textExpr: String, idx: String): String = {
    val hex = s"lower(to_hex(encode($textExpr)))"
    s"((strpos('0123456789abcdef',substr($hex,2*($idx)-1,1))::BIGINT-1)*16" +
      s" + (strpos('0123456789abcdef',substr($hex,2*($idx),1))::BIGINT-1))"
  }

  private val mediaMeta: String =
    s"""SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       | ${byteAt("text", "1")}::BIGINT AS magic,
       | (64 + (${byteAt("text", "1")}%8)*16)::BIGINT AS width,
       | (64 + (${byteAt("text", "2")}%8)*16)::BIGINT AS height,
       | (1 + octet_length(encode(text))//64)::BIGINT AS n_frames,
       | greatest(16, (64 + (${byteAt("text", "1")}%8)*16)//4)::BIGINT AS thumb_w,
       | greatest(16, (64 + (${byteAt("text", "2")}%8)*16)//4)::BIGINT AS thumb_h
       |FROM documents""".stripMargin

  /** Expected REAL-PNG decode output, recomputed arithmetically (the PNG is
    * lossless and solid-colored, so decode/resize must recover exactly
    * these values from the bytes).
    */
  /** Mirror of Queries.dedupPhash: the dHash bits AND the clusters
    * recomputed arithmetically from the fixture formula (affine walk over
    * Z/9, a = a unit chosen by g%6, b = (g*5+3)%9; bit(r,c) =
    * [(a*(r*10+c)+b) mod 9 < 9-a]; variant 3 inverts exactly bit(0,0)).
    * The engine only matches if its REAL decode -> area-average -> dHash
    * recovered the same 64 bits from PNG/JPEG bytes and its LSH + Hamming
    * clustering grouped exactly the 12 patterns.
    */
  private val dedupPhash: String =
    """WITH imgs AS (
      |  SELECT doc_id,
      |    ((doc_id//17)//4) % 12 AS g,
      |    (doc_id//17) % 4 AS v
      |  FROM documents WHERE doc_id%17=0
      |), params AS (
      |  SELECT doc_id, g, v,
      |    CASE (g%6) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
      |               WHEN 3 THEN 5 WHEN 4 THEN 7 ELSE 8 END AS a,
      |    (g*5+3)%9 AS b
      |  FROM imgs
      |), bits AS (
      |  SELECT p.doc_id, p.g, r.r, c.c,
      |    CASE WHEN p.v = 3 AND r.r = 0 AND c.c = 0
      |      THEN CASE WHEN p.b < 9 - p.a THEN 0 ELSE 1 END
      |      ELSE CASE WHEN (p.a*(r.r*10 + c.c) + p.b) % 9 < 9 - p.a
      |                THEN 1 ELSE 0 END
      |    END AS bit
      |  FROM params p, range(8) AS r(r), range(8) AS c(c)
      |), hashes AS (
      |  SELECT doc_id, g,
      |    SUM(CASE WHEN r >= 4
      |      THEN bit * (1::BIGINT << CAST((r-4)*8 + c AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_hi,
      |    SUM(CASE WHEN r < 4
      |      THEN bit * (1::BIGINT << CAST(r*8 + c AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_lo
      |  FROM bits GROUP BY doc_id, g
      |), grp AS (
      |  SELECT g, MIN(doc_id) AS rep_id, COUNT(*) AS n_cluster
      |  FROM hashes GROUP BY g
      |)
      |SELECT h.doc_id, h.hash_hi, h.hash_lo, grp.rep_id, grp.n_cluster
      |FROM hashes h JOIN grp USING (g)""".stripMargin

  /** Mirror of Queries.dedupAudiofp: the 63 energy-contour bits and the
    * clusters recomputed from the fixture formula (same affine-walk
    * family as dedupPhash, on the time axis; variant 3 inverts exactly
    * bit 0). The engine only matches if the real WAV decode recovered
    * the per-frame loudness ordering across the resample/gain variants.
    */
  private val dedupAudiofp: String =
    """WITH clips AS (
      |  SELECT doc_id,
      |    ((doc_id//19)//4) % 12 AS g,
      |    (doc_id//19) % 4 AS v
      |  FROM documents WHERE doc_id%19=0
      |), params AS (
      |  SELECT doc_id, g, v,
      |    CASE (g%6) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
      |               WHEN 3 THEN 5 WHEN 4 THEN 7 ELSE 8 END AS a,
      |    (g*5+3)%9 AS b
      |  FROM clips
      |), bits AS (
      |  SELECT p.doc_id, p.g, i.i,
      |    CASE WHEN p.v = 3 AND i.i = 0
      |      THEN CASE WHEN p.b < 9 - p.a THEN 0 ELSE 1 END
      |      ELSE CASE WHEN (p.a*i.i + p.b) % 9 < 9 - p.a THEN 1 ELSE 0 END
      |    END AS bit
      |  FROM params p, range(63) AS i(i)
      |), hashes AS (
      |  SELECT doc_id, g,
      |    SUM(CASE WHEN i >= 32
      |      THEN bit * (1::BIGINT << CAST(i - 32 AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_hi,
      |    SUM(CASE WHEN i < 32
      |      THEN bit * (1::BIGINT << CAST(i AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_lo
      |  FROM bits GROUP BY doc_id, g
      |), grp AS (
      |  SELECT g, MIN(doc_id) AS rep_id, COUNT(*) AS n_cluster
      |  FROM hashes GROUP BY g
      |)
      |SELECT h.doc_id, h.hash_hi, h.hash_lo, grp.rep_id, grp.n_cluster
      |FROM hashes h JOIN grp USING (g)""".stripMargin

  /** Mirror of Queries.dedupVideofp: the keyframe dHash IS the pattern
    * hash of dedupPhash (same affine-walk bits; variant 3 inverts exactly
    * bit(0,0)), recomputed with the %29 layout. The engine only matches
    * if the RIFF walk found the first '00dc' frame, decoded the real
    * JPEG, and recovered the 64 bits at both block scales.
    */
  private val dedupVideofp: String =
    """WITH clips AS (
      |  SELECT doc_id,
      |    ((doc_id//29)//4) % 12 AS g,
      |    (doc_id//29) % 4 AS v
      |  FROM documents WHERE doc_id%29=0
      |), params AS (
      |  SELECT doc_id, g, v,
      |    CASE (g%6) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
      |               WHEN 3 THEN 5 WHEN 4 THEN 7 ELSE 8 END AS a,
      |    (g*5+3)%9 AS b
      |  FROM clips
      |), bits AS (
      |  SELECT p.doc_id, p.g, r.r, c.c,
      |    CASE WHEN p.v = 3 AND r.r = 0 AND c.c = 0
      |      THEN CASE WHEN p.b < 9 - p.a THEN 0 ELSE 1 END
      |      ELSE CASE WHEN (p.a*(r.r*10 + c.c) + p.b) % 9 < 9 - p.a
      |                THEN 1 ELSE 0 END
      |    END AS bit
      |  FROM params p, range(8) AS r(r), range(8) AS c(c)
      |), hashes AS (
      |  SELECT doc_id, g,
      |    SUM(CASE WHEN r >= 4
      |      THEN bit * (1::BIGINT << CAST((r-4)*8 + c AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_hi,
      |    SUM(CASE WHEN r < 4
      |      THEN bit * (1::BIGINT << CAST(r*8 + c AS INTEGER))
      |      ELSE 0 END)::BIGINT AS hash_lo
      |  FROM bits GROUP BY doc_id, g
      |), grp AS (
      |  SELECT g, MIN(doc_id) AS rep_id, COUNT(*) AS n_cluster
      |  FROM hashes GROUP BY g
      |)
      |SELECT h.doc_id, h.hash_hi, h.hash_lo, grp.rep_id, grp.n_cluster
      |FROM hashes h JOIN grp USING (g)""".stripMargin

  private val mediaDecode: String =
    """SELECT doc_id,
      | (16 + doc_id%16)::BIGINT AS width,
      | (16 + doc_id%11)::BIGINT AS height,
      | (doc_id%256)::BIGINT AS r,
      | ((doc_id*7)%256)::BIGINT AS g,
      | ((doc_id*13)%256)::BIGINT AS b,
      | ((16 + doc_id%16)//2)::BIGINT AS thumb_w,
      | ((16 + doc_id%11)//2)::BIGINT AS thumb_h,
      | (doc_id%256)::BIGINT AS thumb_r
      |FROM documents WHERE doc_id%5=0""".stripMargin

  /** Expected REAL-AVI/MJPEG parse output, recomputed arithmetically
    * (header fields and chunk count must be recovered from real container
    * bytes; the first frame's JPEG dims must agree with the header).
    */
  private val mediaVideo: String =
    """SELECT doc_id,
      | (2 + doc_id%4)::BIGINT AS n_frames,
      | (32 + (doc_id%8)*4)::BIGINT AS width,
      | (24 + (doc_id%5)*4)::BIGINT AS height,
      | (2 + doc_id%4)::BIGINT AS n_chunks,
      | (32 + (doc_id%8)*4)::BIGINT AS frame_w,
      | (24 + (doc_id%5)*4)::BIGINT AS frame_h
      |FROM documents WHERE doc_id%7=0""".stripMargin

  /** Expected REAL-WAV decode output, recomputed arithmetically. */
  private val mediaAudio: String =
    """SELECT doc_id,
      | (8000 + (doc_id%4)*4000)::BIGINT AS sample_rate,
      | 1::BIGINT AS channels, 16::BIGINT AS bits,
      | (100 + doc_id%50)::BIGINT AS n_frames,
      | (doc_id%1000)::BIGINT AS first_sample,
      | ((100 + doc_id%50)*1000000//(8000 + (doc_id%4)*4000))::BIGINT AS dur_us
      |FROM documents""".stripMargin

  /** Mirror of Queries.imageProbe: every probed field recomputed from the
    * doc_id arithmetic the fixture writers used — the engine only matches
    * if its PNG/JPEG-EXIF/GIF byte walks recovered them from real
    * containers. png depth/colortype and gif frame count are constants of
    * the ImageIO encode (8-bit truecolor, single frame).
    */
  private val imageProbe: String =
    """SELECT doc_id,
      | (3 + doc_id%9)::BIGINT AS png_w,
      | (2 + doc_id%7)::BIGINT AS png_h,
      | 8::BIGINT AS png_depth,
      | 'img '||doc_id AS png_title,
      | (8 + doc_id%6)::BIGINT AS jpg_w,
      | (8 + doc_id%4)::BIGINT AS jpg_h,
      | (1 + doc_id%8)::BIGINT AS jpg_orient,
      | 'Cam'||(doc_id%5) AS jpg_make,
      | 'M'||(doc_id%3) AS jpg_model,
      | (4 + doc_id%5)::BIGINT AS gif_w,
      | (3 + doc_id%3)::BIGINT AS gif_h,
      | 1::BIGINT AS gif_frames,
      | 'image' AS kinds
      |FROM documents WHERE doc_id%23=0""".stripMargin

  /** Mirror of Queries.imageProbe2: TIFF/BMP/WebP/ICO fields recomputed
    * from the fixture-writer arithmetic — tif bits-per-sample and bmp
    * bits-per-pixel are constants of the builders (8-bit gray strip /
    * 24-bit DIB), ico is always a single PNG-payload entry.
    */
  private val imageProbe2: String =
    """SELECT doc_id,
      | (5 + doc_id%9)::BIGINT AS tif_w,
      | (4 + doc_id%6)::BIGINT AS tif_h,
      | 8::BIGINT AS tif_bps,
      | (1 + doc_id%8)::BIGINT AS tif_orient,
      | 'Mk'||(doc_id%4) AS tif_make,
      | 'Md'||(doc_id%5) AS tif_model,
      | (6 + doc_id%10)::BIGINT AS bmp_w,
      | (3 + doc_id%7)::BIGINT AS bmp_h,
      | 24::BIGINT AS bmp_bpp,
      | (CASE WHEN doc_id%2=0 THEN 1 ELSE 0 END)::BIGINT AS bmp_topdown,
      | 'VP8L' AS webp_fmt,
      | (1 + doc_id%300)::BIGINT AS webp_w,
      | (1 + doc_id%200)::BIGINT AS webp_h,
      | 'VP8X' AS webpx_fmt,
      | (2 + doc_id%400)::BIGINT AS webpx_w,
      | (2 + doc_id%250)::BIGINT AS webpx_h,
      | 1::BIGINT AS ico_n,
      | (16 + (doc_id%3)*16)::BIGINT AS ico_w,
      | (16 + (doc_id%3)*16)::BIGINT AS ico_h,
      | 1::BIGINT AS ico_png,
      | 'image' AS kinds
      |FROM documents WHERE doc_id%61=0""".stripMargin

  /** Mirror of Queries.avProbe: MP4 box fields, MP3 frame arithmetic
    * (MPEG-1 L3 at 32 kHz: 1152 samples/frame → 36 ms), and WAVE duration,
    * all floor-division integer math on both sides.
    */
  /** Mirror of Queries.mp3Tags: pure string/int arithmetic. */
  private val mp3Tags: String =
    """SELECT doc_id, 'track '||doc_id AS title, 'artist '||(doc_id%7) AS artist,
      | 'album '||(doc_id%5) AS album, (3 + doc_id%4)::BIGINT AS n_frames
      |FROM documents WHERE doc_id%73=0""".stripMargin

  private val avProbe: String =
    """SELECT doc_id,
      | 'isom' AS mp4_brand,
      | (600 + (doc_id%5)*100)::BIGINT AS mp4_timescale,
      | ((1000 + (doc_id%11)*300)*1000 // (600 + (doc_id%5)*100))::BIGINT AS mp4_dur_ms,
      | (1 + doc_id%3)::BIGINT AS mp4_tracks,
      | (5 + doc_id%7)::BIGINT AS mp3_frames,
      | ((5 + doc_id%7)*36)::BIGINT AS mp3_dur_ms,
      | 32000::BIGINT AS mp3_rate,
      | (8000 + (doc_id%4)*4000)::BIGINT AS wav_rate,
      | ((200 + doc_id%50)*1000000 // (8000 + (doc_id%4)*4000))::BIGINT AS wav_dur_us,
      | 'av' AS kinds
      |FROM documents WHERE doc_id%37=0""".stripMargin

  private val mediaFrames: String =
    s"""WITH f AS (SELECT doc_id, text,
       |  unnest(generate_series(0, octet_length(encode(text))//64, 4)) AS fi FROM documents)
       |SELECT doc_id, fi::BIGINT AS frame_idx, (fi*64)::BIGINT AS byte_offset,
       | (CASE WHEN fi*64 < octet_length(encode(text)) THEN ${byteAt("text", "fi*64+1")} ELSE 0 END)::BIGINT AS frame_byte
       |FROM f""".stripMargin

  private val tpchQ1: String =
    """SELECT l_returnflag, l_linestatus,
      | sum(floor(l_quantity)::BIGINT)::BIGINT AS sum_qty,
      | sum(floor(l_extendedprice*100)::BIGINT)::BIGINT AS base_cents,
      | sum(floor((l_extendedprice*(1.0-l_discount))*100)::BIGINT)::BIGINT AS disc_cents,
      | count(*)::BIGINT AS n
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  private val joinTopn: String =
    """SELECT n_name,
      | sum(floor((l_extendedprice*(1.0-l_discount))*100)::BIGINT)::BIGINT AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      | JOIN customer ON o_custkey=c_custkey
      | JOIN nation ON c_nationkey=n_nationkey
      |GROUP BY n_name""".stripMargin

  private val windowTopn: String =
    """WITH r AS (SELECT o_orderpriority, o_orderkey,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY floor(o_totalprice*100) DESC, o_orderkey) AS rk FROM orders)
      |SELECT o_orderpriority, rk::BIGINT AS rnk, o_orderkey FROM r WHERE rk<=3""".stripMargin

  val all: Map[String, String] = Map(
    "q_extract_spans" -> extractSpans,
    "q_page_range" -> pageRange,
    "q_pdf_bytes" -> pdfBytes,
    // same expected text as q_pdf_bytes: the oracle can't inflate, but it
    // doesn't need to — it recomputes what the TEXT must be from documents
    "q_pdf_flate" -> pdfBytes,
    // same SQL on purpose: every filter chain must invert to the raw text
    "q_pdf_filters" -> pdfBytes,
    "q_pdf_decrypt" -> pdfDecrypt,
    // rtf typesets the same 5-words-per-line layout: expected text identical
    "q_rtf_bytes" -> pdfBytes,
    "q_csv_table" -> csvTable,
    "q_embed_explode" -> embedExplode,
    "q_zip_explode" -> zipExplode,
    "q_docx_explode" -> docxExplode,
    "q_xlsx_table" -> xlsxTable,
    "q_pptx_slides" -> pptxSlides,
    "q_tgz_explode" -> tgzExplode,
    "q_eml_explode" -> emlExplode,
    "q_emlx_explode" -> emlxExplode,
    "q_mhtml_explode" -> mhtmlExplode,
    "q_msg_explode" -> msgExplode,
    "q_pst_explode" -> pstExplode,
    "q_ost_explode" -> ostExplode,
    "q_ost_reconcile" -> ostReconcile,
    // same SQL on purpose: permute encryption and the ANSI 32-bit format
    // must both be invisible to logical output
    "q_pst_permute" -> pstExplode,
    "q_pst_ansi" -> pstExplode,
    "q_tnef_explode" -> tnefExplode,
    "q_mbox_explode" -> mboxExplode,
    "q_parquet_explode" -> parquetExplode,
    "q_avro_explode" -> avroExplode,
    "q_contact_text" -> contactText,
    "q_importance_sample" -> importanceSample,
    "q_pack_sequences" -> packSequences,
    "q_codec_explode" -> codecExplode,
    "q_pst_reconcile" -> pstReconcile,
    "q_cfb_explode" -> cfbExplode,
    "q_docx_media" -> docxMedia,
    "q_doc_bytes" -> pdfBytes, // same 5-word-line text, shared mirror
    "q_xls_table" -> xlsTable,
    "q_xls_decrypt" -> xlsDecrypt,
    "q_dbf_table" -> dbfTable,
    "q_wpd_text" -> wpdText,
    "q_lnk_text" -> lnkText,
    "q_odt_explode" -> odtExplode,
    "q_ods_table" -> odsTable,
    "q_odp_slides" -> odpSlides,
    "q_xps_text" -> xpsText,
    "q_epub_explode" -> epubExplode,
    "q_sqlite_explode" -> sqliteExplode,
    "q_plist_explode" -> plistExplode,
    "q_xml_text" -> xmlText,
    "q_ppt_text" -> pptText,
    "q_pdf_encrypted" -> pdfEncrypted,
    "q_msg_headers" -> msgHeaders,
    "q_doc_objects" -> docObjects,
    "q_html_charset" -> htmlCharset,
    "q_split_assign" -> splitAssign,
    "q_word_freq" -> wordFreq,
    "q_surprisal" -> surprisal,
    "q_perplexity" -> perplexitySql,
    "q_ppl_buckets" -> pplBucketsSql,
    "q_rare_terms" -> rareTerms,
    "q_bpe_merges" -> bpeMerges,
    "q_domain_balance" -> domainBalance,
    "q_domain_mix" -> domainMix,
    "q_embed_quant" -> embedQuant,
    "q_chunk_overlap" -> chunkOverlap,
    "q_dedup_cluster" -> dedupCluster,
    "q_cluster_rep" -> clusterRep,
    "q_corpus_card" -> corpusCard,
    "q_zstd_explode" -> zstdExplode,
    "q_warc_explode" -> warcExplode,
    "q_jsonl_explode" -> jsonlExplode,
    "q_7z_explode" -> sevenZExplode,
    "q_rar_explode" -> rarExplode,
    "q_ar_explode" -> arExplode,
    "q_cpio_explode" -> cpioExplode,
    "q_iso_explode" -> isoExplode,
    "q_chm_explode" -> chmExplode,
    "q_cab_explode" -> cabExplode,
    "q_ooxml_decrypt" -> ooxmlDecrypt,
    "q_xlsb_table" -> xlsbTable,
    "q_iwork_text" -> iworkText,
    "q_one_text" -> oneText,
    "q_pub_text" -> pubText,
    "q_msg_rtf" -> msgRtf,
    "q_hwp_text" -> hwpText,
    "q_one_files" -> oneFiles,
    "q_vsdx_text" -> vsdxText,
    "q_apple_text" -> appleText,
    "q_pdf_cid" -> pdfCid,
    "q_pdf_form" -> pdfForm,
    "q_pdf_objstm" -> pdfObjStm,
    "q_pdf_xfa" -> pdfXfa,
    "q_rpm_explode" -> rpmExplode,
    "q_url_filter" -> urlFilter,
    "q_url_dedup" -> urlDedup,
    "q_robots_filter" -> robotsFilter,
    "q_web_funnel" -> webFunnel,
    "q_eml_headers" -> emlHeaders,
    "q_artifact_lookup" -> artifactLookup,
    "q_embed_named" -> embedNamed,
    "q_embed_concat" -> embedConcat,
    "q_embed_datauri" -> mediaDataUri,
    "q_meta_iso" -> metaIso,
    "q_reconcile" -> reconcile,
    "q_extract_lineage" -> extractLineage,
    "q_lineage_taxonomy" -> lineageTaxonomy,
    "q_report_status" -> reportStatus,
    "q_scan_filter" -> scanFilter,
    "q_queue_dedup" -> queueDedup,
    "q_semi_intersect" -> semiIntersect,
    "q_anti_complement" -> antiComplement,
    "q_resume_anti" -> resumeAnti,
    "q_rehash" -> rehash,
    "q_copy_tag" -> copyTag,
    "q_meta_keys" -> metaKeys,
    "q_meta_map" -> metaMap,
    "q_meta_dates" -> metaDates,
    "q_ocr_cache" -> ocrCache,
    "q_media_links" -> mediaLinks,
    "q_lang_id" -> langId,
    "q_lang_trigram" -> langTrigram,
    "q_quality" -> quality,
    "q_quality_gopher" -> qualityGopher,
    "q_quality_c4" -> qualityC4,
    "q_c4_spandedup" -> c4SpanDedup,
    "q_substr_dedup" -> substrDedup,
    "q_substr_clean" -> substrClean,
    "q_token_budget" -> tokenBudget,
    "q_token_count" -> tokenCount,
    "q_fingerprint" -> fingerprint,
    "q_winnow" -> winnow,
    "q_profile" -> profile,
    "q_pii_scrub" -> piiScrub,
    "q_repetition" -> repetition,
    "q_prep_summary" -> prepSummary,
    "q_token_bpe" -> tokenBpe,
    "q_normalize" -> normalizeNfc,
    "q_cosine_zipwith" -> cosineZipwith,
    "q_dedup_exact" -> dedupExact,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_incremental" -> dedupIncremental,
    "q_dedup_edit" -> dedupEdit,
    "q_decontaminate" -> decontaminate,
    // the Bloom prefilter is exact-by-construction (confirm join kills the
    // bitmap's false positives; false negatives are impossible), so its
    // oracle IS the exact decontamination semantics — any divergence means
    // the bitmap lost a member, a correctness failure
    "q_decontam_bloom" -> decontaminate,
    "q_bloom_stats" -> bloomStats,
    "q_dedup_simhash" -> dedupSimhash,
    "q_dedup_jaccard" -> dedupJaccard,
    "q_jaccard_dropped" -> jaccardDropped,
    "q_dedup_cosine" -> dedupCosine,
    "q_knn_brute" -> knnBrute,
    "q_knn_lsh" -> knnLsh,
    "q_knn_ivf" -> knnIvf,
    "q_dedup_semantic" -> dedupSemantic,
    "q_ivf_stats" -> ivfStats,
    "q_lsh_stats" -> lshStats,
    "q_events_window" -> eventsWindow,
    "q_sessionize" -> sessionize,
    "q_expr_code32" -> exprCode32,
    "q_media_meta" -> mediaMeta,
    "q_image_probe" -> imageProbe,
    "q_image_probe2" -> imageProbe2,
    "q_av_probe" -> avProbe,
    "q_mp3_tags" -> mp3Tags,
    "q_media_decode" -> mediaDecode,
    "q_media_audio" -> mediaAudio,
    "q_media_video" -> mediaVideo,
    "q_media_frames" -> mediaFrames,
    "q_dedup_phash" -> dedupPhash,
    "q_dedup_audiofp" -> dedupAudiofp,
    "q_dedup_videofp" -> dedupVideofp,
    "q_tpch_q1" -> tpchQ1,
    "q_join_topn" -> joinTopn,
    "q_window_topn" -> windowTopn
  )
}
