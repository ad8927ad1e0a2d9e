package graft.core.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF standard security handler (ISO 32000-1 §7.6.3), from scratch: RC4
  * (V1/V2, R2/R3) file decryption with the EMPTY USER PASSWORD. Most
  * "encrypted" PDFs in the wild are owner-restricted only (print/copy
  * permission bits) and every conforming reader opens them silently —
  * PDFBox does exactly this behind the reference's PDFParser, so an
  * owner-restricted file EXTRACTS there (`Extractor.java:785-826` raises
  * EncryptedDocumentException only when a real user password is needed).
  * This module reproduces that behavior: validate the empty user password
  * against /U (Algorithms 4/5), derive the file key (Algorithm 2), and
  * RC4-decrypt every stream with its per-object key (Algorithm 1).
  * User-password-protected files (U check fails) and AES variants (V≥4)
  * stay classified encrypted. MD5 and RC4 are the algorithms the SPEC
  * mandates — legacy by design, decrypt-only here.
  */
object PdfCrypt {

  /** The 32-byte padding constant of Algorithm 2 (ISO 32000-1 7.6.3.3). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (symmetric: encrypt == decrypt). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def padded(pw: Array[Byte]): Array[Byte] =
    if (pw.length >= 32) pw.take(32) else pw ++ Pad.take(32 - pw.length)

  private def leInt(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)

  /** The /Encrypt dictionary's standard-handler fields + the file ID.
    * `aes` = V4/AESV2 (AES-128-CBC streams, per-object salted keys);
    * `v5` = V5/R6 AES-256 (SHA-2 hardened hash, file key from /UE, no
    * per-object keys). For V5, `u` is the 48-byte hash‖validation‖key
    * salt block and `ue` the encrypted file key.
    */
  final case class StdSec(v: Int, r: Int, o: Array[Byte], u: Array[Byte],
      p: Int, keyBytes: Int, id0: Array[Byte], objNum: Int,
      aes: Boolean = false, v5: Boolean = false,
      ue: Array[Byte] = Array.emptyByteArray)

  /** Algorithm 2.B (ISO 32000-2 7.6.4.3.4): the hardened SHA-2 hash —
    * ≥64 rounds of (64× password‖K‖udata) → AES-CBC(K₀₋₁₆, K₁₆₋₃₂) →
    * SHA-256/384/512 selected by E's first-16-byte sum mod 3, until the
    * last byte of E is ≤ round − 32.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
             udata: Array[Byte]): Array[Byte] = {
    val sha256 = java.security.MessageDigest.getInstance("SHA-256")
    sha256.update(password); sha256.update(salt); sha256.update(udata)
    var k = sha256.digest()
    var i = 0
    var lastE = 0
    while (i < 64 || lastE > i - 32) {
      val one = password ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(one, 0, k1, j * one.length, one.length); j += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(java.util.Arrays.copyOf(k, 16), "AES"),
        new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      val e = c.doFinal(k1)
      var sum = 0
      var m = 0
      while (m < 16) { sum += e(m) & 0xff; m += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      lastE = e(e.length - 1) & 0xff
      i += 1
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Algorithm 2 with the empty user password. */
  def fileKeyEmptyUser(sec: StdSec): Array[Byte] = {
    var key = md5(Pad, sec.o, leInt(sec.p), sec.id0).take(sec.keyBytes)
    if (sec.r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(sec.keyBytes); i += 1 }
    }
    key
  }

  private def aesCbcNoPad(key: Array[Byte], iv: Array[Byte],
                          data: Array[Byte], decrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (decrypt) javax.crypto.Cipher.DECRYPT_MODE else javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithms 4 (R2) / 5 (R3/R4) / 11+8.1 (R6): Some(fileKey) iff the
    * EMPTY user password reproduces the stored /U.
    */
  def emptyUserKey(sec: StdSec): Option[Array[Byte]] = {
    if (sec.v5) {
      // R6: U = hash(32) ‖ validationSalt(8) ‖ keySalt(8); the file key
      // decrypts out of /UE with the intermediate key over the key salt
      if (sec.u.length < 48 || sec.ue.length != 32) return None
      val vs = java.util.Arrays.copyOfRange(sec.u, 32, 40)
      val ks = java.util.Arrays.copyOfRange(sec.u, 40, 48)
      val h = hash2B(Array.emptyByteArray, vs, Array.emptyByteArray)
      if (!java.util.Arrays.equals(h, java.util.Arrays.copyOf(sec.u, 32))) return None
      val ik = hash2B(Array.emptyByteArray, ks, Array.emptyByteArray)
      return Some(aesCbcNoPad(ik, new Array[Byte](16), sec.ue, decrypt = true))
    }
    val key = fileKeyEmptyUser(sec)
    val ok =
      if (sec.r == 2) java.util.Arrays.equals(rc4(key, Pad), sec.u)
      else {
        var x = rc4(key, md5(Pad, sec.id0))
        var i = 1
        while (i <= 19) {
          x = rc4(key.map(b => (b ^ i).toByte), x)
          i += 1
        }
        // only the first 16 bytes of U are significant for R3 (7.6.3.4)
        sec.u.length >= 16 && java.util.Arrays.equals(x, sec.u.take(16))
      }
    if (ok) Some(key) else None
  }

  /** Algorithm 1's per-object key: MD5(fileKey ‖ objNum_le3 ‖ gen_le2
    * [‖ "sAlT" for AESV2]), truncated to min(fileKeyLen + 5, 16).
    */
  def objKey(fileKey: Array[Byte], num: Int, gen: Int,
             aes: Boolean = false): Array[Byte] =
    md5(fileKey,
      Array(num, num >> 8, num >> 16).map(_.toByte),
      Array(gen, gen >> 8).map(_.toByte),
      if (aes) Array[Byte](0x73, 0x41, 0x6c, 0x54) else Array.emptyByteArray)
      .take(math.min(fileKey.length + 5, 16))

  // ---- document parsing --------------------------------------------------

  /** A `<hex>` or `(literal)` PDF string starting at or after `from`. */
  private def parseStringAt(s: String, from: Int): Option[Array[Byte]] = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) None
    else if (s.charAt(i) == '<') {
      val e = s.indexOf('>', i)
      if (e < 0) None
      else {
        val hex = s.substring(i + 1, e).filterNot(_.isWhitespace)
        if (hex.exists(c => Character.digit(c, 16) < 0)) None
        else {
          val h = if (hex.length % 2 == 1) hex + "0" else hex
          Some(h.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray)
        }
      }
    } else if (s.charAt(i) == '(') {
      val out = new java.io.ByteArrayOutputStream()
      var j = i + 1
      var depth = 1
      while (j < s.length && depth > 0) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < s.length) {
          val e = s.charAt(j + 1)
          e match {
            case 'n' => out.write('\n'); j += 2
            case 'r' => out.write('\r'); j += 2
            case 't' => out.write('\t'); j += 2
            case 'b' => out.write('\b'); j += 2
            case 'f' => out.write('\f'); j += 2
            case d if d >= '0' && d <= '7' =>
              var k = j + 1; var v = 0; var cnt = 0
              while (k < s.length && cnt < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                v = v * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
              }
              out.write(v); j = k
            case _ => out.write(e); j += 2
          }
        } else {
          if (c == '(') { depth += 1; out.write(c) }
          else if (c == ')') { depth -= 1; if (depth > 0) out.write(c) }
          else out.write(c)
          j += 1
        }
      }
      Some(out.toByteArray)
    } else None
  }

  /** First occurrence of `/Key` as a COMPLETE name (the next char must
    * end a PDF name — `/U` must not match inside `/UE`, `/P` not inside
    * `/Perms`).
    */
  private def keyAt(dict: String, key: String): Int = {
    var k = dict.indexOf(key)
    while (k >= 0 && k + key.length < dict.length &&
      dict.charAt(k + key.length).isLetterOrDigit)
      k = dict.indexOf(key, k + 1)
    k
  }

  /** An integer value following `/Key` in `dict` (first occurrence). */
  private def intAfter(dict: String, key: String): Option[Int] = {
    val k = keyAt(dict, key)
    if (k < 0) None
    else {
      var i = k + key.length
      while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
      var j = i
      if (j < dict.length && (dict.charAt(j) == '-' || dict.charAt(j) == '+')) j += 1
      while (j < dict.length && dict.charAt(j).isDigit) j += 1
      dict.substring(i, j).toIntOption
    }
  }

  private def stringAfter(dict: String, key: String): Option[Array[Byte]] = {
    val k = keyAt(dict, key)
    if (k < 0) None else parseStringAt(dict, k + key.length)
  }

  /** Locate and parse the standard-handler /Encrypt dictionary (indirect
    * `N G R` reference or inline `<< .. >>`) plus the first /ID string.
    * None when absent or not the standard RC4 handler.
    */
  def parseEncrypt(pdf: String): Option[StdSec] = {
    val eIdx = pdf.indexOf("/Encrypt")
    if (eIdx < 0) return None
    var i = eIdx + "/Encrypt".length
    while (i < pdf.length && pdf.charAt(i).isWhitespace) i += 1
    // indirect reference "N G R" → find "N G obj"; else inline dict
    val refM = "^(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(pdf.substring(i, math.min(pdf.length, i + 32)))
    val (dict, objNum) = refM match {
      case Some(m) =>
        val num = m.group(1).toInt
        val objAt = pdf.indexOf(s"${m.group(1)} ${m.group(2)} obj")
        if (objAt < 0) return None
        val end = pdf.indexOf("endobj", objAt)
        (pdf.substring(objAt, if (end < 0) pdf.length else end), num)
      case None =>
        val end = pdf.indexOf(">>", i)
        (pdf.substring(i, if (end < 0) pdf.length else end + 2), -1)
    }
    if (!dict.contains("/Standard")) return None
    val v = intAfter(dict, "/V").getOrElse(0)
    val r = intAfter(dict, "/R").getOrElse(0)
    // V1/V2 = RC4; V4 + AESV2 filter = AES-128-CBC with salted object
    // keys; V5/R6 + AESV3 = AES-256-CBC with the file key directly
    val rc4 = v >= 1 && v <= 2 && r >= 2 && r <= 3
    val aes = v == 4 && r == 4 && dict.contains("/AESV2")
    val v5 = v == 5 && r == 6 && dict.contains("/AESV3")
    if (!rc4 && !aes && !v5) return None
    val lenBits = intAfter(dict, "/Length").getOrElse(
      if (v5) 256 else if (aes) 128 else 40)
    if (!v5 && (lenBits < 40 || lenBits > 128 || lenBits % 8 != 0)) return None
    val sLen = if (v5) 48 else 32
    for {
      o <- stringAfter(dict, "/O") if o.length == sLen
      u <- stringAfter(dict, "/U") if u.length == sLen
      p <- intAfter(dict, "/P")
    } yield {
      val idAt = pdf.indexOf("/ID")
      val id0 =
        if (idAt < 0) Array.emptyByteArray
        else {
          var j = idAt + 3
          while (j < pdf.length && (pdf.charAt(j).isWhitespace || pdf.charAt(j) == '[')) j += 1
          parseStringAt(pdf, j).getOrElse(Array.emptyByteArray)
        }
      val ue = if (v5) stringAfter(dict, "/UE").getOrElse(Array.emptyByteArray)
        else Array.emptyByteArray
      StdSec(v, r, o, u, p,
        if (v5) 32 else if (r == 2) 5 else lenBits / 8,
        id0, objNum, aes = aes || v5, v5 = v5, ue = ue)
    }
  }

  /** AES-128-CBC with the PDF stream layout: 16-byte IV prefix, PKCS#5
    * padding. None on malformed ciphertext (degrade, never throw).
    */
  private def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] =
    if (data.length < 32 || (data.length % 16) != 0) None
    else try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
      Some(c.doFinal(data, 16, data.length - 16))
    } catch { case _: java.security.GeneralSecurityException => None }

  private def aesEncrypt(key: Array[Byte], iv: Array[Byte],
                         plain: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }

  /** Decrypt every stream payload in place with its per-object RC4 key and
    * return the cleartext document (latin1), or None when the file needs a
    * real user password / uses a non-RC4 handler. Stream extents honor the
    * dict's /Length when sane (ciphertext is binary — scanning for
    * `endstream` alone would mis-slice payloads with trailing EOL bytes).
    */
  def decryptEmptyUser(pdf: String): Option[String] = {
    val sec = parseEncrypt(pdf) match { case Some(s) => s; case None => return None }
    val key = emptyUserKey(sec) match { case Some(k) => k; case None => return None }
    val sb = new StringBuilder(pdf.length)
    var from = 0
    val objHead = "(\\d+)\\s+(\\d+)\\s+obj".r
    while (from < pdf.length) {
      val s = pdf.indexOf("stream", from)
      val isEnd = s >= 3 && pdf.regionMatches(s - 3, "endstream", 0, 9)
      if (s < 0) { sb.append(pdf.substring(from)); from = pdf.length }
      else if (isEnd) { sb.append(pdf.substring(from, s + 6)); from = s + 6 }
      else {
        var payloadStart = s + "stream".length
        if (payloadStart < pdf.length && pdf.charAt(payloadStart) == '\r') payloadStart += 1
        if (payloadStart < pdf.length && pdf.charAt(payloadStart) == '\n') payloadStart += 1
        val e = pdf.indexOf("endstream", payloadStart)
        if (e < 0) { sb.append(pdf.substring(from)); from = pdf.length }
        else {
          val dictStart = math.max(0, pdf.lastIndexOf("obj", s) - 16)
          val dict = pdf.substring(dictStart, s)
          // the owning object header sits just before the dict
          val head = objHead.findAllMatchIn(pdf.substring(0, s)).foldLeft(
            Option.empty[(Int, Int)])((_, m) => Some((m.group(1).toInt, m.group(2).toInt)))
          val declared = intAfter(dict, "/Length").getOrElse(-1)
          val pEnd =
            if (declared >= 0 && payloadStart + declared <= e) payloadStart + declared
            else { // trim one trailing EOL the writer put before 'endstream'
              var t = e
              if (t > payloadStart && pdf.charAt(t - 1) == '\n') t -= 1
              if (t > payloadStart && pdf.charAt(t - 1) == '\r') t -= 1
              t
            }
          sb.append(pdf.substring(from, payloadStart))
          head match {
            case Some((num, gen)) if num != sec.objNum =>
              val cipher = pdf.substring(payloadStart, pEnd).getBytes(ISO_8859_1)
              val clear =
                // bad padding/framing degrades to the raw bytes (the
                // extractor simply finds no text ops), never a throw
                if (sec.v5) aesDecrypt(key, cipher).getOrElse(cipher) // file key direct
                else if (sec.aes)
                  aesDecrypt(objKey(key, num, gen, aes = true), cipher).getOrElse(cipher)
                else rc4(objKey(key, num, gen), cipher)
              sb.append(new String(clear, ISO_8859_1))
            case _ => sb.append(pdf.substring(payloadStart, pEnd))
          }
          sb.append(pdf.substring(pEnd, e + "endstream".length))
          from = e + "endstream".length
        }
      }
    }
    Some(sb.toString)
  }

  // ---- fixture writer ----------------------------------------------------

  /** Algorithm 3: the /O value for an owner password + empty user password. */
  def ownerValue(ownerPw: String, r: Int, keyBytes: Int): Array[Byte] = {
    var k = md5(padded(ownerPw.getBytes(ISO_8859_1)))
    if (r >= 3) { var i = 0; while (i < 50) { k = md5(k); i += 1 } }
    val rk = k.take(keyBytes)
    var o = rc4(rk, Pad) // padded empty USER password
    if (r >= 3) {
      var i = 1
      while (i <= 19) { o = rc4(rk.map(b => (b ^ i).toByte), o); i += 1 }
    }
    o
  }

  /** The /U value for the empty user password (Algorithms 4/5). */
  def userValue(sec: StdSec): Array[Byte] =
    if (sec.r == 2) rc4(fileKeyEmptyUser(sec), Pad)
    else {
      val key = fileKeyEmptyUser(sec)
      var x = rc4(key, md5(Pad, sec.id0))
      var i = 1
      while (i <= 19) { x = rc4(key.map(b => (b ^ i).toByte), x); i += 1 }
      x ++ new Array[Byte](16)
    }

  private def hexStr(b: Array[Byte]): String =
    "<" + b.map(x => f"${x & 0xff}%02X").mkString + ">"

  /** Deterministic encrypted-PDF writer: takes a single-content-stream
    * document body (`objNum gen obj ... stream ... endstream`-shaped, as
    * the query fixtures build), RC4-encrypts each stream, and appends the
    * /Encrypt object and a trailer carrying /Encrypt + /ID. `userPw`
    * non-empty makes a file a conforming reader must prompt for.
    */
  def encrypt(pdf: String, ownerPw: String, userPw: String, r: Int,
      lenBits: Int, idSeed: String): String = {
    val aes = r == 4 // V4/AESV2 (Acrobat 7+ default); r 2/3 are RC4
    val v5 = r == 6  // V5/AESV3 AES-256 (Acrobat X+ default)
    val keyBytes = if (v5) 32 else if (r == 2) 5 else lenBits / 8
    val id0 = md5(idSeed.getBytes(ISO_8859_1))
    val p = -44
    // V5 values (Algorithms 8/9): salts and the 256-bit file key are
    // deterministic functions of the seed; /UE carries the file key
    // encrypted with the user-password intermediate key
    val userB = userPw.getBytes(ISO_8859_1)
    val v5FileKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(("fk-" + idSeed).getBytes(ISO_8859_1))
    val (o, u, ue, oe) =
      if (v5) {
        val vs = md5((idSeed + "-vs").getBytes(ISO_8859_1)).take(8)
        val ks = md5((idSeed + "-ks").getBytes(ISO_8859_1)).take(8)
        val u5 = hash2B(userB, vs, Array.emptyByteArray) ++ vs ++ ks
        val ue5 = aesCbcNoPad(hash2B(userB, ks, Array.emptyByteArray),
          new Array[Byte](16), v5FileKey, decrypt = false)
        val ownerB = ownerPw.getBytes(ISO_8859_1)
        val vs2 = md5((idSeed + "-vo").getBytes(ISO_8859_1)).take(8)
        val ks2 = md5((idSeed + "-ko").getBytes(ISO_8859_1)).take(8)
        val o5 = hash2B(ownerB, vs2, u5) ++ vs2 ++ ks2
        val oe5 = aesCbcNoPad(hash2B(ownerB, ks2, u5),
          new Array[Byte](16), v5FileKey, decrypt = false)
        (o5, u5, ue5, oe5)
      } else {
        val o4 = ownerValue(ownerPw, r, keyBytes)
        // U from the real user password (empty → openable; else restricted)
        val padUser = padded(userB)
        var fk0 = md5(padUser, o4, leInt(p), id0).take(keyBytes)
        if (r >= 3) { var i = 0; while (i < 50) { fk0 = md5(fk0).take(keyBytes); i += 1 } }
        val u4 =
          if (r == 2) rc4(fk0, Pad)
          else {
            var x = rc4(fk0, md5(Pad, id0))
            var i = 1
            while (i <= 19) { x = rc4(fk0.map(b => (b ^ i).toByte), x); i += 1 }
            x ++ new Array[Byte](16)
          }
        (o4, u4, Array.emptyByteArray, Array.emptyByteArray)
      }
    val fk =
      if (v5) v5FileKey
      else {
        val padUser = padded(userB)
        var k = md5(padUser, o, leInt(p), id0).take(keyBytes)
        if (r >= 3) { var i = 0; while (i < 50) { k = md5(k).take(keyBytes); i += 1 } }
        k
      }
    val encNum = 9999
    // encrypt every stream payload with its object key
    val sb = new StringBuilder
    var from = 0
    val objHead = "(\\d+)\\s+(\\d+)\\s+obj".r
    while (from < pdf.length) {
      val s = pdf.indexOf("stream", from)
      val isEnd = s >= 3 && pdf.regionMatches(s - 3, "endstream", 0, 9)
      if (s < 0) { sb.append(pdf.substring(from)); from = pdf.length }
      else if (isEnd) { sb.append(pdf.substring(from, s + 6)); from = s + 6 }
      else {
        var ps = s + "stream".length
        if (ps < pdf.length && pdf.charAt(ps) == '\r') ps += 1
        if (ps < pdf.length && pdf.charAt(ps) == '\n') ps += 1
        val e = pdf.indexOf("endstream", ps)
        if (e < 0) { sb.append(pdf.substring(from)); from = pdf.length }
        else {
          var pEnd = e
          if (pEnd > ps && pdf.charAt(pEnd - 1) == '\n') pEnd -= 1
          if (pEnd > ps && pdf.charAt(pEnd - 1) == '\r') pEnd -= 1
          val head = objHead.findAllMatchIn(pdf.substring(0, s)).foldLeft(
            Option.empty[(Int, Int)])((_, m) => Some((m.group(1).toInt, m.group(2).toInt)))
          val (num, gen) = head.getOrElse((0, 0))
          val plain = pdf.substring(ps, pEnd).getBytes(ISO_8859_1)
          val cipher =
            if (v5) aesEncrypt(fk,
              md5(s"$idSeed-$num-$gen".getBytes(ISO_8859_1)), plain)
            else if (aes) aesEncrypt(objKey(fk, num, gen, aes = true),
              md5(s"$idSeed-$num-$gen".getBytes(ISO_8859_1)), plain)
            else rc4(objKey(fk, num, gen), plain)
          // RC4 preserves length so the declared /Length stays valid; AES
          // grows the payload (IV + padding) and real writers update the
          // dict — the decrypter slices ciphertext by /Length
          val pre = pdf.substring(from, ps)
          sb.append(
            if (aes || v5) pre.replace(s"/Length ${plain.length}", s"/Length ${cipher.length}")
            else pre)
          sb.append(new String(cipher, ISO_8859_1))
          sb.append(pdf.substring(pEnd, e + "endstream".length))
          from = e + "endstream".length
        }
      }
    }
    val vSpec =
      if (v5) "/V 5 /R 6 /Length 256 /CF << /StdCF << /CFM /AESV3 " +
        "/AuthEvent /DocOpen /Length 32 >> >> /StmF /StdCF /StrF /StdCF" +
        s" /UE ${hexStr(ue)} /OE ${hexStr(oe)} /Perms ${hexStr(new Array[Byte](16))}"
      else if (aes) s"/V 4 /R 4 /Length $lenBits /CF << /StdCF << /CFM /AESV2 " +
        "/AuthEvent /DocOpen /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
      else s"/V ${if (r == 2) 1 else 2} /R $r" +
        (if (r >= 3) s" /Length $lenBits" else "")
    sb.append(s"\n$encNum 0 obj << /Filter /Standard $vSpec" +
      s" /O ${hexStr(o)} /U ${hexStr(u)} /P $p >> endobj\n")
    sb.append(s"trailer << /Root 1 0 R /Encrypt $encNum 0 R /ID [ ${hexStr(id0)} ${hexStr(id0)} ] >>\n%%EOF")
    sb.toString
  }
}
