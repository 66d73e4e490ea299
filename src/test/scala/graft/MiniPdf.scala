package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Test fixture generator: builds REAL, spec-valid PDF files — catalog,
  * pages tree, Helvetica font, per-page content streams (FlateDecode or
  * raw), correct xref offsets — so PdfText decodes an actual PDF byte
  * stream, not a text stand-in. ASCII lines are written as literal
  * strings, non-ASCII lines as UTF-16BE hex strings (both standard PDF
  * string forms).
  */
object MiniPdf {

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  private def pdfString(line: String): String =
    if (line.forall(c => c >= ' ' && c < 127)) s"(${escape(line)})"
    else {
      val bs = line.getBytes(StandardCharsets.UTF_16BE)
      "<FEFF" + bs.map(b => f"${b & 0xff}%02X").mkString + ">"
    }

  private def contentStream(pageText: String): Array[Byte] = {
    val body = new StringBuilder("BT\n/F1 11 Tf\n72 760 Td\n")
    val lines = pageText.split("\n", -1)
    lines.zipWithIndex.foreach { case (l, i) =>
      if (i > 0) body ++= "0 -14 Td\n"
      body ++= s"${pdfString(l)} Tj\n"
    }
    body ++= "ET\n"
    body.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** PNG-predict (filter 2 = Up, per 16-byte row) then deflate — the
    * /DecodeParms << /Predictor 12 >> encoding real-world writers use on
    * object/xref streams; padding with newlines keeps content harmless. */
  private def pngPredictDeflate(data0: Array[Byte]): (Array[Byte], Int) = {
    val cols = 16
    val padded = data0 ++ Array.fill((cols - data0.length % cols) % cols)('\n'.toByte)
    val rows = padded.length / cols
    val enc = new Array[Byte](rows * (cols + 1))
    for (r <- 0 until rows) {
      enc(r * (cols + 1)) = 2 // Up filter
      for (i <- 0 until cols) {
        val up = if (r > 0) padded((r - 1) * cols + i) & 0xff else 0
        enc(r * (cols + 1) + 1 + i) =
          (((padded(r * cols + i) & 0xff) - up) & 0xff).toByte
      }
    }
    (deflate(enc), cols)
  }

  /** One PDF: `pages(i)` becomes page i+1's text (lines Tj-drawn top-down).
    * pngPredict additionally runs the content through Predictor-12 row
    * encoding before deflate (exercises PdfText.unpredictPng end to end). */
  def write(pages: Seq[String], compress: Boolean = true,
      pngPredict: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      val num = offsets.size
      raw(s"$num 0 obj\n"); body; raw("endobj\n")
    }
    raw("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.size
    // object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    val pageObjNums = (0 until n).map(i => 4 + 2 * i)
    obj { raw("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj { raw(s"<< /Type /Pages /Kids [${pageObjNums.map(k => s"$k 0 R").mkString(" ")}] /Count $n >>\n") }
    obj { raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    pages.foreach { p =>
      val contentNum = offsets.size + 2
      obj { raw(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentNum 0 R >>\n") }
      val data0 = contentStream(p)
      val (data, parms) =
        if (pngPredict) {
          val (enc, cols) = pngPredictDeflate(data0)
          (enc, s" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >>")
        } else if (compress) (deflate(data0), " /Filter /FlateDecode")
        else (data0, "")
      obj {
        raw(s"<< /Length ${data.length}$parms >>\nstream\n")
        out.write(data)
        raw("\nendstream\n")
      }
    }
    val xrefAt = out.size()
    raw(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => raw(f"$o%010d 00000 n \n"))
    raw(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** PDF 1.5-style variant: catalog, pages node, font and page DICTIONARIES
    * packed into a Flate-compressed /Type /ObjStm object stream; only the
    * content streams stay top-level (streams cannot live inside an ObjStm).
    * Exercises PdfText.expandObjectStreams. */
  def writeObjStm(pages: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    raw("%PDF-1.5\n%âãÏÓ\n")
    val n = pages.size
    // numbering: 1 = ObjStm; 2 catalog, 3 pages, 4 font, 5..4+n page dicts
    // (all inside the ObjStm); 5+n.. content streams (top level)
    val contentNums = (0 until n).map(i => 5 + n + i)
    val embedded: Seq[(Int, String)] =
      Seq(
        2 -> "<< /Type /Catalog /Pages 3 0 R >>",
        3 -> s"<< /Type /Pages /Kids [${(0 until n).map(i => s"${5 + i} 0 R").mkString(" ")}] /Count $n >>",
        4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
        (0 until n).map(i => (5 + i) ->
          (s"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 4 0 R >> >> /Contents ${contentNums(i)} 0 R >>"))
    val bodies = embedded.map(_._2 + "\n")
    val offsets = bodies.scanLeft(0)(_ + _.length).init
    val header = embedded.map(_._1).zip(offsets)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString).getBytes(StandardCharsets.ISO_8859_1)
    val packed = deflate(payload)
    raw(s"1 0 obj\n<< /Type /ObjStm /N ${embedded.size} /First ${header.length} " +
      s"/Length ${packed.length} /Filter /FlateDecode >>\nstream\n")
    out.write(packed)
    raw("\nendstream\nendobj\n")
    pages.zipWithIndex.foreach { case (p, i) =>
      val data = deflate(contentStream(p))
      raw(s"${contentNums(i)} 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      raw("\nendstream\nendobj\n")
    }
    raw("trailer\n<< /Root 2 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /** Standard-security encrypted variant of [[write]] (empty user AND
    * owner passwords): r=2 → /V 1 RC4-40; r=3 → /V 2 RC4-128; r=4 → /V 4
    * AES-128 (/AESV2 crypt filter, IV-prefixed CBC with PKCS#5 padding).
    * O and U are computed per Algorithms 3/4/5, so the fixture is a
    * spec-true encrypted PDF any conforming reader opens without a
    * password prompt. */
  def writeEncrypted(pages: Seq[String], r: Int = 3): Array[Byte] = {
    import graft.ingest.PdfText.{rc4, fileKey, objectKey, PasswordPad, hash2B}
    def md5(bs: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bs)
    val aes = r == 4
    val aes3 = r == 6
    def aesEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }
    def aesRawEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      c.doFinal(data)
    }
    val empty = Array.emptyByteArray
    // R6 (AES-256) material: deterministic file key + salts, /U /UE /O /OE
    // per ISO 32000-2 (empty user AND owner passwords)
    val fk256 = Array.tabulate[Byte](32)(i => ((i * 37 + 11) & 0xff).toByte)
    val vSalt = Array.tabulate[Byte](8)(i => ((i * 13 + 1) & 0xff).toByte)
    val kSalt = Array.tabulate[Byte](8)(i => ((i * 17 + 5) & 0xff).toByte)
    val ovSalt = Array.tabulate[Byte](8)(i => ((i * 19 + 7) & 0xff).toByte)
    val okSalt = Array.tabulate[Byte](8)(i => ((i * 23 + 9) & 0xff).toByte)
    lazy val u48 = hash2B(empty, vSalt, empty) ++ vSalt ++ kSalt
    lazy val ue32 = aesRawEncrypt(hash2B(empty, kSalt, empty), fk256)
    lazy val o48 = hash2B(empty, ovSalt, u48) ++ ovSalt ++ okSalt
    lazy val oe32 = aesRawEncrypt(hash2B(empty, okSalt, u48), fk256)
    val lenBits = if (r == 2) 40 else if (aes3) 256 else 128
    val perms = -44 // print+copy allowed, the common permissive mask
    val id0 = Array.tabulate(16)(i => ((i * 7 + 3) & 0xff).toByte)
    // Algorithm 3: /O from the (empty) owner password
    var h = md5(PasswordPad)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val n = if (r == 2) 5 else lenBits / 8
    val okey = h.take(n)
    var o = rc4(okey, PasswordPad)
    if (r >= 3) for (i <- 1 to 19) o = rc4(okey.map(b => (b ^ i).toByte), o)
    val fk = fileKey(o, perms, id0, r, lenBits)
    // Algorithms 4 (r2) / 5 (r3): /U from the (empty) user password
    val u: Array[Byte] =
      if (r == 2) rc4(fk, PasswordPad)
      else {
        var u16 = rc4(fk, md5(PasswordPad ++ id0))
        for (i <- 1 to 19) u16 = rc4(fk.map(b => (b ^ i).toByte), u16)
        u16 ++ Array.fill[Byte](16)(0)
      }
    def hexStr(bs: Array[Byte]) = "<" + bs.map(b => f"${b & 0xff}%02X").mkString + ">"

    val out = new ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      val num = offsets.size
      raw(s"$num 0 obj\n"); body; raw("endobj\n")
    }
    raw("%PDF-1.4\n%âãÏÓ\n")
    val np = pages.size
    val pageObjNums = (0 until np).map(i => 4 + 2 * i)
    val encNum = 4 + 2 * np
    obj { raw("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj { raw(s"<< /Type /Pages /Kids [${pageObjNums.map(k => s"$k 0 R").mkString(" ")}] /Count $np >>\n") }
    obj { raw("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    pages.foreach { p =>
      val contentNum = offsets.size + 2
      obj { raw(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentNum 0 R >>\n") }
      val data =
        if (aes3)
          aesEncrypt(fk256, md5(Array(contentNum.toByte)).take(16),
            deflate(contentStream(p)))
        else if (aes)
          aesEncrypt(objectKey(fk, contentNum, 0, aes = true),
            md5(Array(contentNum.toByte)).take(16), deflate(contentStream(p)))
        else rc4(objectKey(fk, contentNum, 0), deflate(contentStream(p)))
      obj {
        raw(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
        out.write(data)
        raw("\nendstream\n")
      }
    }
    obj {
      if (aes3) {
        raw(s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/U ${hexStr(u48)} /UE ${hexStr(ue32)} " +
          s"/O ${hexStr(o48)} /OE ${hexStr(oe32)} /P $perms >>\n")
      } else {
        val vr =
          if (r == 2) "/V 1 /R 2"
          else if (r == 3) s"/V 2 /R 3 /Length $lenBits"
          else s"/V 4 /R 4 /Length $lenBits /CF << /StdCF << /CFM /AESV2 " +
            "/AuthEvent /DocOpen /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        raw(s"<< /Filter /Standard $vr /O ${hexStr(o)} /U ${hexStr(u)} /P $perms >>\n")
      }
    }
    val xrefAt = out.size()
    raw(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(off => raw(f"$off%010d 00000 n \n"))
    raw(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R " +
      s"/Encrypt $encNum 0 R /ID [${hexStr(id0)} ${hexStr(id0)}] >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Write pages to a .pdf file on disk; returns the path. */
  def writeFile(path: java.nio.file.Path, pages: Seq[String], compress: Boolean = true): java.nio.file.Path =
    java.nio.file.Files.write(path, write(pages, compress))

  /** A CID-font PDF: Type0 font with Identity-H 2-byte codes mapped by a
    * /ToUnicode CMap (bfchar, both bfrange forms), text drawn with hex AND
    * literal strings. Extracted text must equal [[CidExpected]]. */
  val CidExpected = "Hello\nabc\nwx\nH"

  def writeCid(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      val num = offsets.size
      raw(s"$num 0 obj\n"); body; raw("endobj\n")
    }
    raw("%PDF-1.4\n%âãÏÓ\n")
    obj { raw("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj { raw("<< /Type /Pages /Kids [4 0 R] /Count 1 >>\n") }
    obj { raw("<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>\n") }
    obj { raw("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>\n") }
    val content =
      "BT\n/F1 11 Tf\n72 760 Td\n" +
        "<00010002000300030004> Tj\n" +  // Hello (bfchar)
        "0 -14 Td\n<001000110012> Tj\n" + // abc (bfrange, contiguous form)
        "0 -14 Td\n<00200021> Tj\n" +     // wx (bfrange, array form)
        "0 -14 Td\n(\\000\\001) Tj\n" +   // H (literal string, 2-byte codes)
        "ET\n"
    obj {
      raw(s"<< /Length ${content.length} >>\nstream\n")
      raw(content)
      raw("\nendstream\n")
    }
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |5 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0003> <006C>
        |<0004> <006F>
        |<0005> <0020>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [<0077> <0078>]
        |endbfrange
        |endcmap
        |""".stripMargin
    obj {
      raw(s"<< /Length ${cmap.length} >>\nstream\n")
      raw(cmap)
      raw("\nendstream\n")
    }
    val xrefAt = out.size()
    raw(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => raw(f"$o%010d 00000 n \n"))
    raw(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
