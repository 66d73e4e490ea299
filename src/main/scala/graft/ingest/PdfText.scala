package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** S6: REAL PDF text extraction (SURVEY §2.1-S6; reference pdfplumber loop
  * main.py:250–258), pure JVM — no external codec dependency.
  *
  * Scope: the classic PDF subset — objects with literal dictionaries,
  * uncompressed or FlateDecode content streams, text drawn with the
  * `Tj` / `'` / `"` / `TJ` operators, page order from the `/Pages` tree.
  * That covers simple text-report PDFs (the reference's input class),
  * plus PDF 1.5 object streams, PNG/TIFF-predicted FlateDecode, CID
  * fonts via /ToUnicode CMaps (bfchar + both bfrange forms, 1- and 2-byte
  * codespaces), and the full Standard-security matrix — RC4 (/V 1–2,
  * /R 2–3), AES-128 (/V 4 /R 4, /AESV2) and AES-256 (/V 5 /R 6, /AESV3
  * with the ISO 32000-2 Algorithm 2.B key derivation), all with the
  * empty user password; remaining exotica (real passwords, CMap-less
  * CID) fall back to whatever pages remain parseable, never an
  * exception. Like pdfplumber's
  * `extract_text`, each page becomes newline-joined lines and pages are
  * joined with a trailing "\n" per non-empty page (main.py:255–257).
  *
  * Distribution: decoding runs inside the executors over Spark's
  * `binaryFile` source — one task per file group, no driver funnel — and
  * document order follows the reference's numeric-suffix filename sort
  * (O1, main.py:543–546) via the GlobalSeq boundary-exchange plan.
  */
object PdfText {

  // ---------------------------------------------------------------- parsing

  /** 1 byte = 1 char, offset-preserving view for regex work. */
  private def latin1(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.ISO_8859_1)

  private val objRe: Regex = """(?s)(\d+)\s+(\d+)\s+obj\b""".r
  private val refRe: Regex = """(\d+)\s+\d+\s+R""".r

  private final case class PdfObj(dict: String, stream: Option[Array[Byte]],
    gen: Int = 0)

  /** Scan every `N G obj … endobj` in the file; tolerate damage by skipping
    * objects that fail to delimit. */
  private def scanObjects(s: String, bytes: Array[Byte]): Map[Int, PdfObj] = {
    val out = Map.newBuilder[Int, PdfObj]
    for (m <- objRe.findAllMatchIn(s)) {
      val num = m.group(1).toInt
      val gen = m.group(2).toInt
      val end = s.indexOf("endobj", m.end)
      if (end >= 0) {
        val body = s.substring(m.end, end)
        val streamAt = body.indexOf("stream")
        if (streamAt < 0) out += num -> PdfObj(body, None, gen)
        else {
          val dict = body.substring(0, streamAt)
          // stream data starts after "stream" + EOL (CRLF or LF)
          var dataStart = m.end + streamAt + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val dataEnd = s.indexOf("endstream", dataStart)
          if (dataEnd < 0) out += num -> PdfObj(dict, None, gen)
          else {
            // trim the EOL that precedes "endstream"
            var e = dataEnd
            if (e > dataStart && s.charAt(e - 1) == '\n') e -= 1
            if (e > dataStart && s.charAt(e - 1) == '\r') e -= 1
            out += num -> PdfObj(dict,
              Some(java.util.Arrays.copyOfRange(bytes, dataStart, e)), gen)
          }
        }
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return Array.emptyByteArray
      }
      out.toByteArray
    } catch { case _: Exception => Array.emptyByteArray }
    finally inf.end()
  }

  /** Undo PNG row prediction (PDF 1.7 §7.4.4.4 via RFC 2083): streams
    * written with /DecodeParms << /Predictor >= 10 /Columns c >> prepend a
    * per-row filter-type byte and delta-encode each row — common on object
    * and cross-reference streams in the wild. bpp is 1 here (PDF predictors
    * run component-wise; object/xref streams use 8-bit columns). */
  private[graft] def unpredictPng(data: Array[Byte], columns: Int): Array[Byte] = {
    val stride = columns
    val rows = data.length / (stride + 1)
    val out = new Array[Byte](rows * stride)
    var r = 0
    while (r < rows) {
      val ft = data(r * (stride + 1)) & 0xff
      val src = r * (stride + 1) + 1
      val dst = r * stride
      var i = 0
      while (i < stride) {
        val raw = data(src + i) & 0xff
        val left = if (i > 0) out(dst + i - 1) & 0xff else 0
        val up = if (r > 0) out(dst - stride + i) & 0xff else 0
        val upLeft = if (r > 0 && i > 0) out(dst - stride + i - 1) & 0xff else 0
        val recon = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - upLeft))
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(dst + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Undo TIFF horizontal differencing (/Predictor 2, 8-bit components):
    * each byte is stored as a delta from its left neighbor within the row —
    * the undo is a per-row cumulative sum. */
  private[graft] def unpredictTiff(data: Array[Byte], columns: Int): Array[Byte] = {
    val out = data.clone()
    var r = 0
    while (r * columns < out.length) {
      val base = r * columns
      var i = 1
      while (i < columns && base + i < out.length) {
        out(base + i) = ((out(base + i) + out(base + i - 1)) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Decode a stream per its /Filter: none → raw, FlateDecode → inflate
    * (with PNG- or TIFF-predictor post-pass when /DecodeParms asks for
    * one), anything else → unsupported (empty). */
  private def decodeStream(obj: PdfObj): Array[Byte] = obj.stream match {
    case None => Array.emptyByteArray
    case Some(data) =>
      val filters = """/Filter\s*(?:/(\w+)|\[([^\]]*)\])""".r.findFirstMatchIn(obj.dict) match {
        case None => Nil
        case Some(m) =>
          if (m.group(1) != null) List(m.group(1))
          else """/(\w+)""".r.findAllMatchIn(m.group(2)).map(_.group(1)).toList
      }
      filters match {
        case Nil => data
        case List("FlateDecode") =>
          val inflated = inflate(data)
          // toIntOption: an absurd numeral in a corrupt dict must fall back
          // to "no prediction", never throw out of the skip-don't-throw path
          val pred = """/Predictor\s+(\d+)""".r.findFirstMatchIn(obj.dict)
            .flatMap(_.group(1).toIntOption).getOrElse(1)
          def columns = """/Columns\s+(\d+)""".r.findFirstMatchIn(obj.dict)
            .flatMap(_.group(1).toIntOption).filter(_ > 0).getOrElse(1)
          if (pred >= 10) unpredictPng(inflated, columns)
          else if (pred == 2) unpredictTiff(inflated, columns)
          else inflated // predictor 1 = no prediction
        case _ => Array.emptyByteArray // unsupported codec: skip, never throw
      }
  }

  /** PDF 1.5+ object streams (/Type /ObjStm): dictionaries packed inside a
    * Flate-compressed stream — header is N (objnum, offset) integer pairs,
    * object bodies start at /First. Expanded into the object map so the
    * /Pages tree walk sees them; top-level definitions win on collision. */
  private def expandObjectStreams(objs: Map[Int, PdfObj]): Map[Int, PdfObj] = {
    val objStmRe = """/Type\s*/ObjStm""".r
    val extra = objs.values
      .filter(o => objStmRe.findFirstIn(o.dict).isDefined)
      .flatMap { o =>
        val data = decodeStream(o)
        if (data.isEmpty) Nil
        else {
          val s = latin1(data)
          val n = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict)
            .map(_.group(1).toInt).getOrElse(0)
          val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict)
            .map(_.group(1).toInt).getOrElse(0)
          val header = s.substring(0, math.min(first, s.length))
          val nums = """\d+""".r.findAllIn(header).map(_.toInt).toSeq
          val pairs = nums.grouped(2).collect { case Seq(num, off) => (num, off) }
            .toSeq.take(n)
          pairs.zipWithIndex.map { case ((num, off), i) =>
            val start = math.min(first + off, s.length)
            val end =
              if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
              else s.length
            num -> PdfObj(s.substring(start, end), None)
          }
        }
      }.toMap
    extra ++ objs // top-level definitions take precedence
  }

  /** Page object numbers in reading order: walk /Root → /Pages → /Kids
    * depth-first; fall back to file-order /Type /Page objects. */
  private def pageOrder(s: String, objs: Map[Int, PdfObj]): Seq[Int] = {
    val pageRe = """/Type\s*/Page(?!s)""".r
    def isPage(n: Int) = objs.get(n).exists(o => pageRe.findFirstIn(o.dict).isDefined)
    val fromTree: Seq[Int] = {
      val root = """/Root\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s).map(_.group(1).toInt)
      val top = root.flatMap(r => objs.get(r)).flatMap(c =>
        """/Pages\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(c.dict).map(_.group(1).toInt))
      val seen = scala.collection.mutable.Set.empty[Int]
      def walk(n: Int): Seq[Int] =
        if (!seen.add(n)) Nil
        else objs.get(n) match {
          case None => Nil
          case Some(o) if pageRe.findFirstIn(o.dict).isDefined => Seq(n)
          case Some(o) =>
            """/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(o.dict) match {
              case Some(k) => refRe.findAllMatchIn(k.group(1)).map(_.group(1).toInt)
                .toSeq.flatMap(walk)
              case None => Nil
            }
        }
      top.map(walk).getOrElse(Nil)
    }
    if (fromTree.nonEmpty) fromTree
    else objRe.findAllMatchIn(s).map(_.group(1).toInt).toSeq.distinct.filter(isPage)
  }

  /** Content stream bytes for one page (/Contents ref or array of refs). */
  private def pageContent(page: PdfObj, objs: Map[Int, PdfObj]): Array[Byte] = {
    val refs = """/Contents\s*(?:(\d+)\s+\d+\s+R|\[([^\]]*)\])""".r
      .findFirstMatchIn(page.dict) match {
      case None => Nil
      case Some(m) =>
        if (m.group(1) != null) List(m.group(1).toInt)
        else refRe.findAllMatchIn(m.group(2)).map(_.group(1).toInt).toList
    }
    val out = new java.io.ByteArrayOutputStream()
    refs.foreach(r => objs.get(r).foreach { o => out.write(decodeStream(o)); out.write('\n') })
    out.toByteArray
  }

  // ------------------------------------------------------- CID / ToUnicode

  /** A parsed /ToUnicode CMap: fixed code width in bytes (1 or 2 — the
    * Identity-H two-byte case is what real-world CID PDFs ship) and the
    * code → Unicode-string mapping. */
  private[graft] final case class ToUni(width: Int, map: Map[Int, String])

  private val hexTokRe: Regex = """<([0-9a-fA-F]+)>""".r

  private def hexToInt(h: String): Int = Integer.parseInt(h, 16)

  private def hexToStr(h: String): String = {
    // destination hex is UTF-16BE code units (possibly several per code)
    val padded = if (h.length % 2 == 1) h + "0" else h
    val bs = padded.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
    new String(bs, StandardCharsets.UTF_16BE)
  }

  /** Parse a ToUnicode CMap stream: codespace width + bfchar/bfrange
    * sections (including the array-destination bfrange form). Tolerant:
    * anything unparseable contributes nothing. */
  private[graft] def parseToUnicode(cmap: String): ToUni = {
    val width = """begincodespacerange\s*<([0-9a-fA-F]+)>""".r
      .findFirstMatchIn(cmap).map(_.group(1).length / 2)
      .filter(w => w == 1 || w == 2)
      .getOrElse(2) // Identity-H default
    val m = Map.newBuilder[Int, String]
    for (blk <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap)) {
      val toks = hexTokRe.findAllMatchIn(blk.group(1)).map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => m += hexToInt(src) -> hexToStr(dst)
        case _ => ()
      }
    }
    for (blk <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap)) {
      // each entry: <lo> <hi> <dstStart>   OR   <lo> <hi> [<d0> <d1> …]
      val entryRe =
        """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*(?:<([0-9a-fA-F]+)>|\[([^\]]*)\])""".r
      for (e <- entryRe.findAllMatchIn(blk.group(1))) {
        val lo = hexToInt(e.group(1)); val hi = hexToInt(e.group(2))
        if (hi >= lo && hi - lo < 65536) {
          if (e.group(3) != null) {
            val d0 = e.group(3)
            val base = hexToInt(d0)
            // increment applies to the LAST code unit (PDF 1.7 §9.10.3)
            (lo to hi).foreach { c =>
              val h = (base + (c - lo)).toHexString
              m += c -> hexToStr(("0" * (d0.length - h.length max 0)) + h)
            }
          } else {
            val dsts = hexTokRe.findAllMatchIn(e.group(4)).map(_.group(1)).toSeq
            (lo to hi).zip(dsts).foreach { case (c, d) => m += c -> hexToStr(d) }
          }
        }
      }
    }
    ToUni(width, m.result())
  }

  /** Map raw string bytes through a CMap: consume `width`-byte code units,
    * emit each mapped string; unmapped codes contribute nothing (the
    * pdfminer convention for text extraction). */
  private def applyToUni(bs: Array[Byte], tu: ToUni): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + tu.width <= bs.length) {
      var code = 0
      var j = 0
      while (j < tu.width) { code = (code << 8) | (bs(i + j) & 0xff); j += 1 }
      tu.map.get(code).foreach(sb ++= _)
      i += tu.width
    }
    sb.toString
  }

  /** Per-page font-name → ToUnicode CMap table: /Resources (inline or
    * indirect) → /Font dict → each `/Fx N 0 R` entry whose font object
    * carries /ToUnicode. Fonts without a CMap simply don't appear (their
    * strings keep the latin1/UTF-16BE fallback paths). */
  private def pageFonts(page: PdfObj, objs: Map[Int, PdfObj]): Map[String, ToUni] = {
    val resDict: String =
      """/Resources\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(page.dict) match {
        case Some(r) => objs.get(r.group(1).toInt).map(_.dict).getOrElse("")
        case None => page.dict // inline resources: scan the page dict itself
      }
    val fontBlock =
      """(?s)/Font\s*<<(.*?)>>""".r.findFirstMatchIn(resDict).map(_.group(1))
        .getOrElse("")
    val out = Map.newBuilder[String, ToUni]
    for (m <- """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fontBlock)) {
      val (name, ref) = (m.group(1), m.group(2).toInt)
      for {
        fontObj <- objs.get(ref)
        tuRef <- """/ToUnicode\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(fontObj.dict)
        tuObj <- objs.get(tuRef.group(1).toInt)
      } {
        val cmap = latin1(decodeStream(tuObj))
        if (cmap.nonEmpty) out += name -> parseToUnicode(cmap)
      }
    }
    out.result()
  }

  // ------------------------------------------------- content-stream text ops

  /** Extract shown text from one content stream: literal/hex strings fed to
    * the show operators (Tj, TJ, quote forms); the line-move operators
    * (Td, TD, T-star, ET) start a new line — the layout subset matching
    * pdfplumber's line reconstruction for simple one-column text. */
  private[ingest] def contentText(content: Array[Byte],
      fonts: Map[String, ToUni] = Map.empty): String = {
    val s = latin1(content)
    val sb = new StringBuilder
    val pending = ArrayBuffer.empty[String]
    // every line-move appends a break (blank drawn lines survive; the
    // page-level trim in extract() drops leading/trailing ones)
    def newline(): Unit = if (sb.nonEmpty) sb.append('\n')
    def flushShow(): Unit = { pending.foreach(sb ++= _); pending.clear() }
    // CID support: the font selected by the most recent `/Fx size Tf`
    // decides how string BYTES map to text (ToUnicode CMap when present)
    var lastName = ""
    var curFont: Option[ToUni] = None
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') { // literal string
        val buf = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case 'n' => buf.append('\n'); i += 2
              case 'r' => buf.append('\r'); i += 2
              case 't' => buf.append('\t'); i += 2
              case 'b' => buf.append('\b'); i += 2
              case 'f' => buf.append('\f'); i += 2
              case '(' => buf.append('('); i += 2
              case ')' => buf.append(')'); i += 2
              case '\\' => buf.append('\\'); i += 2
              case '\r' => i += 2; if (i < n && s.charAt(i) == '\n') i += 1 // line continuation
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' => // up to 3 octal digits
                var j = i + 1; var v = 0
                while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                  v = v * 8 + (s.charAt(j) - '0'); j += 1
                }
                buf.append(v.toChar); i = j
              case other => buf.append(other); i += 2
            }
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) buf.append(ch)
            i += 1
          }
        }
        pending += (curFont match {
          case Some(tu) =>
            applyToUni(buf.toString.map(c => (c.toInt & 0xff).toByte).toArray, tu)
          case None => buf.toString
        })
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') { // hex string
        val end = s.indexOf('>', i + 1)
        if (end < 0) i = n
        else {
          val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          val bs = padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
          val str = curFont match {
            case Some(tu) => applyToUni(bs, tu)
            case None =>
              if (bs.length >= 2 && (bs(0) & 0xff) == 0xfe && (bs(1) & 0xff) == 0xff)
                new String(bs, 2, bs.length - 2, StandardCharsets.UTF_16BE)
              else new String(bs, StandardCharsets.ISO_8859_1)
          }
          pending += str
          i = end + 1
        }
      } else if (c == '<') { i += 2 } // << dict open (inline images etc.)
      else if (c == '[' || c == ']' || c == '{' || c == '}' || c == '>') i += 1
      else if (c == '/') { // name token (remember it — `/F1 11 Tf` selects)
        i += 1
        val start = i
        while (i < n && !" \t\r\n()<>[]{}/%".contains(s.charAt(i))) i += 1
        lastName = s.substring(start, i)
      } else if (c.isWhitespace) i += 1
      else if (c == '+' || c == '-' || c == '.' || c.isDigit) { // number
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      } else { // operator token
        val start = i
        while (i < n && !" \t\r\n()<>[]{}/%".contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "Tj" | "TJ" => flushShow()
          case "'" => newline(); flushShow()
          case "\"" => newline(); flushShow()
          case "Td" | "TD" | "T*" | "ET" => newline(); pending.clear()
          case "Tf" => curFont = fonts.get(lastName); pending.clear()
          case _ => pending.clear()
        }
      }
    }
    sb.toString
  }

  // --------------------------------------------------------------- encryption

  /** RC4 — the /V 1–2 cipher of the Standard security handler (PDF 1.7
    * §7.6.2). Pure JDK; symmetric, so the same routine encrypts fixtures. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    for (k <- data.indices) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
    }
    out
  }

  /** The 32-byte password pad of §7.6.3.3 (empty user password pads to
    * exactly this). */
  private[graft] val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(bs: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    bs.foreach(md.update)
    md.digest()
  }

  /** Algorithm 2 file key (empty user password): MD5(pad ‖ O ‖ P-as-LE32 ‖
    * ID[0]), re-hashed 50× over the first n bytes for /R 3. n = 5 bytes for
    * /R 2, /Length÷8 for /R 3. */
  private[graft] def fileKey(o: Array[Byte], p: Int, id0: Array[Byte],
      r: Int, lenBits: Int): Array[Byte] = {
    val pLe = Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    var h = md5(PasswordPad, o, pLe, id0)
    val n = if (r == 2) 5 else math.max(5, lenBits / 8)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithm 1 per-object key: MD5(fileKey ‖ objnum-LE24 ‖ gen-LE16),
    * truncated to min(n+5, 16). For AESV2 the spec appends the constant
    * salt "sAlT" (73 41 6C 54) before hashing. */
  private[graft] def objectKey(fk: Array[Byte], num: Int, gen: Int,
      aes: Boolean = false): Array[Byte] = {
    val ext = Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salted = if (aes) ext ++ Array[Byte](0x73, 0x41, 0x6C, 0x54) else ext
    md5(fk, salted).take(math.min(fk.length + 5, 16))
  }

  /** ISO 32000-2 Algorithm 2.B (the /R 6 iterated hash): SHA-256 of
    * (pwd ‖ salt ‖ udata), then rounds of AES-128-CBC over the 64×
    * repeated (pwd ‖ K ‖ udata) block with the digest choice driven by
    * the ciphertext — stops after ≥ 64 rounds when the last cipher byte
    * permits. Returns the 32-byte key. */
  private[graft] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    def sha(alg: String, b: Array[Byte]) =
      java.security.MessageDigest.getInstance(alg).digest(b)
    var k = sha("SHA-256", pwd ++ salt ++ udata)
    var i = 0
    var done = false
    while (!done) {
      val base = pwd ++ k ++ udata
      val k1 = new Array[Byte](base.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(base, 0, k1, j * base.length, base.length); j += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" }, e)
      i += 1
      if (i >= 64 && (e.last & 0xff) <= i - 32) done = true
    }
    k.take(32)
  }

  /** /R 6 file key from /U (48 bytes: hash ‖ validationSalt ‖ keySalt) and
    * /UE (the AES-wrapped file key), empty user password: validate
    * hash2B(ε, vSalt) against U[0..32), then unwrap UE with
    * hash2B(ε, kSalt) (AES-256-CBC, zero IV, no padding). None if the
    * validation fails (a real password) or the fields are malformed. */
  private[graft] def fileKeyR6(u: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32) return None
    val vSalt = u.slice(32, 40)
    val kSalt = u.slice(40, 48)
    val empty = Array.emptyByteArray
    if (!java.util.Arrays.equals(hash2B(empty, vSalt, empty), u.take(32))) return None
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(hash2B(empty, kSalt, empty), "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      Some(c.doFinal(ue.take(32)))
    } catch { case _: Throwable => None }
  }

  /** AES-CBC decryption of an AESV2/AESV3 stream (the key length picks the
    * variant): the first 16 bytes are the IV, the rest the ciphertext;
    * PKCS#5 padding is stripped leniently (malformed padding keeps the
    * block — degrade, never throw). */
  private[graft] def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length % 16) != 0) return Array.emptyByteArray
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      val plain = c.doFinal(data.drop(16))
      val pad = plain.last & 0xff
      if (pad >= 1 && pad <= 16 && pad <= plain.length &&
        plain.takeRight(pad).forall(b => (b & 0xff) == pad))
        plain.dropRight(pad)
      else plain
    } catch { case _: Throwable => Array.emptyByteArray }
  }

  /** The PDF string value following name `key` in `dict` — literal `(…)`
    * (escapes, octals, balanced parens) or hex `<…>`. Binary-safe via the
    * latin1 1-byte=1-char view. */
  private[graft] def pdfStringAfter(dict: String, key: String): Option[Array[Byte]] = {
    val at = dict.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (i >= dict.length) None
    else if (dict.charAt(i) == '<') {
      val end = dict.indexOf('>', i)
      if (end < 0) None
      else {
        val hex = dict.substring(i + 1, end).filterNot(_.isWhitespace)
        val even = if (hex.length % 2 == 1) hex + "0" else hex
        Some(even.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
      }
    } else if (dict.charAt(i) == '(') {
      val out = ArrayBuffer.empty[Byte]
      var depth = 1
      i += 1
      while (i < dict.length && depth > 0) {
        val c = dict.charAt(i)
        if (c == '\\' && i + 1 < dict.length) {
          dict.charAt(i + 1) match {
            case 'n' => out += '\n'.toByte; i += 2
            case 'r' => out += '\r'.toByte; i += 2
            case 't' => out += '\t'.toByte; i += 2
            case 'b' => out += '\b'.toByte; i += 2
            case 'f' => out += '\f'.toByte; i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < dict.length && j < i + 4 &&
                dict.charAt(j) >= '0' && dict.charAt(j) <= '7') {
                v = v * 8 + (dict.charAt(j) - '0'); j += 1
              }
              out += v.toByte; i = j
            case other => out += other.toByte; i += 2
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) out += c.toByte
          i += 1
        }
      }
      Some(out.toArray)
    } else None
  }

  /** Standard-security decryption (/Filter /Standard, empty user
    * password — the overwhelmingly common "encrypted" PDF in a crawl):
    * RC4 for /V 1–2 /R 2–3, AES-128-CBC for /V 4 /R 4 with the /AESV2
    * crypt filter. Every top-level stream is decrypted with its
    * per-object key; the encryption dictionary itself is exempt per
    * spec. AES-256 (/V 5 /R 5–6 with the /AESV3 crypt filter) is also
    * handled for the empty-user-password case via the R6 key-derivation
    * (fileKeyR6); only files with a real password fall through untouched,
    * so extraction degrades to whatever remains parseable — never an
    * exception. */
  private def decryptIfNeeded(s: String, objs: Map[Int, PdfObj]): Map[Int, PdfObj] = {
    val encAt = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(s).toSeq.lastOption
    // (encNum, fileKey, mode): mode 0 = RC4 per-object, 1 = AESV2
    // per-object (sAlT), 2 = AESV3 (file key used directly)
    val prepared: Option[(Int, Array[Byte], Int)] = for {
      m <- encAt
      encNum = m.group(1).toInt
      enc <- objs.get(encNum).map(_.dict)
      if enc.contains("/Standard")
      v = """/V\s+(\d+)""".r.findFirstMatchIn(enc).map(_.group(1).toInt).getOrElse(0)
      r = """/R\s+(\d+)""".r.findFirstMatchIn(enc).map(_.group(1).toInt).getOrElse(2)
      aes2 = v == 4 && r == 4 && enc.contains("/AESV2")
      aes3 = v == 5 && (r == 5 || r == 6) && enc.contains("/AESV3")
      if ((v == 1 || v == 2) && (r == 2 || r == 3)) || aes2 || aes3
      key <- if (aes3) {
        for {
          u <- pdfStringAfter(enc, "/U")
          ue <- pdfStringAfter(enc, "/UE")
          fk <- fileKeyR6(u, ue)
        } yield fk
      } else {
        for {
          o <- pdfStringAfter(enc, "/O")
          p <- """/P\s+(-?\d+)""".r.findFirstMatchIn(enc).map(_.group(1).toLong.toInt)
        } yield {
          val lenBits = """/Length\s+(\d+)""".r.findFirstMatchIn(enc)
            .map(_.group(1).toInt).getOrElse(if (aes2) 128 else 40)
          // first element of the trailer /ID array (hex form; absent → empty)
          val id0 = """/ID\s*\[\s*<([0-9A-Fa-f\s]*)>""".r.findFirstMatchIn(s)
            .map { mm =>
              val hex = mm.group(1).filterNot(_.isWhitespace)
              hex.grouped(2).filter(_.length == 2)
                .map(h => Integer.parseInt(h, 16).toByte).toArray
            }.getOrElse(Array.emptyByteArray)
          fileKey(o, p, id0, r, lenBits)
        }
      }
    } yield (encNum, key, if (aes3) 2 else if (aes2) 1 else 0)
    prepared match {
      case None => objs
      case Some((encNum, fk, mode)) =>
        objs.map { case (num, obj) =>
          num -> (if (num == encNum) obj
            else obj.copy(stream = obj.stream.map { st =>
              mode match {
                case 2 => aesDecrypt(fk, st)
                case 1 => aesDecrypt(objectKey(fk, num, obj.gen, aes = true), st)
                case _ => rc4(objectKey(fk, num, obj.gen), st)
              }
            }))
        }
    }
  }

  // --------------------------------------------------------------- public API

  /** Whole-document text: pages in /Pages-tree order, each page's text
    * suffixed "\n" when non-empty — byte-for-byte the pdfplumber
    * accumulation loop of main.py:252–257. Never throws: undecodable
    * streams/pages contribute nothing. */
  def extract(bytes: Array[Byte]): String = {
    val s = latin1(bytes)
    if (!s.startsWith("%PDF")) return ""
    // order matters: decrypt top-level streams first (objects inside an
    // ObjStm are covered by their container's decryption, never their own)
    val objs = expandObjectStreams(decryptIfNeeded(s, scanObjects(s, bytes)))
    val pages = pageOrder(s, objs)
    val sb = new StringBuilder
    pages.foreach { p =>
      val text = contentText(pageContent(objs(p), objs), pageFonts(objs(p), objs))
        .linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n")
        .replaceAll("\\n+$", "").replaceAll("^\\n+", "")
      if (text.nonEmpty) { sb ++= text; sb += '\n' }
    }
    sb.toString
  }

  /** Spark source: every `*.pdf` under `path` → one row per document,
    * (doc_seq, value) where value is the full extracted text and doc_seq
    * follows the numeric-suffix filename sort (O1). Decode runs in the
    * executors via the binaryFile source; only pre-extracted text shuffles. */
  def fromPdfFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val decoded = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) => (p, extract(bytes)) })
      .toDF("path", "value")
      .withColumn("file_seq",
        regexp_extract(regexp_extract(col("path"), "([^/]+)$", 1), "(\\d+)", 1)
          .cast("long"))
    GlobalSeq.withSeq(decoded, Seq(col("file_seq"), col("path")), "doc_seq")
      .select(col("doc_seq"), col("value"))
  }
}
