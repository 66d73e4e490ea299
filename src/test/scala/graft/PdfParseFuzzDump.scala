package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Engine half of the cross-language J1 scanner fuzz
  * (tools/fuzz_pdf_scan.py drives it): reads base64-encoded chunk texts
  * (one per line), runs the REAL PdfParse.parseChunk on each, writes
  * base64(name)\tbase64(rem2) per line ('-' for a null name). Pure JVM —
  * no Spark session. */
object PdfParseFuzzDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PdfParseFuzzDump <in.b64lines> <out.tsv>")
    val dec = Base64.getDecoder
    val enc = Base64.getEncoder
    val out = new StringBuilder
    for (line <- Files.readAllLines(Paths.get(args(0))).toArray(Array.empty[String])) {
      val chunk = new String(dec.decode(line), StandardCharsets.UTF_8)
      val info = graft.matching.PdfParse.parseChunk(chunk)
      val nameB64 =
        if (info.name == null) "-"
        else enc.encodeToString(info.name.getBytes(StandardCharsets.UTF_8))
      val rem2B64 = enc.encodeToString(info.rem2.getBytes(StandardCharsets.UTF_8))
      out.append(nameB64).append('\t').append(rem2B64).append('\n')
    }
    Files.write(Paths.get(args(1)), out.toString.getBytes(StandardCharsets.UTF_8))
    println(s"dumped ${Files.readAllLines(Paths.get(args(0))).size} chunks")
  }
}
