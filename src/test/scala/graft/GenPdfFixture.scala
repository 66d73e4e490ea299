package graft

/** One-off generator for src/main/resources/graft/fixtures/report.pdf: the
  * bundled binary PDF whose extracted text is exactly pdf.txt (two pages,
  * FlateDecode streams). Re-run via `sbt "Test/runMain graft.GenPdfFixture"`
  * whenever pdf.txt changes; PdfTextSpec pins the equivalence.
  */
object GenPdfFixture {
  def main(args: Array[String]): Unit = {
    val text = new String(
      getClass.getResourceAsStream("/graft/fixtures/pdf.txt").readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = text.stripLineEnd.split("\n", -1)
    val (p1, p2) = lines.splitAt(lines.length / 2)
    val out = java.nio.file.Paths.get("src/main/resources/graft/fixtures/report.pdf")
    MiniPdf.writeFile(out, Seq(p1.mkString("\n"), p2.mkString("\n")))
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
  }
}
