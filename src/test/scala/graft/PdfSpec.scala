package graft

import graft.operators.{Pdf, PdfOps}

/** Real-PDFBox transform semantics (Workers.java:111-221 parity). */
class PdfSpec extends SparkFunSuite {

  private val payload = "doc 42 0123456789abcdef0123456789abcdef"

  test("ToText round-trip: page-1 extraction returns the synthesized text") {
    val pdf = PdfOps.synthPdf(payload, encrypted = false, corrupt = false)
    assert(PdfOps.toText(pdf).trim === payload)
  }

  test("ToText extracts PAGE 1 ONLY (Workers.java:137-139 setStartPage/setEndPage)") {
    // Two-page doc: page 2 carries different text that must NOT appear.
    val doc = new org.apache.pdfbox.pdmodel.PDDocument()
    try {
      for (text <- Seq("page one text", "page two text")) {
        val page = new org.apache.pdfbox.pdmodel.PDPage(
          new org.apache.pdfbox.pdmodel.common.PDRectangle(200, 100))
        doc.addPage(page)
        val cs = new org.apache.pdfbox.pdmodel.PDPageContentStream(doc, page)
        cs.beginText()
        cs.setFont(org.apache.pdfbox.pdmodel.font.PDType1Font.HELVETICA, 6)
        cs.newLineAtOffset(10, 50)
        cs.showText(text)
        cs.endText()
        cs.close()
      }
      val bos = new java.io.ByteArrayOutputStream()
      doc.save(bos)
      val extracted = PdfOps.toText(bos.toByteArray)
      assert(extracted.contains("page one text"))
      assert(!extracted.contains("page two text"))
    } finally doc.close()
  }

  test("ToHTML returns a full HTML document containing the page text") {
    val pdf = PdfOps.synthPdf(payload, encrypted = false, corrupt = false)
    val html = PdfOps.toHtml(pdf)
    assert(html.startsWith("<!DOCTYPE html"))
    assert(html.contains("<html>") && html.contains("</html>"))
    assert(html.contains(payload))
  }

  test("ToImage returns a real PNG with the page's pixel dimensions in IHDR") {
    val pdf = PdfOps.synthPdf(payload, encrypted = false, corrupt = false)
    val png = PdfOps.toImagePng(pdf)
    assert(png != null)
    // PNG signature
    assert(png.take(8).map("%02x".format(_)).mkString === "89504e470d0a1a0a")
    // IHDR width/height big-endian at offsets 16 and 20 (200x100 page at 72dpi)
    def be32(off: Int) = (0 until 4).map(i => (png(off + i) & 0xff) << (8 * (3 - i))).sum
    assert(be32(16) === 200 && be32(20) === 100)
  }

  test("encrypted document short-circuits to the reference's error value") {
    val enc = PdfOps.synthPdf(payload, encrypted = true, corrupt = false)
    assert(PdfOps.toText(enc) === "Error: File is Encrypted")
    assert(PdfOps.convert(enc, "ToImage") === "Error: File is Encrypted")
    assert(PdfOps.toImagePng(enc) === null)
  }

  test("unloadable bytes become the in-band fetch-failure error, never a throw") {
    val bad = "%PDF-not-really-a-document".getBytes("UTF-8")
    assert(PdfOps.convert(bad, "ToText") ===
      "Error: PDF file not found - java.io.IOException")
  }

  test("unsupported operation dispatches to the error row (Workers.java:185-187)") {
    val pdf = PdfOps.synthPdf(payload, encrypted = false, corrupt = false)
    assert(PdfOps.convert(pdf, "ToPdfA") === "Error: Unsupported operation: ToPdfA")
  }

  test("catalog query: every sampled doc yields one row; error taxonomy complete") {
    val rows = Pdf.pdfTransforms(spark, sf).collect()
    assert(rows.nonEmpty)
    val outputs = rows.map(_.getAs[String]("output"))
    assert(outputs.exists(_.startsWith("text:doc ")))
    assert(outputs.exists(_.startsWith("html:doc ")))
    assert(outputs.exists(_ === "png:200x100:89504e470d0a1a0a"))
    assert(outputs.exists(_ === "Error: File is Encrypted"))
    assert(outputs.exists(_.startsWith("Error: Unsupported operation: ")))
    // is_error column is consistent with the output prefix
    assert(rows.forall(r =>
      r.getAs[Boolean]("is_error") === r.getAs[String]("output").startsWith("Error:")))
  }
}
