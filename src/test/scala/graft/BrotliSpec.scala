package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.BrotliDec

/** From-scratch RFC 7932 decoder vs a matrix of streams produced by
  * the reference encoder (src/test/resources/brotli, generated once in
  * this sandbox from the real brotli library at qualities 1/5/9/11
  * over text / UTF-8 / binary / repetitive / window-wrap inputs), plus
  * the reference repo's own fixture and per-transform ground truth.
  */
class BrotliSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing test resource $name")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](65536)
      var n = in.read(tmp)
      while (n > 0) { bos.write(tmp, 0, n); n = in.read(tmp) }
      bos.toByteArray
    } finally in.close()
  }

  private val vectors = new String(res("manifest.tsv"), "UTF-8")
    .split("\n").filter(_.nonEmpty).map(_.split("\t")(0))

  test("reference-encoder matrix decodes byte-identically") {
    vectors.foreach { name =>
      val got = BrotliDec.decompress(res(s"$name.br"))
      val want = res(s"$name.raw")
      assert(got.length == want.length,
        s"$name: length ${got.length} != ${want.length}")
      assert(java.util.Arrays.equals(got, want), s"$name: content mismatch")
    }
  }

  test("the reference repo's .br fixture decodes to its csv twin") {
    val br = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/fixtures/2cols6rows.csv.br"))
    val csv = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/fixtures/2cols6rows.csv"))
    // the fixture pair differs in line endings only: the .br content
    // is CRLF (59 bytes), the bare .csv twin is LF (53) — normalize
    // before comparing; the table-level equality is ConverterSpec's
    val got = new String(BrotliDec.decompress(br), "UTF-8")
    assert(got.replace("\r\n", "\n") == new String(csv, "UTF-8"))
  }

  test("all 121 dictionary transforms match the reference library's output") {
    // ground truth generated with BrotliTransformDictionaryWord on the
    // first 4-letter dictionary word ("time")
    // split keeps empty lines: omit-first/last >= 4 on a 4-letter word
    // yields an EMPTY output, which is itself part of the contract
    val truth = new String(res("transform_truth_time.txt"), "US-ASCII")
      .split("\n", -1).take(121)
    assert(truth.length == 121)
    val word = "time".getBytes("US-ASCII")
    truth.zipWithIndex.foreach { case (hex, t) =>
      val got = BrotliDec.transformWord(word, t)
        .map(b => f"${b & 0xFF}%02x").mkString
      assert(got == hex, s"transform $t")
    }
  }

  test("hostile inputs fail loudly, never hang or return garbage silently") {
    intercept[Throwable](BrotliDec.decompress(Array.emptyByteArray))
    intercept[Throwable](BrotliDec.decompress(Array[Byte](0x21, 0x10)))
    // truncated real stream
    val real = res("csv_q11.br")
    intercept[Throwable](
      BrotliDec.decompress(java.util.Arrays.copyOf(real, real.length / 2)))
    // metadata meta-block whose declared skip runs past the end of the
    // stream: WBITS=16, ISLAST=1, MNIBBLES=11 (metadata), MSKIPBYTES=1,
    // skip length 201 — but the file ends right after the length byte
    intercept[Throwable](
      BrotliDec.decompress(Array[Byte](0x5A, 0xC8.toByte)))
  }
}
