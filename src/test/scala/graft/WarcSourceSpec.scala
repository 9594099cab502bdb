package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/** WARC/WET codec + distributed reader spec: framing round trips
  * (including payloads that contain the record separator bytes), UTF-8
  * byte-vs-char accounting, warcinfo passthrough, uncompressed input,
  * the malformed-stream IllegalArgumentException contract, and the
  * per-file provenance columns of the Spark reader.
  */
class WarcSourceSpec extends SparkSpec {

  private def parse(bytes: Array[Byte]): Seq[(String, String, String)] = {
    val in = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
    try WarcSource.parseRecords(in).toList
    finally in.close()
  }

  test("wet round trip: payloads with embedded CRLF, unicode, empty body") {
    val recs = Seq(
      ("https://a.example/1", "plain text"),
      ("https://a.example/2", "line1\r\n\r\nline2\nline3"), // contains the separator
      ("https://a.example/3", "h\u00e9llo \u4e16\u754c"), // bytes != chars
      ("https://a.example/4", ""))
    val got = parse(WarcSource.encodeWetGz(recs))
    assert(got.length == 5) // + warcinfo
    assert(got.head._2 == "warcinfo")
    assert(got.tail.map(r => (r._1, r._3)) == recs)
    assert(got.tail.forall(_._2 == "conversion"))
  }

  test("wet parses an uncompressed stream via magic sniffing") {
    val gz = WarcSource.encodeWetGz(Seq(("u://x", "abc")), warcinfo = false)
    val plain = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(gz)).readAllBytes()
    val got = WarcSource.parseRecords(new ByteArrayInputStream(plain)).toList
    assert(got == List(("u://x", "conversion", "abc")))
  }

  test("wet malformed streams fail with IllegalArgumentException") {
    def p(s: String): List[(String, String, String)] =
      WarcSource.parseRecords(new ByteArrayInputStream(s.getBytes("UTF-8"))).toList
    assertThrows[IllegalArgumentException](p("HTTP/1.1 200 OK\r\n\r\n"))
    assertThrows[IllegalArgumentException](p("WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody"))
    assertThrows[IllegalArgumentException](p("WARC/1.0\r\nContent-Length: ten\r\n\r\n"))
    assertThrows[IllegalArgumentException](p("WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"))
    assertThrows[IllegalArgumentException](p("WARC/1.0\r\nno colon here\r\n\r\n"))
    assertThrows[IllegalArgumentException](
      p(s"WARC/1.0\r\nContent-Length: ${100L * 1024 * 1024}\r\n\r\n"))
    // header block cut off mid-stream (no blank line ever arrives)
    assertThrows[IllegalArgumentException](p("WARC/1.0\r\nWARC-Type: conversion\r\n"))
  }

  test("readWet: provenance columns, type filter, cross-file union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_spec")
    java.nio.file.Files.write(dir.resolve("a.warc.wet.gz"),
      WarcSource.encodeWetGz(Seq(("u://a/0", "alpha"), ("u://a/1", "beta"))))
    java.nio.file.Files.write(dir.resolve("b.warc.wet.gz"),
      WarcSource.encodeWetGz(Seq(("u://b/0", "gamma"))))
    val df = WarcSource.readWet(spark, s"$dir/*.warc.wet.gz")
    assert(df.columns.toSeq == Seq("path", "rec_idx", "uri", "rec_type", "text"))
    assert(df.count() == 5) // 3 conversion + 2 warcinfo
    val conv = df.filter(col("rec_type") === "conversion")
      .select("uri", "rec_idx", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(conv.toSeq == Seq(
      ("u://a/0", 1L, "alpha"), ("u://a/1", 2L, "beta"), ("u://b/0", 1L, "gamma")))
    // warcinfo records carry no target uri
    assert(df.filter(col("rec_type") === "warcinfo")
      .select("uri").collect().forall(_.getString(0) == ""))
    dir.toFile.listFiles().foreach(_.delete())
    java.nio.file.Files.delete(dir)
  }
}
