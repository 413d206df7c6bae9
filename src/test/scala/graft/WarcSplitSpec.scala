package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.WarcSplit

/** WARC framing semantics: byte-correct Content-Length walks, embedded
  * magic immunity, malformed-blob null routing. */
class WarcSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(id: String, body: String): String =
    s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: $id\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body\r\n\r\n"

  private def parse(blob: String) =
    Seq(blob).toDF("b")
      .select(WarcSplit.column(col("b").cast("binary")).as("r"))
      .collect()(0)

  test("two records parse back byte-exact, embedded magic survives") {
    // record 2's body contains the full record-1 serialization — a
    // delimiter-split parser would see 3+ records; length framing sees 2
    val evil = "prefix " + rec("r1", "x") + " suffix"
    val out = parse(rec("r1", "hello world") + rec("r2", evil))
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.length == 2)
    assert(out(0).getString(0) == "r1" && out(0).getString(3) == "hello world")
    assert(out(1).getString(0) == "r2" && out(1).getString(3) == evil)
    assert(out(1).getLong(2) == evil.getBytes("UTF-8").length)
  }

  test("multi-byte bodies frame by BYTES, not chars") {
    val body = "café ☃" // é = 2 bytes, snowman = 3
    val out = parse(rec("u1", body)).getSeq[org.apache.spark.sql.Row](0)
    assert(out.length == 1 && out(0).getString(3) == body)
    assert(out(0).getLong(2) == body.getBytes("UTF-8").length)
    assert(out(0).getLong(2) != body.length) // the two would diverge
  }

  test("malformed blobs null out instead of throwing") {
    val r = rec("ok", "body")
    for (bad <- Seq(
      "GARBAGE" + r,                       // wrong magic
      r.dropRight(2),                      // truncated trailer
      r.replace("Content-Length: 4", "Content-Length: 99"), // over-read
      r.replace("Content-Length: 4", "Content-Length: x"),  // unparsable
      // hostile headers are the expected case in web-corpus bytes: a
      // negative or Long-overflow length must route to null, never
      // reach array arithmetic
      r.replace("Content-Length: 4", "Content-Length: -1000"),
      r.replace("Content-Length: 4", "Content-Length: -1"),
      r.replace("Content-Length: 4",
        "Content-Length: 9223372036854775800")))
      assert(parse(bad).isNullAt(0), s"expected null for: ${bad.take(30)}")
    // missing optional headers stay null, record still parses
    val minimal = "WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val out = parse(minimal).getSeq[org.apache.spark.sql.Row](0)
    assert(out.length == 1 && out(0).isNullAt(0) && out(0).isNullAt(1) &&
      out(0).getString(3) == "hi")
  }
}
