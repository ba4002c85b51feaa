package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL sink/source: byte-deterministic export, lossless round-trip. */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "plain text", "en"),
    (2L, "quotes \" and \\ backslash", "en"),
    (3L, "embedded\nnewline and\ttab", "de"),
    (4L, "unicode: café 日本語 😀", "ja"),
    (5L, null.asInstanceOf[String], "en")
  ).toDF("id", "text", "lang")

  test("round-trip preserves every row, including escapes and unicode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Jsonl.save(corpus, dir)
    val back = Jsonl.load(spark, dir, Some(corpus.schema))
    val a = corpus.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), r.getString(2))).sortBy(_._1)
    val b = back.select("id", "text", "lang").collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b), s"a=${a.toSeq} b=${b.toSeq}")
  }

  test("export bytes are deterministic: name-sorted keys, one line per row") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_jsonl1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_jsonl2").toString
    // different column ORDER, same content — serialized bytes must agree
    Jsonl.save(corpus.select("lang", "id", "text").coalesce(1), dir1)
    Jsonl.save(corpus.select("id", "text", "lang").coalesce(1), dir2)
    val l1 = spark.read.text(dir1).collect().map(_.getString(0)).sorted
    val l2 = spark.read.text(dir2).collect().map(_.getString(0)).sorted
    assert(l1.sameElements(l2))
    assert(l1.forall(l => l.startsWith("{\"id\":")), // sorted keys: id first
      s"keys not name-sorted: ${l1.head}")
    assert(l1.length == 5)
    // null text omitted from its line, not serialized as "null"
    val row5 = l1.find(_.startsWith("{\"id\":5")).get
    assert(!row5.contains("text"), s"null field must be omitted: $row5")
  }
}
