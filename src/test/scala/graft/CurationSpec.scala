package graft

import graft.functions.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the corpus-curation ops: decontamination overlap
  * counts, PII redaction patterns, split determinism, and the two-phase
  * prefix-sum packing against a hand-computed layout. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("dsirWeights ranks target-like docs above mixed above off-target") {
    val d = Seq(
      (1L, "good fine good"), (2L, "good fine nice"), // target
      (3L, "bad ugly bad"),                           // raw only
      (4L, "good bad"),                               // mixed
      (5L, "")                                        // empty
    ).toDF("id", "text")
    val w = Curation.dsirWeights(d, isTarget = col("id") <= 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(w.size === 5)
    assert(w(1L)._1 > w(4L)._1 && w(4L)._1 > w(3L)._1,
      s"expected target > mixed > off-target: $w")
    assert(w(1L)._1 > 0 && w(3L)._1 < 0, s"signs: $w")
    assert(w(5L) === ((0.0, 0L)), s"empty doc: ${w(5L)}")
    assert(w(4L)._2 === 2L, s"ntok counts occurrences: ${w(4L)}")
  }

  test("gopherRules computes word-level signals and the keep verdict") {
    val d = Seq(
      (1L, ("word " * 60).trim),                         // no stopwords
      (2L, ("the a " * 30).trim + " " + ("customer " * 30).trim),
      (3L, "the a short doc"),                           // word-count fail
      (4L, ("#### " * 60).trim)                          // symbols, no alpha
    ).toDF("id", "text")
    val m = Curation.gopherRules(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_words") == 60L)
    assert(m(1L).getAs[Double]("mean_word_len") == 4.0)
    assert(m(1L).getAs[Long]("stopword_count") == 0L)
    assert(!m(1L).getAs[Boolean]("keep"), "no stopwords must fail")
    // doc 2: 90 words, mean (30*3 + 30*1 + 30*8)/90 = 4.0, 60 stopwords
    assert(m(2L).getAs[Long]("n_words") == 90L)
    assert(m(2L).getAs[Double]("mean_word_len") == 4.0)
    assert(m(2L).getAs[Long]("stopword_count") == 60L)
    assert(m(2L).getAs[Boolean]("keep"))
    assert(!m(3L).getAs[Boolean]("keep"), "4 words < minWords")
    assert(m(4L).getAs[Double]("symbol_ratio") == 4.0)
    assert(m(4L).getAs[Double]("alpha_word_ratio") == 0.0)
    assert(!m(4L).getAs[Boolean]("keep"))
  }

  test("decontaminate counts distinct overlapping n-grams per corpus doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words here nothing shared at all"),
      (3L, "quick brown fox somewhere else quick brown fox again"))
      .toDF("id", "text")
    val bench = Seq((100L, "a quick brown fox appeared")).toDF("id", "text")
    val got = Curation.decontaminate(corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench 3-grams: {a quick brown, quick brown fox, brown fox appeared}
    // doc 1 shares "quick brown fox"; doc 3 shares it too (twice in text,
    // counted once); doc 2 is clean and absent from the result
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }

  test("redactPii replaces emails, IPs, and phone runs with placeholders") {
    val out = Seq(
      "mail alice.smith+x@sub.example.org now",
      "server at 192.168.1.200 port",
      "call +44 20 7946 0958 today",
      "no pii in this sentence").toDF("t")
      .select(Curation.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "mail [EMAIL] now",
      "server at [IP] port",
      "call [PHONE] today",
      "no pii in this sentence"))
  }

  test("splitLabel is deterministic, content-independent, and covers all splits") {
    val ids = (0L until 1000L).toDF("id")
    val counts = ids.select(Curation.splitLabel(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 12/16 - 2/16 - 2/16 within loose tolerance at n=1000
    assert(counts("train") > 600 && counts("val") > 60 && counts("test") > 60)
    // stable under corpus growth: the same id maps identically in a subset
    val sub = (0L until 100L).toDF("id")
      .select(col("id"), Curation.splitLabel(col("id")).as("s"))
    val full = ids.select(col("id"), Curation.splitLabel(col("id")).as("s"))
    assert(sub.except(full).count() == 0)
  }

  test("stratifiedSample hits per-stratum rates deterministically") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "xx"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 1.0), defaultRate = 0.25)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 1000) // rate 1.0 keeps every row
    assert(counts("xx") > 350 && counts("xx") < 650, s"xx=${counts("xx")}")
    // deterministic: the same call yields the same row set
    assert(Curation.stratifiedSample(df, "id", "lang",
      Map("en" -> 1.0), 0.25).except(kept).count() == 0)
    // stable under growth: decisions on a subset match the full corpus
    val sub = Curation.stratifiedSample(df.filter(col("id") < 100), "id",
      "lang", Map("en" -> 1.0), 0.25)
    assert(sub.except(kept.filter(col("id") < 100)).count() == 0)
  }

  test("assignPacks computes the global prefix sum and straddle counts") {
    // budget 10: offsets 0,4,12,12,19 — doc 30 straddles packs 0-1,
    // doc 40 is empty (packs=1), doc 50 straddles 1-2
    val df = Seq((10L, 4L), (20L, 8L), (30L, 0L), (40L, 7L), (50L, 6L))
      .toDF("id", "ntok")
    val got = Curation.assignPacks(df, "id", "ntok", budget = 10)
      .orderBy("id")
      .select("id", "offset", "pack", "packs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (10L, 0L, 0L, 1), (20L, 4L, 0L, 2), (30L, 12L, 1L, 1),
      (40L, 12L, 1L, 1), (50L, 19L, 1L, 2)))
  }

  test("assignPacks matches a single-partition cumsum at any partitioning") {
    val n = 500
    val df = (0 until n).map(i => ((i * 7 + 3).toLong, (i % 37).toLong))
      .toDF("id", "ntok")
    val expected = df.orderBy("id").collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), r) =>
        (r.getLong(0), acc, acc + r.getLong(1)) }.drop(1)
      .map { case (id, off, _) => (id, off) }.toMap
    val got = Curation.assignPacks(df.repartition(13), "id", "ntok", 512)
      .select("id", "offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("bigramLmScore ranks repetitive text as more probable than unique text") {
    val docs = Seq(
      (1L, "ab cd ab cd ab cd ab cd ab cd ab cd"),   // one dominant bigram
      (2L, "qq ww ee rr tt yy uu ii oo pp zz xx"),   // all bigrams unique
      (3L, "ab cd ab cd ef gh"),                      // mixed
      (4L, "solo")).toDF("id", "text")                // no bigram: absent
    val got = Curation.bigramLmScore(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) < got(3L) && got(3L) < got(2L),
      s"expected nll(repetitive) < nll(mixed) < nll(unique): $got")
  }

  test("mixWeights: explicit targets get target/share, residual splits uniformly") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("en", 60L), ("en", 20L),   // 80 tokens, share 0.5
      ("fr", 40L),                 // share 0.25
      ("de", 20L), ("es", 20L))    // unlisted: 0.125 each
      .toDF("lang", "ntok")
    val got = graft.functions.Curation.mixWeights(
        docs, "lang", Map("en" -> 0.6, "fr" -> 0.2), col("ntok"))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got("en") == (0.5, 1.2))      // 0.6 / 0.5
    assert(got("fr") == (0.25, 0.8))     // 0.2 / 0.25
    // residual 0.2 over unlisted share 0.25 -> uniform scale 0.8
    assert(got("de") == (0.125, 0.8) && got("es") == (0.125, 0.8))
  }

  test("shuffleShards: round-robin balance, dense per-shard positions, fresh epoch per salt") {
    import spark.implicits._
    val ids = (1L to 103L).toDF("id")
    val r = graft.functions.Curation.shuffleShards(ids, "id", 8, "epoch0")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // round-robin: shard sizes differ by at most one
    val sizes = r.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1 && r.length == 103)
    // positions are dense 0..size-1 within each shard
    r.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // a different salt is a different permutation (some doc moves shards)
    val r2 = graft.functions.Curation.shuffleShards(ids, "id", 8, "epoch1")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val m = r.map(x => x._1 -> x._2).toMap
    assert((1L to 103L).exists(i => m(i) != r2(i)))
    // and the same salt replays identically
    val r3 = graft.functions.Curation.shuffleShards(
      ids.repartition(7), "id", 8, "epoch0")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.forall { case (i, s, p) => r3(i) == ((s, p)) })
  }

  test("negativeSamples: k per query, positive excluded, repartition-stable") {
    import spark.implicits._
    val pairs = (1L to 40L).map(q => (q, q % 10 + 100L)).toDF("q", "p")
    val pool = (100L to 149L).toDF("cid")
    val r = graft.functions.Curation.negativeSamples(
        pairs, "q", "p", pool, "cid", k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
    val byQ = r.groupBy(_._1)
    assert(byQ.keySet == (1L to 40L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q got ${rows.length} negatives")
      assert(rows.map(_._4).sorted.sameElements(Array(1, 2, 3)))
      assert(rows.forall(x => x._3 != x._2), s"query $q sampled its positive")
      assert(rows.map(_._3).distinct.length == 3, s"query $q repeated a negative")
    }
    // repartitioning the pool must not move a single sample
    val r2 = graft.functions.Curation.negativeSamples(
        pairs.repartition(5), "q", "p", pool.repartition(7), "cid", k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
    assert(r.sorted.sameElements(r2.sorted))
  }

  test("chunkDocuments windows with overlap; short and empty docs chunk once") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),                 // short: one chunk
      (3L, "")                     // empty: one empty chunk
    ).toDF("id", "text")
    val r = graft.functions.Curation.chunkDocuments(d, chunkSize = 4, overlap = 1)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getInt(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: stride 3 → ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6 —
    // every token covered, no degenerate tail window
    assert(r.filter(_._1 == 1L).map(x => (x._3, x._4)).toSeq == Seq(
      ("a b c d", 4), ("d e f g", 4), ("g h i j", 4)))
    assert(r.filter(_._1 == 2L).toSeq == Seq((2L, 0, "x y", 2)))
    assert(r.filter(_._1 == 3L).toSeq == Seq((3L, 0, "", 0)))
    // null text behaves like empty text — the row must NOT vanish
    import org.apache.spark.sql.functions.{col, lit, when}
    val withNull = d.withColumn("text",
      when(col("id") === 3L, lit(null)).otherwise(col("text")))
    val rn = graft.functions.Curation.chunkDocuments(withNull, 4, 1)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getInt(3)))
    assert(rn.filter(_._1 == 3L).toSeq == Seq((3L, 0, "", 0)))
    // consecutive chunks share exactly `overlap` tokens
    val c1 = r.filter(_._1 == 1L).map(_._3.split(" ").toSeq).toSeq
    c1.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(1) == b.take(1), s"$a | $b")
      case _ => ()
    }
  }

  test("negativeSamples fills every slot even on tiny pools (k+1 of n)") {
    import spark.implicits._
    // n = k+1: the tightest legal pool. Consecutive probe indices are
    // distinct mod n, so even when one probe hits the positive, all k
    // slots fill — the stride-collision shortfall ADVICE flagged cannot
    // occur by construction.
    val pairs = (1L to 25L).map(q => (q, 100L + q % 4)).toDF("q", "p")
    val pool = (100L to 103L).toDF("cid")
    val r = graft.functions.Curation.negativeSamples(
        pairs, "q", "p", pool, "cid", k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(3)))
    r.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.sameElements(Array(1, 2, 3)),
        s"query $q under-filled: ${rows.map(_._2).mkString(",")}")
    }
  }
}
