package graft

import graft.ext.Dedup

/** Pins the granularity claim that motivates x57 (VERDICT r7 "What's
  * missing" #2): x54's aligned blocks miss an offset-shifted duplicate
  * paragraph BY CONSTRUCTION; the sliding-window operator catches it. */
class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  private val para = (1 to 20).map(i => s"x$i").mkString(" ")

  test("shifted duplicate paragraph: blockDedup misses it, substrDedup finds it") {
    // doc 2 repeats doc 1's 20-token paragraph at token offset 3 — no
    // aligned 10-token block of doc 2 equals any block of doc 1.
    val df = Seq(
      (1L, para),
      (2L, s"pad1 pad2 pad3 $para")).toDF("doc_id", "text")

    val blocks = Dedup.blockDedup(df, "doc_id", "text", 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dropped")).toMap
    assert(blocks == Map(1L -> 0L, 2L -> 0L),
      "aligned blocks must NOT fire on the shifted duplicate (the gap x57 closes)")

    val sub = Dedup.substrDedup(df, "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[String]("clean_sha")))).toMap
    // Canonical first occurrence (doc 1) keeps its text untouched; doc 2's
    // whole shifted paragraph is one covered span, and the kept text is
    // exactly the pad prefix.
    assert(sub(1L) == ((0L, 0L, sha256Hex(para))))
    assert(sub(2L) == ((20L, 1L, sha256Hex("pad1 pad2 pad3"))))
  }

  test("within-doc shifted repeat is excised; first copy survives") {
    val phrase = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, s"$phrase gap1 gap2 $phrase")).toDF("doc_id", "text")
    val r = Dedup.substrDedup(df, "doc_id", "text", 8).first()
    assert(r.getAs[Long]("n_tokens") == 18L)
    assert(r.getAs[Long]("n_dup_tokens") == 8L)
    assert(r.getAs[Long]("n_dup_spans") == 1L)
    assert(r.getAs[String]("clean_sha") == sha256Hex(s"$phrase gap1 gap2"))
  }

  test("adjacent dropped windows merge into one span (interval fold)") {
    // doc 9 contains doc 8's 24 tokens at offset 1: dropped windows at
    // offsets 1..17 overlap chain-wise into a single [1, 25) interval.
    val long = (1 to 24).map(i => s"y$i").mkString(" ")
    val df = Seq((8L, long), (9L, s"z0 $long")).toDF("doc_id", "text")
    val r = Dedup.substrDedup(df, "doc_id", "text", 8)
      .filter("doc_id = 9").first()
    assert(r.getAs[Long]("n_dup_tokens") == 24L)
    assert(r.getAs[Long]("n_dup_spans") == 1L)
    assert(r.getAs[String]("clean_sha") == sha256Hex("z0"))
  }

  test("docs shorter than the window pass through unscathed") {
    val df = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val rs = Dedup.substrDedup(df, "doc_id", "text", 8).collect()
    assert(rs.length == 2)
    assert(rs.forall(r => r.getAs[Long]("n_dup_tokens") == 0L &&
      r.getAs[Long]("n_dup_spans") == 0L &&
      r.getAs[String]("clean_sha") == sha256Hex("a b c")))
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
