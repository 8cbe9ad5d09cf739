package graft.ops

import graft.SparkSpec

/** Pins text_bpe_train's kernel and training invariants. */
class BpeTrainSpec extends SparkSpec {

  test("applyMerge re-scans from the start (runs merge fully)") {
    // continue-after-replacement semantics would miss the second pair
    // (its leading boundary was consumed by the first match)
    assert(BpeOps.applyMerge("l r l r", "l", "r") == "lr lr")
    // overlapping run: leftmost wins, the consumed middle can't re-pair
    assert(BpeOps.applyMerge("a a a", "a", "a") == "aa a")
    // no occurrence: unchanged
    assert(BpeOps.applyMerge("x y", "a", "b") == "x y")
    // merged symbol does not re-match the pair pattern
    assert(BpeOps.applyMerge("ab a b", "a", "b") == "ab ab")
  }

  test("learned merges: dense steps, positive counts, non-increasing max") {
    val rows = graft.SparkEntry
      .queries("text_bpe_train")(spark, "/root/testdata/sf0.001")
      .orderBy("step").collect()
    assert(rows.map(_.getAs[Long]("step")).sameElements(1L to rows.length),
      "steps must be dense 1..N")
    val counts = rows.map(_.getAs[Long]("pair_count"))
    assert(counts.forall(_ > 0), "every learned merge must have support")
    // a merge only removes occurrences of existing pairs and creates
    // pairs bounded by its own count, so the argmax can never grow
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"max pair count grew across steps: ${counts.toList}")
    val pairs = rows.map(r => (r.getAs[String]("l"), r.getAs[String]("r")))
    assert(pairs.distinct.length == pairs.length,
      "the same pair cannot be learned twice (its occurrences were merged)")
  }

  test("roundtrip: the learned table actually tokenizes the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rt = graft.SparkEntry.queries("text_bpe_roundtrip")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("bpe_tokens"), r.getAs[Long]("n_words"))).toMap
    assert(rt.nonEmpty, "roundtrip produced no per-source rows")
    // learned merges must COMPRESS: strictly fewer tokens than characters
    // (chars = the no-merge upper bound), but at least one token per word
    val chars = spark.sql(
      s"""SELECT source,
         |  CAST(aggregate(collect_list(c), 0L, (a, x) -> a + x) AS BIGINT) AS n_chars
         |FROM (
         |  SELECT source,
         |    aggregate(transform(
         |      regexp_extract_all(lower(text), '[a-z]+', 0), w -> length(w)),
         |      0L, (a, x) -> a + x) AS c
         |  FROM parquet.`$dir/documents.parquet`)
         |GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rt.foreach { case (src, (tok, nWords)) =>
      assert(tok < chars(src),
        s"$src: learned merges did not compress ($tok tokens vs ${chars(src)} chars)")
      assert(tok >= nWords, s"$src: fewer tokens than words")
    }
    // and the learned MERGE LIST differs from the in-code fixture table
    // (train → apply is a real lifecycle, not the fixture relabeled) — a
    // structural property, unlike comparing two unrelated token totals
    // that could coincide for some corpus/step count
    val learned = graft.SparkEntry.queries("text_bpe_train")(spark, dir)
      .orderBy("step").collect()
      .map(r => (r.getAs[String]("l"), r.getAs[String]("r"))).toSeq
    assert(learned != BpeOps.merges,
      "learned merge list identical to the fixture table — suspicious")
  }
}
