package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value pins for the r15 corpus-analysis additions: PMI collocations
  * and the Heaps'-law vocabulary-growth fit. */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pmiCollocations: a true collocation outranks a frequent-but-" +
      "independent pair; the value matches the hand formula") {
    // "a b" x5 and "c d" x5: both bigrams have cf 5 of 10, every unigram
    // cf 5 of 20 -> pmi = ln((5/10) / ((5/20)*(5/20))) = ln 8
    val docs = (Seq.fill(5)("a b") ++ Seq.fill(5)("c d")).toDF("text")
    val got = CorpusOps.pmiCollocations(docs, col("text"),
        minCf = 1L, topK = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pmi")).toMap
    assert(got.keySet == Set("a b", "c d"))
    assert(math.abs(got("a b") - math.log(8.0)) < 2e-6, got("a b"))

    // mixed corpus ABOVE the min-cf floor: (p,q) always together vs x
    // promiscuously pairing — the collocation must outrank the x-pairs.
    // (With minCf = 1 the cf-1 pairs would outrank it — exactly the
    // low-count PMI instability the floor exists to cut off.)
    val mixed = (Seq.fill(4)("p q") ++ Seq("x p", "x p", "x q", "x q"))
      .toDF("text")
    val top = CorpusOps.pmiCollocations(mixed, col("text"),
      minCf = 2L, topK = 3).collect()
    assert(top.length == 3)
    assert(top.head.getString(0) == "p q",
      s"PMI must rank the true collocation first: ${top.toSeq}")
  }

  test("pmiCollocations: min-cf floor prunes the unstable tail") {
    val docs = (Seq.fill(5)("a b") ++ Seq("y z")).toDF("text")
    val got = CorpusOps.pmiCollocations(docs, col("text"),
      minCf = 5L, topK = 10).collect().map(_.getString(0))
    assert(got.toSeq == Seq("a b")) // "y z" (cf 1) is gone
  }

  test("heapsLaw: an all-unique-vocabulary corpus fits beta = 1 exactly " +
      "(V(n) = n is the ln-ln identity line)") {
    // 64 docs, 2 fresh tokens each: cum_vocab == cum_tokens at every
    // bucket -> slope 1, intercept 0, corr 1
    val docs = (0 until 64).map(i => (i.toLong, s"t${i}a t${i}b"))
      .toDF("doc_id", "text")
    val got = CorpusOps.heapsLaw(docs, col("doc_id"), col("text")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_points") == 64L)
    assert(r.getAs[Double]("beta") == 1.0)
    assert(r.getAs[Double]("ln_k") == 0.0)
    assert(r.getAs[Double]("corr") == 1.0)
  }

  test("heapsLaw: a saturated (template-flood) corpus fits beta near 0") {
    // every doc repeats the same 3 tokens: vocabulary stops growing
    // after the first bucket while tokens keep accumulating
    val docs = (0 until 64).map(i => (i.toLong, "the same words"))
      .toDF("doc_id", "text")
    val r = CorpusOps.heapsLaw(docs, col("doc_id"), col("text"))
      .collect().head
    assert(r.getAs[Double]("beta") == 0.0,
      s"saturated vocab must fit slope 0, got ${r.getAs[Double]("beta")}")
    // the guard's contract: a degenerate fit is NULL or finite, never
    // NaN/Inf (vary here is 64²·(round6(y²)−y²) — a rounding residual
    // that can land on either side of 0; unguarded, a negative residual
    // made corr = x/sqrt(<0) = NaN in DuckDB while Spark NULLed)
    val fi = r.schema.fieldIndex("corr")
    assert(r.isNullAt(fi) ||
      java.lang.Double.isFinite(r.getDouble(fi)), r.toString)
  }

  test("heapsLaw: a single log-log point (all doc ids equal -> one " +
      "bucket) emits NULL beta/ln_k/corr, not NaN or a crash") {
    // lo == hi -> every doc lands in bucket 0 -> one (x, y) point ->
    // varx = 0: no line is defined. Spark's unguarded Divide would NULL
    // here while DuckDB yields NaN/Inf — the guard pins both to NULL.
    val docs = (0 until 10).map(i => (7L, s"w$i x$i")).toDF("doc_id", "text")
    val r = CorpusOps.heapsLaw(docs, col("doc_id"), col("text"))
      .collect().head
    assert(r.getAs[Long]("n_points") == 1L)
    Seq("beta", "ln_k", "corr").foreach { c =>
      assert(r.isNullAt(r.schema.fieldIndex(c)), s"$c must be NULL: $r")
    }
  }
}
