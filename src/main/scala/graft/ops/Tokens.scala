package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenization/shingling expressions for the dedup + text-analysis
  * operators. Everything is built from codegen'd built-ins (split /
  * transform / sequence HOFs — no UDFs), with a DuckDB-equivalent SQL
  * fragment next to each so oracle queries stay in lockstep.
  *
  * Hashing note: cross-engine-deterministic hashing uses md5 (identical in
  * Spark and DuckDB) rather than Spark's murmur3 `hash()`, which DuckDB
  * can't reproduce.
  */
object Tokens {

  /** Whitespace tokens. SQL: `string_split(text, ' ')`. */
  def toks(text: Column): Column = split(text, " ")

  /** Distinct whitespace tokens (set semantics for Jaccard/MinHash). */
  def distinctToks(text: Column): Column = array_distinct(toks(text))

  /** Word k-shingles: overlapping k-grams of tokens joined by a space;
    * docs shorter than k tokens collapse to one whole-text shingle.
    * SQL fragment: see `shinglesSql`.
    *
    * Built as arrays_zip of k shifted slices rather than
    * `transform(sequence, i => element_at(t, i+j))`: higher-order
    * functions evaluate interpreted (no codegen/CSE), so an element_at
    * over `t = split(text)` inside the lambda re-runs the split for every
    * element of every shingle. The zip form evaluates the split O(k)
    * times per row instead of O(k·len). */
  def shingles(text: Column, k: Int): Column = {
    val t = toks(text)
    val n = size(t) - (k - 1) // shingle count when the doc has >= k tokens
    when(n >= 1,
      transform(
        arrays_zip((1 to k).map(j => slice(t, lit(j), n)): _*),
        s => concat_ws(" ", (0 until k).map(j => s.getField(j.toString)): _*)))
      .otherwise(array(text))
  }

  /** DuckDB equivalent of `shingles` (1-based list indexing). */
  def shinglesSql(textExpr: String, k: Int): String = {
    val joined = (1 to k).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""(CASE WHEN len(string_split($textExpr,' ')) >= $k
       | THEN (SELECT list_transform(generate_series(0, len(t)-$k), i -> $joined)
       |       FROM (SELECT string_split($textExpr,' ') AS t))
       | ELSE [$textExpr] END)""".stripMargin.replace("\n", " ")
  }

  /** Distinct character n-gram set, in-row (shared by the char-Jaccard
    * dedup verify and the n-gram language-ID; `text` is a plain attribute
    * so per-element substr is cheap). Texts shorter than n yield their
    * single truncated prefix. */
  def charNgramSet(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n))))

  /** Character n-grams WITH repeats (multiset) — the language-model
    * counterpart of `charNgramSet` (counts need multiplicity). Texts
    * shorter than n yield their single truncated prefix. */
  def charNgrams(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** DuckDB equivalent of `charNgrams`. */
  def charNgramsSql(textExpr: String, n: Int): String =
    s"""list_transform(
       | generate_series(1, greatest(length($textExpr) - ${n - 1}, 1)),
       | i -> substr($textExpr, i, $n))""".stripMargin.replace("\n", " ")

  /** DuckDB equivalent of `charNgramSet`. */
  def charNgramSetSql(textExpr: String, n: Int): String =
    s"""list_distinct(list_transform(
       | generate_series(1, greatest(length($textExpr) - ${n - 1}, 1)),
       | i -> substr($textExpr, i, $n)))""".stripMargin.replace("\n", " ")

  /** First 8 hex chars of md5 of `salt|token` — the deterministic "random
    * permutation" used for MinHash. SQL: `substr(md5('SALT|' || w), 1, 8)`. */
  def saltedHash(w: Column, salt: Int): Column =
    substring(md5(concat(lit(s"$salt|"), w).cast("binary")), 1, 8)

  def saltedHashSql(wExpr: String, salt: Int): String =
    s"substr(md5('$salt|' || $wExpr), 1, 8)"

  /** Plain-Scala mirror of `shingles` for typed-Dataset kernels. MUST stay
    * semantically identical to the Column version (and to `shinglesSql`):
    * split on single space keeping empties, k-gram join by space, short
    * docs collapse to the whole text. */
  def shingleStrings(text: String, k: Int): Seq[String] = {
    val t = text.split(" ", -1)
    if (t.length >= k) (0 to t.length - k).map(i => t.slice(i, i + k).mkString(" "))
    else Seq(text)
  }
}
