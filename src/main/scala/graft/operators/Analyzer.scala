package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Configurable ANALYZER CHAIN — the tokenize/normalize pipeline the
  * Elasticsearch the reference writes to applies on every indexed
  * field (`elastic_controller.go:276` creates indexes with dynamic
  * mappings, whose text fields get the `standard` analyzer: Unicode
  * word segmentation + lowercase; the `english` analyzer adds
  * stopword removal and stemming). Until now this engine tokenized
  * whitespace-exact everywhere — `"Data"` and `data` were two terms
  * here and one term there. This closes that fidelity gap while
  * keeping the default BIT-COMPATIBLE with the whitespace behavior
  * every existing oracle pins.
  *
  * One chain, three mirrors that MUST agree (AnalyzerSpec pins the
  * first two against each other over the fixture corpus; the DuckDB
  * oracles of q202+ pin the third):
  *
  *  - the COLUMN mirror ([[posTerms]]/[[dl]]): pure Spark SQL
  *    higher-order functions (split / transform / filter — all
  *    codegen'd, no UDF), applied at ingest inside
  *    [[SegmentedIndex.append]]'s postings derivation;
  *  - the DRIVER mirror ([[analyzeText]]/[[queryTerms]]/
  *    [[normalize]]): plain Scala over query literals, applied to
  *    search terms so the query side sees the same vocabulary the
  *    index stores (ES analyzes the query with the field's analyzer);
  *  - the ORACLE mirror: the same pipeline expressed in DuckDB SQL
  *    (`string_split_regex(lower(text), ...)` + the [[StemSql]] CASE)
  *    — which is exactly why the stemmer is a SINGLE-PASS rule list
  *    and not Porter's full algorithm: every rule is one
  *    LIKE/substr/concat expression available identically in both
  *    engines.
  *
  * Position semantics are Lucene's: tokens take their pre-filter
  * array index, so a removed stopword leaves a POSITION GAP — a
  * phrase query does not match across it without slop, exactly ES's
  * `match_phrase` behavior under the english analyzer. A document
  * whose analyzed form is EMPTY (all stopwords) contributes no
  * postings: it still counts in the manifest's pre-merge stats and
  * stays fetchable, but a merge's recomputed stats drop it — the one
  * documented divergence from Lucene's maxDoc accounting.
  *
  * The chain is an INDEX-CREATION-TIME property carried in the
  * manifest header (`an=<name>`), never per-query: all segments of an
  * index are analyzed identically, and [[SegmentedIndex.reindex]] is
  * the migration path (it re-analyzes the live `_source` with the
  * DESTINATION's chain — ES's own reindex-to-change-analyzer
  * recipe). */
object Analyzer {

  /** Lucene's EnglishAnalyzer default stopword set (33 words) —
    * public constants from `ENGLISH_STOP_WORDS_SET`. */
  val EnglishStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  /** One analyzer chain. `splitRx` is a regex BOTH Spark's `split`
    * and DuckDB's `string_split_regex` interpret identically (kept to
    * character-class basics for that reason). */
  final case class Chain(name: String, lowercase: Boolean,
                         splitRx: String, stopwords: Seq[String],
                         stem: Boolean) {
    val stopwordSet: Set[String] = stopwords.toSet
  }

  /** The default: split on single spaces, no normalization — the
    * exact pipeline every pre-analyzer oracle pins, bit-compatible
    * with `split(text, ' ')`. */
  val Whitespace: Chain = Chain("whitespace", lowercase = false,
    splitRx = " ", stopwords = Nil, stem = false)

  /** ES's `standard` analyzer, structurally: alnum word segmentation
    * + lowercase (no stopwords, no stemming — ES's own default for
    * dynamic text mappings). */
  val Standard: Chain = Chain("standard", lowercase = true,
    splitRx = "[^a-z0-9]+", stopwords = Nil, stem = false)

  /** ES's `english` analyzer, structurally: standard + Lucene's
    * english stopword set + a light single-pass suffix stemmer. */
  val English: Chain = Chain("english", lowercase = true,
    splitRx = "[^a-z0-9]+", stopwords = EnglishStopwords, stem = true)

  private val registry: Map[String, Chain] =
    Seq(Whitespace, Standard, English).map(c => c.name -> c).toMap

  /** Resolve a chain by its manifest name — fails loudly on an
    * unknown name (a manifest written by a newer engine version). */
  def byName(name: String): Chain = registry.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown analyzer '$name' (known: ${registry.keys.mkString(", ")})"))

  /** The light stemmer as ONE SQL CASE over the placeholder
    * expression `t` — the SAME string is valid Spark SQL (inside a
    * lambda) and DuckDB SQL (inside a list lambda or projection),
    * which is what keeps the oracle surface exact. Single-pass,
    * first-match-wins:
    *   ies→y (len>4) | -ing (len>5) | -ed (len>4) |
    *   -s unless ss/us/is (len>3). */
  def stemSql(t: String): String =
    s"CASE WHEN length($t) > 4 AND $t LIKE '%ies' " +
      s"THEN concat(substr($t, 1, length($t) - 3), 'y') " +
      s"WHEN length($t) > 5 AND $t LIKE '%ing' " +
      s"THEN substr($t, 1, length($t) - 3) " +
      s"WHEN length($t) > 4 AND $t LIKE '%ed' " +
      s"THEN substr($t, 1, length($t) - 2) " +
      s"WHEN length($t) > 3 AND $t LIKE '%s' " +
      s"AND $t NOT LIKE '%ss' AND $t NOT LIKE '%us' " +
      s"AND $t NOT LIKE '%is' " +
      s"THEN substr($t, 1, length($t) - 1) " +
      s"ELSE $t END"

  /** The driver mirror of [[stemSql]] — rule for rule. */
  def stemScala(t: String): String =
    if (t.length > 4 && t.endsWith("ies")) t.dropRight(3) + "y"
    else if (t.length > 5 && t.endsWith("ing")) t.dropRight(3)
    else if (t.length > 4 && t.endsWith("ed")) t.dropRight(2)
    else if (t.length > 3 && t.endsWith("s") && !t.endsWith("ss") &&
      !t.endsWith("us") && !t.endsWith("is")) t.dropRight(1)
    else t

  /** COLUMN mirror: the analyzed (pos, term) structs of `textCol`,
    * positions = pre-filter token indices (gaps where stopwords
    * dropped). Pure codegen'd SQL functions. */
  def posTerms(c: Chain, textCol: String): Column = {
    if (c == Whitespace)
      // bit-compatible with posexplode(split(text, ' ')): no filter,
      // empty tokens included, positions dense
      return expr(s"transform(split($textCol, ' '), " +
        "(t, i) -> named_struct('pos', bigint(i), 'term', t))")
    val raw =
      if (c.lowercase) s"split(lower($textCol), '${c.splitRx}')"
      else s"split($textCol, '${c.splitRx}')"
    val term = if (c.stem) stemSql("t") else "t"
    val stop =
      if (c.stopwords.isEmpty) ""
      else " AND NOT x.term IN (" +
        c.stopwords.map(s => s"'$s'").mkString(", ") + ")"
    expr(s"filter(transform($raw, " +
      s"(t, i) -> named_struct('pos', bigint(i), 'term', $term)), " +
      s"x -> x.term <> ''$stop)")
  }

  /** COLUMN mirror: the analyzed document length — the number of
    * emitted terms (Lucene's field length for BM25's normalization;
    * for the whitespace chain this is exactly
    * `size(split(text, ' '))`, the pre-analyzer definition). */
  def dl(c: Chain, textCol: String): Column =
    size(posTerms(c, textCol)).cast("long")

  /** DRIVER mirror of [[posTerms]]: analyze one string to its
    * (position, term) pairs — used for query phrases, where the
    * positions carry the stopword gaps a phrase match must respect. */
  def analyzeText(c: Chain, s: String): Seq[(Long, String)] = {
    if (c == Whitespace)
      return s.split(" ", -1).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
    val lowered = if (c.lowercase) s.toLowerCase else s
    lowered.split(c.splitRx, -1).toSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, if (c.stem) stemScala(t) else t) }
      .filter { case (_, t) => t.nonEmpty && !c.stopwordSet(t) }
  }

  /** DRIVER mirror for TERM-LIST queries: analyze each query literal,
    * drop stopwords/empties, dedup preserving first occurrence — what
    * ES's match query does to its input before hitting the index. */
  def queryTerms(c: Chain, terms: Seq[String]): Seq[String] =
    terms.flatMap(t => analyzeText(c, t).map(_._2)).distinct

  /** DRIVER mirror for MULTI-TERM queries (prefix/wildcard/fuzzy):
    * Lucene NORMALIZES these (lowercase) but never stems or
    * stop-filters them — a `prefix: "Runn"` must match the indexed
    * `running`, which stemming the PATTERN would break. */
  def normalize(c: Chain, s: String): String =
    if (c.lowercase) s.toLowerCase else s

  /** The PER-TOKEN analyzed form as a SQL fragment over the
    * expression `t` (lowercase + stem, NO stopword filter) — what a
    * position-aligned highlighter applies to each display token to
    * decide whether it matches an analyzed query term. */
  def termSql(c: Chain, t: String): String = {
    val lowered = if (c.lowercase) s"lower($t)" else t
    if (c.stem) stemSql(lowered) else lowered
  }

  /** The `_analyze` API surface — ES's `POST /_analyze` as a frame
    * transform: every document's analyzed (position, term) stream,
    * exactly what the index stores for it (gaps included). The
    * debugging/inspection endpoint of every analyzer deployment.
    * Output: (doc_id, pos, term), (doc_id, pos)-ascending. */
  def analyzeFrame(docs: DataFrame, c: Chain): DataFrame =
    docs.select(col("doc_id"), explode(posTerms(c, "text")).as("pt"))
      .select(col("doc_id"), col("pt.pos").as("pos"),
        col("pt.term").as("term"))
      .orderBy("doc_id", "pos")

  /** CASE-PRESERVING display split regex, position-aligned with the
    * chain's own split: lowercasing maps [A-Z] into [a-z] and leaves
    * every other character fixed (ASCII scope), so
    * `split(text, rawSplitRx)` and `split(lower(text), splitRx)`
    * produce equal-length arrays with `lower(raw[i]) == lowered[i]`
    * — the alignment a highlighter needs to mark ORIGINAL tokens at
    * analyzed match positions. */
  def rawSplitRx(c: Chain): String =
    if (c == Whitespace) " " else c.splitRx.replace("a-z", "a-zA-Z")
}
