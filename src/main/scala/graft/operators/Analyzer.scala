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
    * character-class basics for that reason).
    *
    * `synonyms` is an INDEX-TIME expansion map over ANALYZED terms —
    * ES's `synonym` token filter in its index-analyzer position: each
    * ingested token equal to a key also emits every mapped value at
    * the SAME position (Lucene's synonym-graph stacking), so a query
    * for the value hits a key-only document while scoring stays plain
    * tf·df arithmetic. The filter is SINGLE-PASS (an emitted synonym
    * is not itself re-expanded — Lucene parity) and QUERY-SIDE
    * ANALYSIS NEVER EXPANDS IT ([[analyzeText]]/[[queryTerms]] are
    * the search-analyzer mirror; ES's recommended index-time-synonym
    * setup drops the filter from the search analyzer).
    *
    * `querySynonyms` is the OTHER placement — ES's synonym filter in
    * the SEARCH analyzer: the index stores exactly what the document
    * says, and [[queryTerms]] expands each analyzed query term by the
    * map (single-pass), so the query reaches the index as several
    * terms EACH SCORED WITH ITS OWN df. That df semantics is the
    * real difference from index-time stacking (where the stacked
    * tokens inflate the value term's df); it is also why ES
    * recommends query-time synonyms for hot-swappable vocabularies —
    * here too, only the query path reads the map, so reindexing is
    * never needed to change it. Scope: TERM queries ([[queryTerms]]
    * callers); phrase analysis ([[analyzeText]]) deliberately does
    * not expand — a multi-position synonym graph inside a phrase is
    * out of scope and stated so.
    *
    * Entries of both maps are canonical analyzed forms — [[custom]]
    * is the only constructor that admits them and
    * canonicalizes/validates there. */
  final case class Chain(name: String, lowercase: Boolean,
                         splitRx: String, stopwords: Seq[String],
                         stem: Boolean,
                         synonyms: Seq[(String, String)] = Nil,
                         querySynonyms: Seq[(String, String)] = Nil) {
    val stopwordSet: Set[String] = stopwords.toSet
    /** key → mapped values, first-occurrence order. */
    val synonymMap: Map[String, Seq[String]] =
      synonyms.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    /** query-time key → mapped values, first-occurrence order. */
    val querySynonymMap: Map[String, Seq[String]] =
      querySynonyms.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2) }
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

  /** Resolve a chain by its manifest name: a built-in registry name,
    * or a CUSTOM analysis-settings spec (`custom(base=...;stop=...;
    * syn=...)` — the serialized form [[custom]] mints; parsing it
    * back through [[custom]] re-validates every token). Fails loudly
    * on anything else (a manifest written by a newer engine version).
    */
  def byName(name: String): Chain =
    registry.getOrElse(name,
      if (name.startsWith("custom(") && name.endsWith(")"))
        parseCustom(name)
      else throw new IllegalArgumentException(
        s"unknown analyzer '$name' (known: " +
          s"${registry.keys.toSeq.sorted.mkString(", ")}, " +
          "custom(base=...;stop=...;syn=...))"))

  /** A CUSTOM chain — ES's per-index analysis settings
    * (`PUT /idx { settings.analysis }`), scoped to the most-used
    * knobs: an EXTRA stopword list, an index-time synonym map and a
    * QUERY-TIME synonym map (the search-analyzer placement — see
    * [[Chain]] for the df-semantics difference), all layered on a
    * built-in base chain. Tokens canonicalize
    * through the base's own single-token analysis (lowercase + stem
    * where the base does) so they compare against exactly what the
    * index emits — `stop=runs` under an english base filters the
    * emitted stem `run`; a synonym key that would itself analyze
    * away is rejected rather than silently dead.
    *
    * MULTI-WORD (graph) synonyms are REFUSED LOUDLY, by contract:
    * every synonym key and value must be ONE alphanumeric token
    * (`[A-Za-z0-9]+` — the require below), so "nyc → new york" is an
    * [[IllegalArgumentException]] at chain construction, never a
    * silently single-position-stacked phrase. Lucene's synonym-graph
    * position-length machinery (a value spanning several positions)
    * is deliberately out of scope: this engine's phrase/span/interval
    * operators assume one term per position (the posTerms contract),
    * and a flattened multi-word synonym would corrupt exactly those
    * queries — ES documents the same hazard for its non-graph synonym
    * filter. The chain's NAME is
    * its canonical serialized spec, which is what the manifest `an=`
    * header carries — the settings travel with the index and
    * [[byName]] round-trips them (federation headers compare exactly,
    * query-time map included). */
  def custom(base: String, extraStopwords: Seq[String] = Nil,
             synonyms: Seq[(String, String)] = Nil,
             querySynonyms: Seq[(String, String)] = Nil): Chain = {
    val b = registry.getOrElse(base, throw new IllegalArgumentException(
      s"custom analyzer base must be a built-in chain, got '$base'"))
    // the whitespace base is REJECTED: its contract is bit-compat
    // with split(text, ' ') — empty tokens kept, positions dense —
    // which the pure chain honors through a reference-equality
    // special case; a custom chain layered on it would silently take
    // the general path (empty tokens dropped) and shift semantics
    // just because a stopword was added. Settings layer on the
    // analyzing bases.
    require(b != Whitespace,
      "custom() cannot layer settings on the whitespace base (its " +
        "bit-compat contract keeps empty tokens a filter chain " +
        "drops); use base=standard or base=english")
    def canon(raw: String, role: String): String = {
      require(raw.matches("[A-Za-z0-9]+"),
        s"analysis-settings $role must be alphanumeric " +
          s"([A-Za-z0-9]+): '$raw' — separators, quotes and " +
          "spec-delimiters cannot be analyzed terms")
      val t = normalize(b, raw)
      if (b.stem) stemScala(t) else t
    }
    val stop = extraStopwords.map(canon(_, "stopword"))
      .distinct.sorted
    val allStop = b.stopwordSet ++ stop
    val syn = synonyms
      .map { case (k, v) => (canon(k, "synonym key"),
        canon(v, "synonym value")) }
      .distinct.sorted
    syn.foreach { case (k, v) =>
      require(!allStop(k) && !allStop(v),
        s"synonym '$k>$v' collides with a stopword — the key would " +
          "never be emitted (or the value would dodge the filter)")
      require(k != v, s"self-synonym '$k>$v' is a no-op")
    }
    val qsyn = querySynonyms
      .map { case (k, v) => (canon(k, "query-synonym key"),
        canon(v, "query-synonym value")) }
      .distinct.sorted
    qsyn.foreach { case (k, v) =>
      // a stopword KEY never survives query analysis (dead entry); a
      // stopword VALUE expands to a term the ingest filter guarantees
      // is absent from the index (dead expansion) — both rejected
      require(!allStop(k) && !allStop(v),
        s"query synonym '$k>$v' collides with a stopword — the key " +
          "never survives query analysis (or the value cannot be in " +
          "the index)")
      require(k != v, s"self-query-synonym '$k>$v' is a no-op")
    }
    val spec = s"custom(base=${b.name}" +
      (if (stop.isEmpty) "" else s";stop=${stop.mkString(",")}") +
      (if (syn.isEmpty) ""
       else s";syn=${syn.map { case (k, v) => s"$k>$v" }.mkString(",")}") +
      (if (qsyn.isEmpty) ""
       else s";qsyn=${qsyn.map { case (k, v) => s"$k>$v" }
         .mkString(",")}") +
      ")"
    Chain(spec, b.lowercase, b.splitRx, b.stopwords ++ stop, b.stem,
      syn, qsyn)
  }

  /** Equivalence-GROUP sugar — ES synonym files' comma lines
    * (`quick, fast` — every member means every other): each group
    * canonicalizes to its DIRECTED closure (all ordered pairs) in the
    * corresponding synonym map, so the serialized spec stays the one
    * canonical `syn=`/`qsyn=` form and [[byName]] round-trips it with
    * no separate group field. `groups` are index-time (stacked at
    * ingest — symmetric search with pooled df); `queryGroups` are
    * query-time (expanded at search — each member scored with its own
    * df). Two members that canonicalize to the same analyzed term
    * fail [[custom]]'s self-synonym check loudly. */
  def customGroups(base: String, extraStopwords: Seq[String] = Nil,
                   groups: Seq[Seq[String]] = Nil,
                   queryGroups: Seq[Seq[String]] = Nil,
                   synonyms: Seq[(String, String)] = Nil,
                   querySynonyms: Seq[(String, String)] = Nil)
      : Chain = {
    def closure(gs: Seq[Seq[String]]): Seq[(String, String)] =
      gs.flatMap { g =>
        require(g.size >= 2 && g.distinct.size == g.size,
          s"a synonym group needs >= 2 distinct members: $g")
        for (a <- g; b <- g if a != b) yield (a, b)
      }
    custom(base, extraStopwords, synonyms ++ closure(groups),
      querySynonyms ++ closure(queryGroups))
  }

  private def parseCustom(spec: String): Chain = {
    val body = spec.stripPrefix("custom(").stripSuffix(")")
    val fields = body.split(";", -1).toSeq
    def bad(why: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed custom analyzer spec '$spec': $why")
    if (fields.isEmpty || !fields.head.startsWith("base="))
      bad("first field must be base=<builtin>")
    val base = fields.head.stripPrefix("base=")
    var stop = Seq.empty[String]
    var syn = Seq.empty[(String, String)]
    var qsyn = Seq.empty[(String, String)]
    def pairs(body: String): Seq[(String, String)] =
      body.split(",", -1).toSeq.map { p =>
        p.split(">", -1) match {
          case Array(k, v) => (k, v)
          case _ => bad(s"synonym entry '$p' is not key>value")
        }
      }
    fields.tail.foreach {
      case f if f.startsWith("stop=") =>
        stop = f.stripPrefix("stop=").split(",", -1).toSeq
      case f if f.startsWith("syn=") =>
        syn = pairs(f.stripPrefix("syn="))
      case f if f.startsWith("qsyn=") =>
        qsyn = pairs(f.stripPrefix("qsyn="))
      case f => bad(s"unknown field '$f'")
    }
    val c = custom(base, stop, syn, qsyn)
    // the canonical form is the only admissible serialization — a
    // drifted header (reordered, un-canonicalized tokens) would make
    // equal chains compare unequal in federation
    if (c.name != spec)
      bad(s"not in canonical form (expected '${c.name}')")
    c
  }

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
    val base = s"filter(transform($raw, " +
      s"(t, i) -> named_struct('pos', bigint(i), 'term', $term)), " +
      s"x -> x.term <> ''$stop)"
    if (c.synonymMap.isEmpty) return expr(base)
    // index-time synonym expansion: each filtered token also emits
    // its mapped values AT THE SAME POSITION (Lucene's synonym-graph
    // stacking). Tokens are canonical [a-z0-9]+ ([[custom]] enforces
    // it), so the literal embedding is injection-safe; the ELSE arm's
    // slice(array(x), 1, 0) is the typed empty array.
    val cases = c.synonymMap.toSeq.sortBy(_._1).map { case (k, vs) =>
      s"WHEN '$k' THEN array(" + vs.map(v =>
        s"named_struct('pos', x.pos, 'term', '$v')").mkString(", ") +
        ")"
    }.mkString(" ")
    expr(s"flatten(transform($base, x -> concat(array(x), " +
      s"CASE x.term $cases ELSE slice(array(x), 1, 0) END)))")
  }

  /** COLUMN mirror: the analyzed document length — the number of
    * emitted terms (Lucene's field length for BM25's normalization;
    * for the whitespace chain this is exactly
    * `size(split(text, ' '))`, the pre-analyzer definition). */
  def dl(c: Chain, textCol: String): Column =
    size(posTerms(c, textCol)).cast("long")

  /** DRIVER mirror of the SEARCH-ANALYZER half of the chain: analyze
    * one string to its (position, term) pairs — used for query
    * phrases, where the positions carry the stopword gaps a phrase
    * match must respect. NEVER expands synonyms (index-time-synonym
    * setups drop the filter from the search analyzer — a query for
    * the value must hit through the INDEX's stacked tokens, not by
    * re-expanding the query); [[analyzeIngest]] is the ingest-side
    * mirror. */
  def analyzeText(c: Chain, s: String): Seq[(Long, String)] = {
    if (c == Whitespace)
      return s.split(" ", -1).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
    // Locale.ROOT: the column mirror (Spark lower()) and the DuckDB
    // oracle lower() are locale-independent; a default-locale
    // toLowerCase would diverge under e.g. tr_TR ('I' -> dotless 'ı')
    // and silently lose matches against the indexed vocabulary
    val lowered =
      if (c.lowercase) s.toLowerCase(java.util.Locale.ROOT) else s
    lowered.split(c.splitRx, -1).toSeq.zipWithIndex
      .map { case (t, i) => (i.toLong, if (c.stem) stemScala(t) else t) }
      .filter { case (_, t) => t.nonEmpty && !c.stopwordSet(t) }
  }

  /** DRIVER mirror of [[posTerms]] — the INGEST analysis, synonym
    * stacking included: what the index actually stores for `s`. The
    * property suite pins this against the column mirror on random
    * text; [[analyzeText]] (no expansion) is the query-side twin. */
  def analyzeIngest(c: Chain, s: String): Seq[(Long, String)] =
    if (c.synonymMap.isEmpty) analyzeText(c, s)
    else analyzeText(c, s).flatMap { case (p, t) =>
      (p, t) +: c.synonymMap.getOrElse(t, Nil).map(v => (p, v))
    }

  /** DRIVER mirror for TERM-LIST queries: analyze each query literal,
    * drop stopwords/empties, then apply the QUERY-TIME synonym filter
    * (each analyzed term also emits its mapped values — single-pass,
    * the search-analyzer placement; index-time synonyms never expand
    * here), dedup preserving first occurrence — what ES's match query
    * does to its input before hitting the index. */
  def queryTerms(c: Chain, terms: Seq[String]): Seq[String] =
    terms.flatMap(t => analyzeText(c, t).map(_._2))
      .flatMap(t => t +: c.querySynonymMap.getOrElse(t, Nil))
      .distinct

  /** DRIVER mirror for MULTI-TERM queries (prefix/wildcard/fuzzy):
    * Lucene NORMALIZES these (lowercase) but never stems or
    * stop-filters them — a `prefix: "Runn"` must match the indexed
    * `running`, which stemming the PATTERN would break. */
  def normalize(c: Chain, s: String): String =
    if (c.lowercase) s.toLowerCase(java.util.Locale.ROOT) else s

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
