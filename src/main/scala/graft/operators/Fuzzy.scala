package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy-matching tier: edit-distance self-join and asymmetric
  * set-containment detection — the two dedup shapes the Jaccard tier
  * (Dedup.scala) cannot express. Jaccard is symmetric and token-order
  * blind; real corpora also need (a) "these two short strings are the
  * same up to a typo" (titles, names, near-identical URLs) and (b)
  * "document A is mostly QUOTED inside document B" (containment — a
  * 200-token quote inside a 20k-token page has Jaccard ≈ 0.01 but
  * containment ≈ 1.0).
  *
  * Reference basis: the reference delegates all matching to
  * Elasticsearch (`/root/reference/api/controllers/elastic_controller.go:197-224`),
  * whose fuzzy queries are Damerau-Levenshtein automata per shard;
  * this module is the batch, corpus-scale equivalent (SURVEY §2.5).
  *
  * Determinism contract (shared with the rest of the repo): every
  * blocking key is an md5 digest of derived text; verification uses
  * exact integer edit distance / integer set counts; the single final
  * division producing a ratio is one IEEE double op on
  * exactly-representable integers — bitwise portable to the DuckDB
  * oracles.
  */
object Fuzzy {

  /** SQL expr: the depth-1 deletion neighborhood of column `c` — the
    * string itself (i = 0) plus its |c| single-character deletions. */
  private[operators] def del1Expr(c: String): String =
    s"transform(sequence(0, length($c)), i -> if(i = 0, $c, " +
      s"concat(substring($c, 1, i - 1), substring($c, i + 1))))"

  /** SQL expr: the depth-2-only deletions of column `c` (every i < j
    * pair of positions removed). Guarded by the caller behind a length
    * check — sequence(1, length(c) - 1) REVERSES below length 2
    * (Spark sequences auto-step -1), so the expression must only
    * evaluate on strings long enough to qualify for two edits anyway.
    */
  private[operators] def del2Expr(c: String): String =
    s"flatten(transform(sequence(1, length($c) - 1), i -> " +
      s"transform(sequence(i + 1, length($c)), j -> " +
      s"concat(substring($c, 1, i - 1), substring($c, i + 1, j - i - 1), " +
      s"substring($c, j + 1)))))"

  /** SQL expr: the deletion neighborhood of column `c` at Lucene-AUTO
    * depth — depth 1 always, depth 2 added only for strings of length
    * ≥ `minLen2` (Lucene's AUTO fuzziness rule: terms under 6 chars
    * allow at most one edit, so their depth-2 variants would only
    * manufacture candidates the verify step rejects).
    */
  private[operators] def delAutoExpr(c: String, maxDist: Int,
                                     minLen2: Int = 6): String =
    if (maxDist <= 1) del1Expr(c)
    else s"array_union(${del1Expr(c)}, if(length($c) >= $minLen2, " +
      s"${del2Expr(c)}, cast(array() as array<string>)))"

  /** All pairs of rows whose strings are within Levenshtein distance
    * `maxDist` (1 or 2), found WITHOUT an all-pairs comparison:
    * deletion-neighborhood blocking (the SymSpell scheme). Each string
    * emits its deletion variants up to the allowed depth; two strings
    * at edit distance ≤ d provably share a depth-≤d variant —
    *   substitution at i: deleting position i from both sides yields
    *     the same string;
    *   insertion/deletion: deleting the inserted character from the
    *     longer side yields the shorter side's identity variant;
    *   equality: both identity variants match;
    *   and any 2-edit pair composes two of the above, one deletion
    *     per edit per side (two subs → depth 2 both sides; sub+del →
    *     depth 2 on the longer, 1 on the shorter; two dels → depth 2
    *     on the longer, 0 on the shorter) —
    * so the blocking is RECALL-1 at every allowed distance (FuzzySpec
    * pins each edit shape). Farther pairs can also collide; the exact
    * `levenshtein` verification filters them.
    *
    * Depth 2 follows Lucene's AUTO rule: only strings of length ≥ 6
    * generate depth-2 variants, and a pair is allowed distance 2 only
    * when BOTH sides have length ≥ 6 (otherwise 1). That bounds the
    * variant blow-up — depth 2 is O(|s|²/2) per string — to the
    * strings whose allowance can use it, and the recall argument
    * stays airtight: a distance-2 pair under the both-≥6 allowance
    * needs depth 2 only on sides of length ≥ 6 (two substitutions
    * force equal lengths; insertions only lengthen).
    *
    * Scale shape: the explode is linear at depth 1 and
    * length-squared at depth 2 (md5(variant) digests shuffle, never
    * variant text), the self-join is keyed by those digests, and
    * candidate groups are true near-dup clusters plus rare digest
    * collisions, never the corpus. The exact verify runs only on
    * candidates. No all-pairs product at any corpus size; intended
    * for short strings (titles/names — the variant count is
    * per-CHARACTER, so apply to a derived title column, not document
    * bodies).
    *
    * Output: (id_a, id_b, dist) with id_a < id_b, one row per pair.
    */
  def editDistancePairs(strings: DataFrame, idCol: String,
                        strCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2: $maxDist")
    val base = strings.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"))
    // persisted: the self-join consumes the variant frame twice, and
    // re-evaluating the explode+md5 chain per side doubles the scan
    val variants = base
      .withColumn("v", explode(expr(delAutoExpr("s", maxDist))))
      .select(col("id"), md5(col("v")).as("vd"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = variants.alias("a")
      .join(variants.alias("b"), "vd")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <=
        when(length(col("s_a")) >= 6 && length(col("s_b")) >= 6,
          lit(maxDist)).otherwise(lit(1)))
      .select("id_a", "id_b", "dist")
  }

  /** Asymmetric containment detection over distinct word n-gram shingle
    * sets: emit (a, b, ...) whenever `|S_a ∩ S_b| / |S_a| ≥ tauNum/tauDen`
    * with a ≠ b — "doc a's shingles are mostly inside doc b" (quote /
    * subset / boilerplate-page detection). Note the direction: a short
    * quote scores ~1.0 against its source while the source scores low
    * against the quote, exactly the asymmetry Jaccard erases.
    *
    * Candidate generation is PREFIX FILTERING under a global rarity
    * order (the PPJoin containment bound): order every doc's shingles
    * by (corpus frequency ASC, digest ASC) and take the first
    * `|S_a| - ceil(tau·|S_a|) + 1` as doc a's prefix. If
    * `|S_a ∩ S_b| ≥ tau·|S_a|` then a misses at most
    * `(1-tau)·|S_a| < prefixLen` of its shingles from S_b, so at least
    * one PREFIX shingle is shared — recall-1 (FuzzySpec pins it).
    * Because the prefix holds each doc's RAREST shingles, its posting
    * lists are the corpus's shortest: the candidate join is keyed by
    * rare digests, never by stopword-grade shingles.
    *
    * Scale shape: three digest-keyed shuffles (frequency count, prefix
    * rank, candidate join) + one candidate-bounded intersection count;
    * md5 digests move, never shingle text. The exact verify joins only
    * candidate pairs. Threshold compare is exact integer
    * (`tauDen·shared ≥ tauNum·|S_a|`); the reported ratio is one
    * IEEE division of exact integers.
    *
    * Output: (a_id, b_id, n_shared, n_a, containment), a ≠ b.
    */
  def containmentPairs(docs: DataFrame, n: Int = 5, tauNum: Int = 4,
                       tauDen: Int = 5): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum,
      s"need 0 < tau <= 1: $tauNum/$tauDen")
    // One tokenize+shingle+digest pass, persisted: four downstream
    // consumers (sizes, frequency, postings, verify) would otherwise
    // each re-evaluate the whole higher-order shingle chain (the
    // Generate-re-evaluation pathology measured at 7× in
    // Dedup.minhashSignatures — here it was 4× the corpus scan).
    val arr = TextOps.withShingles(docs, n)
      .select(col("doc_id"),
        expr("transform(shingles, s -> md5(s))").as("gds"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = arr.select(col("doc_id"), explode(col("gds")).as("gd"))
    // per-doc set size straight off the array — no aggregation shuffle
    val sizes = arr.select(col("doc_id"),
      size(col("gds")).cast("long").as("n_sh"))
    val freq = sh.groupBy("gd").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(asc("df"), asc("gd"))
    val prefix = sh.join(freq, "gd")
      .withColumn("rn", row_number().over(w))
      .join(sizes, "doc_id")
      // prefixLen = n_sh - ceil(tau*n_sh) + 1, all integer (`div`,
      // not `/` — Column./ is IEEE division)
      .filter(col("rn") <= expr(
        s"n_sh - ((n_sh * $tauNum + ${tauDen - 1}) div $tauDen) + 1"))
      .select(col("doc_id").as("a_id"), col("gd"))
    val cand = prefix
      .join(sh.select(col("doc_id").as("b_id"), col("gd")), "gd")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id")
      .distinct()
    // exact verify on candidates only: both digest SETS rebind by key
    // and intersect per pair — `gds` is array_distinct by construction,
    // so the intersection size IS the shared-distinct-shingle count
    val shared = cand
      .join(arr.select(col("doc_id").as("a_id"), col("gds").as("gds_a")),
        "a_id")
      .join(arr.select(col("doc_id").as("b_id"), col("gds").as("gds_b")),
        "b_id")
      .withColumn("n_shared",
        size(array_intersect(col("gds_a"), col("gds_b"))).cast("long"))
    shared
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")),
        "a_id")
      .filter(col("n_shared") * tauDen >= col("n_a") * tauNum)
      .withColumn("containment",
        col("n_shared").cast("double") / col("n_a").cast("double"))
      .select("a_id", "b_id", "n_shared", "n_a", "containment")
  }
}
