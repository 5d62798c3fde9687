package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * The reference's search capability is entirely delegated to
  * Elasticsearch/Lucene (`api/controllers/elastic_controller.go:196-229`
  * pushes documents; querying happens in ES). This module supplies the
  * dense-vector analogue natively:
  *
  *  - brute-force cosine top-k: the exact baseline — a broadcast of the
  *    (small) query set against the full corpus, one pass, no shuffle on
  *    the corpus side; per-row work is a codegen'd higher-order-function
  *    fold, no UDF;
  *  - LSH-bucketed ANN: random-hyperplane signatures partition the corpus
  *    into buckets; search touches only candidates sharing a bucket with
  *    the query in any of L tables. At 100 TB the corpus side is
  *    pre-bucketed once (write-time partitioning by bucket key) and a
  *    query reads only its buckets — this is the IVF posture on files.
  *
  * Determinism: all arithmetic is element-order-sequential left folds on
  * doubles (cast from float *before* multiplying), so results are
  * bit-identical across engines and partitionings.
  */
object Similarity {

  /** Cast the float embedding to double and attach its L2 norm. */
  def withNorm(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df
      .withColumn("dvec", expr(s"transform($vecCol, x -> cast(x as double))"))
      .withColumn("norm", expr(
        "sqrt(aggregate(dvec, cast(0.0 as double), (acc, x) -> acc + x * x))"))

  /** Exact cosine top-k: for every query vector (rows matching
    * `queryPred`), the k nearest corpus vectors by cosine similarity.
    * The query side is broadcast (it is small by construction); the
    * corpus is scanned exactly once. Ties broken by neighbor id.
    * Output: (q_id, neighbor_id, rank, cos).
    */
  def bruteForceTopK(emb: DataFrame, queryPred: String, k: Int): DataFrame = {
    val n = withNorm(emb)
    val q = n.filter(expr(queryPred))
      .select(col("vec_id").as("q_id"), col("dvec").as("q_vec"),
        col("norm").as("q_norm"))
    val c = n.select(col("vec_id").as("neighbor_id"), col("dvec"), col("norm"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("q_id"))
      .withColumn("cos", expr(
        "aggregate(zip_with(q_vec, dvec, (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, x) -> acc + x) / (q_norm * norm)"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (table t,
    * bit j, dim k): integer in [-48, 48]. Portable arithmetic so the
    * DuckDB oracle reproduces the exact same planes.
    * Spark `transform` lambda indices are 0-based (DuckDB's are 1-based —
    * the oracle uses k-1).
    */
  private def planeExpr(t: Int, j: Int): String =
    s"aggregate(transform(dvec, (x, k) -> " +
      s"x * cast((7 + 31 * ${t * 8 + j + 1} * (k + 3)) % 97 - 48 as double)), " +
      "cast(0.0 as double), (acc, x) -> acc + x)"

  /** Attach L sign-LSH bucket ids (one per hash table), each from
    * `nBits` hyperplane sign bits folded MSB-first into an int.
    */
  def withLshBuckets(df: DataFrame, tables: Int = 4, nBits: Int = 4): DataFrame = {
    val n = if (df.columns.contains("dvec")) df else withNorm(df)
    (0 until tables).foldLeft(n) { (acc, t) =>
      val bits = (0 until nBits)
        .map(j => s"if(${planeExpr(t, j)} >= cast(0.0 as double), 1L, 0L)")
        .mkString(", ")
      acc.withColumn(s"bucket_$t", expr(
        s"aggregate(array($bits), 0L, (acc, x) -> acc * 2 + x)"))
    }
  }

  /** Approximate top-k: exact cosine ranking restricted to candidates
    * that share a bucket with the query in ANY of the L tables. The
    * candidate join is per-(table, bucket) — never all-pairs — and the
    * bucket key is what you would partition the corpus files by at scale.
    * Output: (q_id, neighbor_id, rank, cos).
    */
  def annTopK(emb: DataFrame, queryPred: String, k: Int,
              tables: Int = 4, nBits: Int = 4): DataFrame = {
    val bucketed = withLshBuckets(emb, tables, nBits)
    val bandCols = (0 until tables).map(t => col(s"bucket_$t"))
    // (vec_id, table_id, bucket) long form for the bucket-equality join.
    val long = bucketed.select(col("vec_id"), col("dvec"), col("norm"),
      posexplode(array(bandCols: _*)).as(Seq("table_id", "bucket")))
    val q = long.join(
      bucketed.filter(expr(queryPred)).select(col("vec_id").as("qid")),
      col("vec_id") === col("qid"))
      .select(col("vec_id").as("q_id"), col("dvec").as("q_vec"),
        col("norm").as("q_norm"), col("table_id"), col("bucket"))
    val cands = long.join(broadcast(q),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("q_norm"),
        col("vec_id").as("neighbor_id"), col("dvec"), col("norm"))
      .dropDuplicates("q_id", "neighbor_id")
    val scored = cands.withColumn("cos", expr(
      "aggregate(zip_with(q_vec, dvec, (x, y) -> x * y), " +
        "cast(0.0 as double), (acc, x) -> acc + x) / (q_norm * norm)"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * `threshold`, generated via the LSH bucket join (candidates must
    * share a bucket in some table) and exact-verified — the same
    * two-phase candidates→verify shape as [[Dedup.minhashNearDups]].
    * Output: (id_a, id_b, cos), id_a < id_b.
    */
  def cosineNearDups(emb: DataFrame, threshold: Double,
                     tables: Int = 8, nBits: Int = 2): DataFrame = {
    val long = withLshBuckets(emb, tables, nBits)
      .select(col("vec_id"), col("dvec"), col("norm"),
        posexplode(array((0 until tables).map(t => col(s"bucket_$t")): _*))
          .as(Seq("table_id", "bucket")))
    val a = long.alias("a")
    val b = long.alias("b")
    a.join(b,
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.dvec").as("va"), col("a.norm").as("na"),
        col("b.dvec").as("vb"), col("b.norm").as("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, x) -> acc + x) / (na * nb)"))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
