package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Cosine similarity is computed as an explicit left-to-right fold in
  * double precision (elements widened float→double first), which makes
  * the result bit-identical to a left-associated SQL sum over the same
  * parquet floats — the DuckDB oracle is exact, no tolerance needed.
  *
  * Two search paths:
  *   - [[bruteForceTopK]]: the correctness baseline — broadcast the
  *     (small) query set against every vector; one pass, no shuffle of
  *     the big side beyond the final per-query top-k.
  *   - [[lshTopK]]: the scale path — random-hyperplane signature
  *     buckets vectors so each only scores against its bucket. At 100
  *     TB the bucket join replaces the all-pairs cross product; recall
  *     is traded via the number of sign bits.
  */
object Similarity {

  /** Sequential left-to-right dot product in double precision —
    * native codegen'd expression (see
    * [[graft.functions.VectorExpressions.DotProduct]]); identical
    * IEEE operation sequence to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Higher-order-function formulation — kept as the reference
    * implementation the native expression is tested against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val v = vectors.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = v.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "nid", "cos")
  }

  /** Deterministic pseudorandom hyperplanes (LCG, seed-fixed): `bits`
    * planes of dimension `dim`, components in [-1, 1).
    */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
    Seq.fill(bits)(Seq.fill(dim)(next()))
  }

  /** Sign-bit bucket id from the hyperplane projections. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bits for ~`targetBucket` expected vectors per bucket at table
    * size `n`: bits ≈ log₂(n / targetBucket), the auto-tuning that
    * keeps candidate volume flat as the table grows (at billions of
    * vectors this lands near 20+ bits instead of a hand-picked
    * constant that would produce mega-buckets).
    */
  def autoBits(n: Long, targetBucket: Int = 32): Int = {
    val b = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(48, math.max(4, b))
  }

  /** Approximate all-vectors top-k via multi-table sign-LSH: `tables`
    * independent hash tables of `bits` sign bits each; a pair is a
    * candidate if it collides in ANY table. Candidates are scored
    * once (dedup on the pair), then per-query top-k.
    *
    * Scale shape: the cross product is replaced by `tables` bucket
    * joins; expected candidates per query ≈ tables × n / 2^bits, tuned
    * by (bits, tables) for the recall/cost point — the standard
    * E2LSH-style layout.
    *
    * `bits <= 0` auto-tunes to [[autoBits]] of the table's row count
    * (`numRows`, counted once if not supplied). The two vector-lookup
    * joins broadcast only while the table fits comfortably
    * (`numRows <= broadcastMaxRows`); beyond that they become
    * shuffle-hash joins bucketed on the id, so nothing table-sized
    * ever ships to every executor.
    */
  def lshTopK(vectors: DataFrame, k: Int, bits: Int, dim: Int, tables: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              numRows: Long = -1L, broadcastMaxRows: Long = 2_000_000L): DataFrame = {
    val b = vectors.select(col(idCol), col(vecCol))
    val n = if (numRows >= 0) numRows else b.count()
    val effBits = if (bits > 0) bits else autoBits(n)
    // all tables' buckets in one pass: bucket column per table, then
    // posexplode to (table, bucket) rows. Candidate generation works
    // on ids only — the 64-float vectors do not ride through the
    // bucket join or the pair dedup shuffle; they join back once per
    // surviving pair.
    val allPlanes = (0 until tables).flatMap(t => hyperplanes(effBits, dim, seed = 7L + t))
    val buckets = b.withColumn("bs",
        graft.functions.VectorExpressions.lshBuckets(col(vecCol), allPlanes, dim, effBits))
      .select(col(idCol), posexplode(col("bs")).as(Seq("tbl", "bucket")))
    val x = buckets.select(col("tbl"), col("bucket"), col(idCol).as("qid"))
    val y = buckets.select(col("tbl"), col("bucket"), col(idCol).as("nid"))
    val cand = x.join(y, Seq("tbl", "bucket")).filter(col("qid") =!= col("nid"))
      .select("qid", "nid").dropDuplicates("qid", "nid")
    val qSide = b.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val nSide = b.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = (if (n <= broadcastMaxRows)
        cand.join(broadcast(qSide), "qid").join(broadcast(nSide), "nid")
      else
        cand.join(qSide.hint("shuffle_hash"), "qid")
          .join(nSide.hint("shuffle_hash"), "nid"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("qid", "rnk", "nid", "cos")
  }
}
