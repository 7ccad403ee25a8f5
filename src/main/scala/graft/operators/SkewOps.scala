package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (a handful of hot keys holding most rows — the classic 100 TB
  * failure mode when AQE's skew splitting isn't enough or the join
  * isn't sort-merge).
  *
  * Salted join: the skewed (big) side gets a deterministic salt in
  * [0, n) derived from a row fingerprint; the other side is replicated
  * n times, once per salt. Each hot key fans out over n reducers.
  * Deterministic salting (hash of the row, not rand()) keeps results
  * and retries stable.
  */
object SkewOps {

  /** Inner-join `big` with `small` on `keys`, salting `big` into
    * `salts` buckets and replicating `small` per bucket.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(saltBy: _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
