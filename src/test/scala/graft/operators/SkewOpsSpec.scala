package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("salted join produces exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i.toLong))
      .toDF("k", "v")
    val small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewOps.saltedJoin(big, small, Seq("k"), salts = 8, saltBy = Seq(col("v")))
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }
}
