package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL faces must evaluate identically to the Column/Expression
  * API they wrap — checked value-for-value over real corpus text.
  */
class GraftSqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftSqlFunctions.register(s)
    s
  }

  test("scalar faces: nfc, hilbert, dot, sorted_intersect literals") {
    val r = spark.sql(
      """SELECT graft_nfc('été') AS nfc,
        |  graft_hilbert2(3L, 5L) AS h,
        |  graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |  graft_sorted_intersect(array(1L, 3L, 7L), array(3L, 5L, 7L)) AS si
        |""".stripMargin).head()
    assert(r.getAs[String]("nfc") == "été")
    assert(r.getAs[Long]("h") ==
      HilbertIndex2.xy2d(3L, 5L))
    assert(r.getAs[Double]("d") == 1.5 * 4.0 + 2.0 * 0.5)
    assert(r.getAs[Long]("si") == 2L)
    val hn = spark.sql("SELECT graft_hilbertn(5, 3L, 5L, 7L) AS h3").head()
    assert(hn.getAs[Long]("h3") == HilbertN.toIndex(5, Array(3L, 5L, 7L)))
    intercept[Exception] { spark.sql("SELECT graft_hilbertn(5, 1L)").head() }
    // bits = 0 would shift the cell mask into the sign bit and return
    // silent garbage — rejected at construction with a clear message
    intercept[Exception] { spark.sql("SELECT graft_hilbertn(0, 3L, 5L)").head() }
    // non-long axes are an ANALYSIS error (ExpectsInputTypes), not a
    // runtime ClassCastException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbertn(5, 'a', 'b')").head()
    }
  }

  test("graft_signpack: bits against anchors, Hamming via native bit_count(^)") {
    val r = spark.sql(
      """SELECT graft_signpack(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT),
        |                            CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                      array(0.0D, 0.0D, 0.0D, 0.0D)) AS a,
        |  graft_signpack(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT),
        |                       CAST(-0.5 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                 array(0.0D, 0.0D, 0.0D, 0.0D)) AS b
        |""".stripMargin).head()
    assert(r.getAs[Long]("a") == 0x5L && r.getAs[Long]("b") == 0x3L)
    val h = spark.sql(
      "SELECT bit_count(graft_signpack(array(CAST(1.0 AS FLOAT)), array(0.0D)) ^ " +
        "graft_signpack(array(CAST(-1.0 AS FLOAT)), array(0.0D))) AS ham").head()
    assert(h.getAs[Int]("ham") == 1)
    // anchors must be a foldable numeric array, loudly
    intercept[Exception] {
      spark.sql("SELECT graft_signpack(array(CAST(1.0 AS FLOAT)), array('x'))").head()
    }
    // a NULL anchor element would silently read as 0.0 through the
    // primitive getter and skew that dimension's code bit — refused
    val exNull = intercept[Exception] {
      spark.sql("SELECT graft_signpack(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(0.0D, CAST(NULL AS DOUBLE)))").head()
    }
    assert(exNull.getMessage.contains("NULL element"), exNull.getMessage)
  }

  test("graft_signpackn / graft_hamming: multi-word codes and word-summed Hamming from SQL") {
    // 4 dims in one word: word 0 must equal graft_signpack's long
    val r = spark.sql(
      """SELECT graft_signpackn(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT),
        |                             CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                       array(0.0D, 0.0D, 0.0D, 0.0D)) AS c""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(0x5L))
    val h = spark.sql(
      "SELECT graft_hamming(graft_signpackn(array(CAST(1.0 AS FLOAT)), array(0.0D)), " +
        "graft_signpackn(array(CAST(-1.0 AS FLOAT)), array(0.0D))) AS ham").head()
    assert(h.getAs[Int]("ham") == 1)
    // a NULL anchor is refused like the one-long face
    intercept[Exception] {
      spark.sql("SELECT graft_signpackn(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(NULL AS DOUBLE)))").head()
    }
  }

  test("sql faces equal the Column API over real documents") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash32(toks) AS sh,
        |  graft_shingle_hashes(text, 3) AS gh
        |FROM docs_sqlfn""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    val viaCol = spark.table("docs_sqlfn")
      .select(col("doc_id"),
        TextExpressions.simHash32(col("toks")).as("sh"),
        TextExpressions.shingleHashes(col("text"), 3).as("gh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(viaSql.nonEmpty && viaSql.sortBy(_._1) == viaCol.sortBy(_._1))
  }
}
