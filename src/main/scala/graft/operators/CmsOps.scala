package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame —
  * the frequency-estimate companion to the HLL distinct index
  * ([[SketchIndex]]) and the Misra-Gries heavy-hitter aggregate.
  *
  * The sketch IS a tiny DataFrame of (depth, cell, cnt) rows — at
  * most Depth×Width of them regardless of corpus size — built by one
  * map-side-combinable hash aggregate over the token stream (each
  * token increments one cell per depth row). Estimates are the
  * classic min-over-depths of the probed cells: never an
  * undercount, over by at most εN with probability 1−δ
  * (ε = e/Width, δ = e^−Depth).
  *
  * Everything is deterministic: the cell function is the repo's
  * portable md5-prefix hash salted by the depth index, so a DuckDB
  * oracle reproduces the sketch bit-for-bit (text_cms_counts is
  * hash-exact, not invariant-gated), and two sketches over the same
  * multiset are EQUAL — merge (cell-wise sum) is exact, which the
  * spec pins as union-of-splits == one-shot. That makes the sketch an
  * incremental index: persist the cells, add each day's crawl by
  * summation, never rescan the corpus.
  */
object CmsOps {

  /** Sketch geometry: 4 depths × 1024 cells ⇒ ε ≈ 0.27% of the
    * stream length per estimate at δ ≈ 1.8%, in 32 KB of longs.
    */
  val Depth = 4
  val Width = 1024

  /** The depth-salted portable cell hash of token column `t` for
    * depth column `d` — first 8 md5 hex digits of "d|token", mod
    * Width. Positive (md5 prefix < 2^32), so `%` is a true modulus.
    */
  def cell(d: Column, t: Column): Column =
    conv(substring(md5(concat(d.cast("string"), lit("|"), t)), 1, 8), 16, 10)
      .cast("long") % Width

  /** The identical cell computation as DuckDB SQL (for oracles). */
  def cellSql(d: String, t: String): String =
    s"CAST(('0x'||substring(md5(CAST($d AS VARCHAR)||'|'||$t),1,8)) AS BIGINT) % $Width"

  private val jvmMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM mirror of [[cell]] for per-row state code (the streaming
    * arm): first 4 md5 bytes of "d|token" big-endian unsigned, mod
    * Width — bit-identical to the Column/SQL forms.
    */
  def cellOf(d: Int, t: String): Int = {
    val md = jvmMd5.get()
    md.reset()
    val h = md.digest(s"$d|$t".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % Width).toInt
  }

  /** Build the sketch over a token column: one row per touched
    * (depth, cell), cnt = number of stream items hashing there. The
    * Depth× fan-out happens before the aggregate's partial phase, so
    * the shuffle carries at most Depth×Width partial rows per task —
    * sketch-sized, not corpus-sized.
    */
  def buildCms(df: DataFrame, tok: Column): DataFrame =
    df.select(tok.as("__tok"))
      .select(explode(sequence(lit(0), lit(Depth - 1))).as("d"), col("__tok"))
      .groupBy(col("d"), cell(col("d"), col("__tok")).as("cell"))
      .agg(count(lit(1)).as("cnt"))

  /** Build the sketch from per-token COUNTS (one row per distinct
    * token) — row-for-row EQUAL to [[buildCms]] over the expanded
    * stream (a cell's count is the sum of the counts of the tokens
    * hashing there, however they arrive), but the Depth× fan-out and
    * the md5 cell hash run once per DISTINCT token instead of once
    * per occurrence — aggregate before you shuffle (guide §2.3). The
    * caller usually has the counts anyway (truth columns, tf tables).
    */
  def buildCmsFromCounts(counts: DataFrame, tok: Column, cnt: Column): DataFrame =
    counts.select(tok.as("__tok"), cnt.cast("long").as("__cnt"))
      .select(explode(sequence(lit(0), lit(Depth - 1))).as("d"),
        col("__tok"), col("__cnt"))
      .groupBy(col("d"), cell(col("d"), col("__tok")).as("cell"))
      .agg(sum("__cnt").as("cnt"))

  /** Merge sketches built over disjoint slices: cell-wise sum. Exact —
    * mergeCms(buildCms(A), buildCms(B)) == buildCms(A ∪ B) row-for-row.
    */
  def mergeCms(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("d", "cell").agg(sum("cnt").as("cnt"))

  /** Point estimates for the distinct values of `tok` in `probe`:
    * min over depths of the probed cells. The sketch side is
    * broadcast (≤ Depth×Width rows by construction), so the probe is
    * a narrow per-row lookup at any corpus size. Cells never probed
    * to 0: a probe token absent from the sketch's stream still hits
    * Depth existing-or-absent cells — absent cells count 0 via the
    * left join.
    */
  def probeCms(cms: DataFrame, probe: DataFrame, tok: Column): DataFrame =
    probe.select(tok.as("tok")).distinct()
      .select(col("tok"), explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("cell", cell(col("d"), col("tok")))
      .join(broadcast(cms), Seq("d", "cell"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
}
