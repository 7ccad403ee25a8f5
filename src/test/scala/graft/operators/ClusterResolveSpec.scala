package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Both tiers of duplicate-cluster resolution (driver union-find under
  * the row budget, distributed min-label propagation beyond) must
  * produce identical components: member -> min doc_id of component.
  */
class ClusterResolveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
  private val pairEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L),
    (10L, 11L),
    (20L, 21L), (21L, 22L), (20L, 22L))

  private val expected = Set(
    (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
    (10L, 10L), (11L, 10L),
    (20L, 20L), (21L, 20L), (22L, 20L))

  private def run(maxDriverPairs: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val pairs = pairEdges.toDF("a", "b")
    TextQueries.clusterResolve(pairs, maxDriverPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("driver union-find tier resolves components to min-id labels") {
    assert(run(maxDriverPairs = 1000000L) == expected)
  }

  test("distributed label-propagation tier agrees with the driver tier") {
    assert(run(maxDriverPairs = 0L) == expected)
  }

  test("distributed tier through a RELIABLE checkpoint dir: same components, blocks on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-resolve")
    val pairs = pairEdges.toDF("a", "b")
    val got = TextQueries.clusterResolve(pairs, maxDriverPairs = 0L,
        checkpointDir = Some(dir.toString))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // the rounds actually went through the reliable path: RDD
    // checkpoint data materialized under the dir (executor-death-safe,
    // unlike localCheckpoint blocks)
    def walk(p: java.nio.file.Path): Iterator[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).toArray.iterator
          .map(_.asInstanceOf[java.nio.file.Path]).flatMap(walk)
      else Iterator(p)
    assert(walk(dir).exists(_.getFileName.toString.startsWith("part-")),
      s"no checkpointed partition files under $dir")
  }

  test("distributed tier collapses a 512-node chain (diameter 511) — the star-contraction shape") {
    import spark.implicits._
    // a pure path graph is the worst case for diameter-bound
    // propagation (O(n) rounds); large-star/small-star contraction
    // must still land the fixpoint inside its 50-round cap — O(log n)
    // — and label every node with the chain's minimum. Shuffled edge
    // order so no arrival-order accident can stand in for convergence.
    val rnd = new scala.util.Random(7)
    val chain = rnd.shuffle((0L until 511L).map(i => (i, i + 1)).toVector)
    val got = TextQueries.clusterResolve(chain.toDF("a", "b"), maxDriverPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 511L).map(i => (i, 0L)).toSet)
  }
}
