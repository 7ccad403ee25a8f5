package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, UpdateSketch}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theta-sketch set operations: distinct-count estimates for
  * INTERSECTIONS and differences between populations — "how many
  * distinct users did BOTH purchase and click" — which HLL cannot
  * answer (its registers only union). Theta sketches retain the k
  * smallest value hashes under a fixed library seed, so estimates are
  * deterministic in the input SET (insertion order, partitioning, and
  * merge order all irrelevant), and a ~32 KB sketch per population
  * stands in for any number of corpus rows.
  *
  * Scale shape: one pass builds a per-partition sketch per group
  * (mapPartitions — the classic hand-rolled partial aggregate; the
  * shuffle carries one compact sketch per partition per group, never
  * rows), a per-group union folds them, and the pairwise set algebra
  * runs driver-side over #groups sketches (bounded by the group-key
  * cardinality, independent of corpus size).
  *
  * Reference scope: cdp has no sketch operators; this extends the
  * §2.6 battery next to `agg_approx_distinct`/`SketchIndex` per the
  * training-data-pipeline mandate (population overlap is the
  * distinct-level face of benchmark contamination).
  */
object ThetaOps {

  /** Nominal entries (k). 4096 → ~1.6% RSE in estimation mode; exact
    * below ~k distinct values.
    */
  val NominalEntries = 4096

  /** One compact theta sketch of `value` per group, DISTRIBUTED:
    * per-partition build (the classic hand-rolled partial aggregate —
    * the shuffle carries one compact sketch per partition per group,
    * never rows), per-group union. The streaming arm loads this
    * straight into the state store as initial state; the batch set
    * algebra collects it (bounded by group-key cardinality).
    */
  def groupSketchesDs(df: DataFrame, group: String,
                      value: Column): org.apache.spark.sql.Dataset[(String, Array[Byte])] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("string").as("g"), value.cast("long").as("v"))
      .as[(String, Long)]
      .mapPartitions { rows =>
        val sks = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        rows.foreach { case (g, v) =>
          sks.getOrElseUpdate(g,
            UpdateSketch.builder().setNominalEntries(NominalEntries).build())
            .update(v)
        }
        sks.iterator.map { case (g, sk) => (g, sk.compact().toByteArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (g, parts) =>
        val u = SetOperation.builder().setNominalEntries(NominalEntries).buildUnion()
        parts.foreach { case (_, b) => u.union(heapify(b)) }
        (g, u.getResult.toByteArray)
      }
  }

  /** One compact theta sketch of `value` per group, as a driver map —
    * for the pairwise set algebra, which is #groups-bounded by design.
    */
  def groupSketches(df: DataFrame, group: String, value: Column): Map[String, Array[Byte]] =
    groupSketchesDs(df, group, value).collect().toMap

  def heapify(b: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(b))

  def estimate(b: Array[Byte]): Long = Math.round(heapify(b).getEstimate)

  def intersectionEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val i = SetOperation.builder().setNominalEntries(NominalEntries).buildIntersection()
    i.intersect(heapify(a)); i.intersect(heapify(b))
    Math.round(i.getResult.getEstimate)
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val u = SetOperation.builder().setNominalEntries(NominalEntries).buildUnion()
    u.union(heapify(a)); u.union(heapify(b))
    Math.round(u.getResult.getEstimate)
  }

  /** A-not-B: distinct values in `a`'s population absent from `b`'s. */
  def differenceEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val d = SetOperation.builder().buildANotB()
    Math.round(d.aNotB(heapify(a), heapify(b)).getEstimate)
  }

  /** All-pairs population overlap for one grouped column: per-pair
    * (estimated |A|, |B|, |A∩B|, |A∪B|) as a DataFrame, pairs ordered
    * lexicographically. Deterministic — rows-only for the driver, with
    * Verify's invariant gating estimates against exact intersections.
    */
  def pairwiseOverlap(df: DataFrame, group: String, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sks = groupSketches(df, group, value)
    val keys = sks.keys.toSeq.sorted
    val rows = for {
      i <- keys.indices; j <- (i + 1) until keys.length
      (a, b) = (keys(i), keys(j))
    } yield (a, b, estimate(sks(a)), estimate(sks(b)),
      intersectionEstimate(sks(a), sks(b)), unionEstimate(sks(a), sks(b)))
    rows.toDF("ga", "gb", "est_a", "est_b", "est_both", "est_union")
      .orderBy("ga", "gb")
  }
}
