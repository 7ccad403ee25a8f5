package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth proof harness: synthesize an N× replica of a testdata
  * scale-factor directory (same schemas, preserved distributions,
  * shifted key spaces) and measure per-query growth factors between
  * the two scales. A plan that "survives 100×" should grow ~linearly
  * here; anything super-linear (all-pairs blowup, driver collect,
  * mega-bucket skew) shows up as a growth factor far above the data
  * factor.
  *
  * Replication strategy (replica r of factor N, r=0 is the original):
  *   - dimension-stable tables (`region`, `nation`) are copied —
  *     a 10× corpus does not grow the region list;
  *   - fact/dim keys shift by r × (max(key)+1), preserving join
  *     fan-outs and referential integrity (`orders.o_custkey` moves
  *     with `customer.c_custkey`, etc.);
  *   - `events` shifts `ts` by r × (span + 1h): the timeline grows 10×
  *     longer at the same arrival rate, key cardinality (`event_type`)
  *     unchanged — the realistic stream growth shape;
  *   - `documents` word-tags every token of replicas r>0 with `r<r>_`:
  *     WITHIN a replica the near-duplicate structure is exactly the
  *     original corpus's (near-dup pairs scale ×N, per-doc dup rate
  *     constant), ACROSS replicas no shingle ever matches — so dedup
  *     candidate volume grows like a real corpus, not like N² clones;
  *   - `embeddings` adds deterministic hash-noise (±0.02/component) to
  *     replicas r>0, so ANN neighborhoods grow denser without exact
  *     twins dominating every top-k.
  *
  * Usage:
  *   runMain graft.ScaleBench build <srcSfDir> <dstDir> <factor>
  *   runMain graft.ScaleBench run <smallDir> <bigDir> <factor> [q...]
  */
object ScaleBench {

  /** The headline queries whose growth is proven; the heaviest of the
    * bench battery plus one representative per operator family.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q1_agg", "q3_join_topk",
    "ev_window_time", "ev_window_sliding_time", "ev_window_hybrid",
    "pipeline_e2e_keyed",
    "dedup_minhash_lsh", "dedup_cluster_resolve",
    "emb_ann_lsh", "emb_ann_ivf",
    "text_repetition", "text_contamination",
    "ev_sessionize", "text_ngram_topk", "text_perplexity", "emb_centroid",
    "text_chunk_overlap", "text_tfidf_topk", "text_bm25_topk", "emb_outliers",
    "ev_retention", "ev_funnel", "agg_approx_quantile", "emb_ann_pq", "emb_ann_ivfpq",
    "agg_corr", "sample_quota", "sample_mixture_repeat", "sample_token_budget",
    "text_length_hist", "emb_quantize_int8", "emb_ann_pq_batch", "mm_decode_meta",
    "text_dup_spans", "text_heavy_hitters", "sample_split", "sample_temperature",
    "ev_active_users", "emb_pca_project",
    "dedup_cluster_resolve_dist", "ev_keep_when_str", "dedup_semantic_auto",
    "window_rank", "window_analytics", "pack_sequences",
    "dedup_incremental", "dedup_incremental_minhash", "agg_percentile",
    "ev_interval_join",
    "text_chunk_dedup", "dedup_incremental_chunks", "text_dedup_rewrite",
    "emb_ann_mips_lsh", "join_skew_salted", "window_pct_rank",
    "text_entropy", "q18_topn_agg", "q21_sole_blame",
    "q7_nation_volume", "q9_product_profit",
    "q2_min_cost_supp", "q12_shipmode_prio", "q20_excess_avail",
    "text_dedup_rewrite_spans", "sample_split_leakage_safe",
    "pipeline_curate_e2e", "emb_drift", "emb_ann_filtered",
    "q12_bucketed", "emb_ann_ivf_filtered", "emb_ann_binary", "mm_mkv_meta",
    "retrieval_hybrid_rrf", "emb_ann_binary_incremental",
    "retrieval_hybrid_rrf_ann", "ev_attribution_last_touch",
    "emb_ann_binary_wide", "ev_attribution_linear", "ev_attribution_time_decay",
    "dedup_semantic_seq",
    "text_quality_classifier", "lake_sql_read", "mm_phash_dedup",
    "mm_phash_incremental", "ev_attribution_u_shape", "mm_phash_dedup_wide",
    "lake_time_travel", "lake_change_feed", "mm_phash_dedup_auto")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Force the size-adaptive window cutover (e.g. 0 = always the
    // segmented scale plans) so growth rows can exercise the plan that
    // runs past the cutover even on replicas that sit under it; the
    // segmented == plain equality is spec-pinned, so the forced rows
    // measure the production scale plan's growth honestly.
    sys.env.get("SPARK_GRAFT_WINDOW_SMALL")
      .foreach(v => spark.conf.set("graft.window.smallInputRows", v))
    args.toList match {
      case "build" :: src :: dst :: factor :: Nil =>
        build(spark, src, dst, factor.toInt)
      case "run" :: small :: big :: factor :: rest =>
        run(spark, small, big, factor.toInt,
          if (rest.isEmpty) DefaultQueries else rest)
      case other =>
        System.err.println(s"usage: build <src> <dst> <factor> | run <small> <big> <factor> [q...]; got $other")
        sys.exit(2)
    }
    spark.stop()
  }

  // ---- synthesis ----

  private def maxOf(df: DataFrame, col0: String): Long =
    df.agg(max(col(col0))).head().getLong(0) + 1

  /** Union of `factor` key-shifted replicas. `shifts` maps column name
    * to its per-replica offset stride.
    */
  private def replicate(df: DataFrame, factor: Int, shifts: Map[String, Long],
                        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until factor).map { r =>
      val shifted = shifts.foldLeft(df) { case (d, (c, stride)) =>
        d.withColumn(c, col(c) + lit(stride * r))
      }
      mutate(shifted, r)
    }.reduce(_ unionByName _)

  def build(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] wrote $name x$factor")
    }

    write("region", read("region"))
    write("nation", read("nation"))

    val custOff = maxOf(read("customer"), "c_custkey")
    val suppOff = maxOf(read("supplier"), "s_suppkey")
    val partOff = maxOf(read("part"), "p_partkey")
    val ordOff = maxOf(read("orders"), "o_orderkey")

    write("customer", replicate(read("customer"), factor, Map("c_custkey" -> custOff)))
    write("supplier", replicate(read("supplier"), factor, Map("s_suppkey" -> suppOff)))
    write("part", replicate(read("part"), factor, Map("p_partkey" -> partOff)))
    write("orders", replicate(read("orders"), factor,
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff)))
    write("lineitem", replicate(read("lineitem"), factor,
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff)))

    // events: the driver's physical `ts` encoding varies by round —
    // TIMESTAMP(NANOS) read as long under nanosAsLong, or plain
    // timestamp[us] — so sniff like Tables.events and extend the
    // timeline by span+1h per replica in whichever unit it rides
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val ev = read("events")
    val evOff = maxOf(ev, "event_id")
    val userOff = maxOf(ev, "user_id")
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long files
        val Array(tsMin, tsMax) = ev.agg(min(col("ts")), max(col("ts"))).head()
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val tsSpan = tsMax - tsMin + 3600L * 1000000000L
        write("events", replicate(ev, factor,
          Map("event_id" -> evOff, "user_id" -> userOff, "ts" -> tsSpan)))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ microsecond files
        val Array(usMin, usMax) = ev
          .agg(min(unix_micros(col("ts").cast("timestamp"))),
            max(unix_micros(col("ts").cast("timestamp")))).head()
          .toSeq.map(_.asInstanceOf[Long]).toArray
        val usSpan = usMax - usMin + 3600L * 1000000L
        write("events", replicate(ev, factor,
          Map("event_id" -> evOff, "user_id" -> userOff),
          mutate = (d, r) => d.withColumn("ts",
            timestamp_micros(unix_micros(col("ts").cast("timestamp")) + lit(usSpan * r)))))
    }

    val docs = read("documents")
    val docOff = maxOf(docs, "doc_id")
    write("documents", replicate(docs, factor, Map("doc_id" -> docOff),
      mutate = (d, r) =>
        if (r == 0) d
        else d.withColumn("text",
            concat_ws(" ", transform(split(col("text"), " "),
              w => concat(lit(s"r${r}_"), w))))
          .withColumn("n_chars", length(col("text")))))

    val emb = read("embeddings")
    val vecOff = maxOf(emb, "vec_id")
    write("embeddings", replicate(emb, factor, Map("vec_id" -> vecOff),
      mutate = (d, r) =>
        if (r == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x + (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1000)) - 500) / 25000.0)
              .cast("float")))))
  }

  // ---- measurement ----

  private def median3(run: () => Double): (Double, Double) = {
    val cold = run()
    val warms = Seq.fill(3) { System.gc(); run() }.sorted
    (cold, warms(1))
  }

  def run(spark: SparkSession, small: String, big: String, factor: Int,
          queries: Seq[String]): Unit = {
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = queries.map { q =>
      spark.catalog.clearCache(); System.gc()
      val (_, s) = median3(() => time(q, small))
      spark.catalog.clearCache(); System.gc()
      val (_, b) = median3(() => time(q, big))
      val growth = b / s
      println(f"[scale] $q%-24s small=$s%7.2fs big=$b%7.2fs growth=$growth%5.2fx (data x$factor)")
      (q, s, b, growth)
    }
    val json = rows.map { case (q, s, b, g) =>
      s""""$q":{"small_sec":$s,"big_sec":$b,"growth":$g}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_growth","factor":$factor,"queries":$json,"small":"$small","big":"$big"}""")
  }
}
