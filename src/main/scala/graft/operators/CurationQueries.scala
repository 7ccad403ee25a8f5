package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Training-data curation operators beyond near-dup detection: PII
  * redaction, repetition scoring, benchmark-contamination checks, and
  * stratified downsampling — the filters a large-scale LLM corpus
  * pipeline runs between raw crawl and tokenizer.
  *
  * All are exact-oracle checked (the DuckDB SQL mirrors the same
  * regexes / list algebra / arithmetic literally), and all keep
  * the 100-TB shape:
  *   - redaction, repetition and sampling are pure per-row map work —
  *     native regex/array expressions, zero shuffles, codegen'd;
  *   - contamination joins every candidate n-gram against a benchmark
  *     gram set that is small BY NATURE (benchmarks are thousands of
  *     documents, corpora are billions), so the join side is
  *     broadcast and the only shuffle is the per-doc hit count,
  *     partitioned by doc_id.
  *
  * The synthetic corpus carries no real PII, so the redaction query
  * derives a deterministic PII-bearing variant of each row (same
  * expression in both engines) — the machinery under test is the
  * regex redaction pass itself, which is what a user would run.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  // portable regex subset: identical semantics in Java regex (Spark)
  // and RE2 (DuckDB) — char classes, bounded repeats, no backrefs
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Deterministic PII-bearing text: the document text plus 0-2 extra
    * emails, one phone, one IPv4, all derived from doc_id. Kept as a
    * plain SQL expression string so the DuckDB oracle can interpolate
    * the identical computation.
    */
  private val piiSqlExpr: String =
    "text || ' contact user' || CAST(doc_id AS STRING) || '@mail.example.com ' || " +
      "repeat('u' || CAST(doc_id AS STRING) || '@ex.org ', CAST(doc_id % 3 AS INT)) || " +
      "'tel +1-555-' || lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0') || " +
      "' ip 10.' || CAST(doc_id % 256 AS STRING) || '.' || " +
      "CAST((doc_id * 3) % 256 AS STRING) || '.' || CAST((doc_id * 5) % 256 AS STRING)"

  /** Strata rates (tenths) for the deterministic sampler: keep 5/10 of
    * English, 2/10 of everything else. Interpolated into the oracle.
    */
  private[operators] val EnTenths = 5
  private[operators] val OtherTenths = 2
  /** Knuth's multiplicative-hash constant: spreads doc_id into a
    * pseudorandom-but-portable residue (plain integer arithmetic, so
    * DuckDB computes the identical value — unlike engine hash()).
    * Package-visible so the spec replays the production formula
    * instead of pinning a copy.
    */
  private[operators] val SampleMix = 2654435761L
  /** Prime modulus applied to doc_id BEFORE the multiply so the
    * product stays < 2^52 (max 1000002 × SampleMix ≈ 2.65e15) for any
    * BIGINT doc_id — exact in a double's 53-bit mantissa and far from
    * the 63-bit overflow a bare `doc_id * SampleMix` hits at corpus
    * scale (billions of ids), which DuckDB rejects and Spark silently
    * wraps.
    */
  private[operators] val MixMod = 1000003L
  /** The shared mix residue as SQL, for interpolation into both plans
    * and oracles. ALL consumers — ordering keys and the `% 10` tenths
    * slices — must use this post-modulus residue: SampleMix ≡ 1
    * (mod 10), so taking `% 10` of the raw product would degenerate
    * to doc_id's literal last decimal digit, not a hash.
    */
  private[operators] val mixSql = s"(((doc_id % $MixMod) * $SampleMix) % $MixMod)"

  /** Quota per language stratum for `sample_quota`, and the salt width
    * of its two-level top-K (see the query's comment).
    */
  private[operators] val QuotaK = 20
  private[operators] val QuotaSalt = 64

  /** Exact global sample size for `sample_fixed_n`. */
  private[operators] val FixedN = 100

  /** `sample_split` slot boundaries (of 100): train / validation / rest test. */
  private[operators] val SplitTrainPct = 98
  private[operators] val SplitValPct = 1

  /** Document budget for `sample_temperature`'s expected total draw. */
  private[operators] val TempBudget = 150

  /** Expected draw size for `sample_weighted`'s PPS inclusion probs. */
  private[operators] val WeightedBudget = 200

  /** Per-source mixture weights in tenths for `sample_mixture_repeat`:
    * upsample the first five source shards 3.0x, the next five 1.5x,
    * keep the rest at 1.0x. A shared SQL string so the DuckDB oracle
    * interpolates the identical CASE.
    */
  private[operators] val MixtureW10Expr =
    "CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 30 " +
      "WHEN source IN ('src5','src6','src7','src8','src9') THEN 15 ELSE 10 END"

  /** Context-window token budget for `pack_sequences` (small enough
    * that the ~50-token synthetic docs produce multi-doc packs).
    */
  private val PackBudget = 256

  /** Per-source token budget for `sample_token_budget` (the ~25
    * 50-token docs per synthetic source hold ~1250 tokens, so a 600
    * budget keeps roughly half of each shard).
    */
  private[operators] val TokenBudget = 600

  /** Output-shard count for `pack_shard_balance`. */
  private[operators] val NShards = 16

  /** Chunking geometry for `text_chunk_overlap`: 64-token windows
    * every 48 tokens (16-token overlap) — small enough that the
    * ~50-token synthetic docs produce 2-chunk splits.
    */
  private val ChunkLen = 64
  private val ChunkStride = 48

  val queries: Map[String, Q] = Map(

    // Data profiling (the ANALYZE-TABLE face of pipeline health
    // checks): per-column row/null/exact-distinct counts and binary
    // min/max, computed in ONE scan — the five distinct aggregates
    // share a single Expand (5× rows into one exchange), which beats
    // the naive five-scans-one-per-column plan at any corpus size.
    // min/max cast to string so all columns stack into one typed
    // result; string comparison is byte order in both engines.
    "profile_columns" -> { (s, d) =>
      val profiled = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ profiled.flatMap { c =>
        Seq(count(col(c)).as(s"${c}_nn"),
          countDistinct(col(c)).as(s"${c}_nd"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"))
      }
      val one = docs(s, d).agg(aggs.head, aggs.tail: _*)
      val stackArgs = profiled.map(c =>
        s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max").mkString(", ")
      one.select(col("n_rows"), expr(s"stack(${profiled.size}, $stackArgs) " +
          "as (column_name, n_nonnull, n_distinct, min_s, max_s)"))
        .select(col("column_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
        .orderBy("column_name")
    },

    // PII redaction: count then mask emails, phone numbers and IPv4
    // addresses. Pure per-row regex work — at 100 TB this is a single
    // codegen'd scan, no shuffle but the final presentation sort.
    "text_redact_pii" -> { (s, d) =>
      graft.sources.Tables.fanout(docs(s, d))
        .withColumn("pii", expr(piiSqlExpr))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("pii"), lit(EmailRe), lit(0))).as("n_email"),
          size(regexp_extract_all(col("pii"), lit(PhoneRe), lit(0))).as("n_phone"),
          size(regexp_extract_all(col("pii"), lit(Ipv4Re), lit(0))).as("n_ip"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("pii"), EmailRe, "<EMAIL>"),
              PhoneRe, "<PHONE>"),
            Ipv4Re, "<IP>").as("redacted"))
        .orderBy("doc_id")
    },

    // Repetition scoring (the Gopher-style quality signals): duplicate
    // word fraction, most-frequent-word fraction, duplicate word-2gram
    // fraction. Shaped as explode → (doc, term) count → per-doc
    // aggregate: two map-side-partial hash aggregates partitioned by
    // doc_id. The array-algebra alternative (array_distinct + a
    // filter-in-transform mode count) is interpreted O(tokens²) per
    // row — fine on 50-token rows, hopeless on a real 100k-token
    // document — so the aggregate shape is the 100-TB one.
    "text_repetition" -> { (s, d) =>
      val base = docs(s, d)
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"))
      val words = base.select(col("doc_id"), explode(col("toks")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n"), count(lit(1)).as("ndist"), max("c").as("topcnt"))
      val grams = base.select(col("doc_id"), explode(shingles(col("toks"), 2)).as("g2"))
        .groupBy("doc_id", "g2").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(sum("c").as("n2"), count(lit(1)).as("ndist2"))
      words.join(grams, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("n").as("n_tokens"),
          (lit(1.0) - col("ndist").cast("double") / col("n")).as("dup_word_frac"),
          (col("topcnt").cast("double") / col("n")).as("top_word_frac"),
          when(col("n2").isNotNull,
            lit(1.0) - col("ndist2").cast("double") / col("n2"))
            .otherwise(lit(0.0)).as("dup_2gram_frac"))
        .orderBy("doc_id")
    },

    // Benchmark contamination: distinct word-3gram overlap of every
    // candidate document against a benchmark set (source src0, first
    // 200 ids — the held-out-eval stand-in). The benchmark gram set is
    // small by nature, so it broadcasts; candidates never pairwise
    // join, they probe the broadcast set and aggregate per doc_id.
    //
    // Per-doc gram dedup is explode + DISTINCT (map-side partial
    // aggregate, shuffle carries only unique (doc_id, gram) pairs) —
    // NOT array_distinct: that is an interpreted O(n²)-per-row
    // collection op, measured at ~1.3 ms/row on 50-gram docs (6.5 s
    // for 5000 docs, recomputed per consumer branch → a 35 s query;
    // this shape runs in ~2 s and scales as a plain hash aggregate).
    // ONE pass over the candidate grams: a LEFT join against the
    // broadcast benchmark set (distinct grams + a marker) scores every
    // candidate gram, and a single per-doc aggregate counts totals and
    // hits together — count(*) vs count(marker). The former
    // totals/hits branch pair recomputed the candidate explode+distinct
    // per consumer (measured: SIX parquet scans and three gram
    // exchanges in the executed plan — filter pushdown specializes
    // each branch below the distinct, so exchange reuse never fires);
    // this shape scans the corpus twice (bench subset + candidates)
    // and shuffles the candidate grams once.
    "text_contamination" -> { (s, d) =>
      def grams(df: DataFrame) = graft.sources.Tables.fanout(df)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("gram"))
        .distinct()
      val base = docs(s, d)
      val bench = grams(base.filter(col("source") === "src0" && col("doc_id") < 200))
        .select("gram").distinct()
        .withColumn("__hit", lit(1))
      grams(base.filter(col("doc_id") >= 200))
        .join(broadcast(bench), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_grams")).as("contamination"))
        .orderBy("doc_id")
    },

    // Deterministic train/validation/test split (the reproducibility
    // contract every dataset release needs: membership decided by a
    // portable hash of the doc id alone, so re-running on grown or
    // re-partitioned data never moves an old doc between splits).
    // 98/1/1 by hash slot; pure narrow map work.
    "sample_split" -> { (s, d) =>
      docs(s, d)
        .withColumn("slot", expr(s"$mixSql % 100"))
        .withColumn("split",
          when(col("slot") < SplitTrainPct, lit("train"))
            .when(col("slot") < SplitTrainPct + SplitValPct, lit("validation"))
            .otherwise(lit("test")))
        .select("doc_id", "lang", "source", "split")
        .orderBy("doc_id")
    },

    // Temperature-balanced language sampling (the multilingual
    // standard: sample language l with probability ∝ n_l^(1/T),
    // flattening the head so low-resource languages survive — here
    // T=2, i.e. sqrt scaling). Per-language acceptance thresholds are
    // computed in FIXED-POINT after the one transcendental-free step:
    // sqrt is IEEE correctly-rounded (bit-identical in both engines),
    // floor(·*1e6) quantizes it, and everything after is BIGINT
    // arithmetic — threshold t_l = Budget·1e6·s_l / Σs / n_l with
    // integer division in a fixed order, so the oracle is hash-exact,
    // no RNG, no pow() ulp risk. Acceptance is the same portable
    // hash-residue filter as the stratified sampler; thresholds ride
    // a broadcast join (languages-sized). t_l ≥ 1e6 means accept-all,
    // so min(1, rate) is implicit. BIGINT headroom: the product
    // Budget·1e6·s_l with s_l = floor(√n_l·1e5) stays below 2^63 for
    // n_l ≲ 3.8e11 per language (~15× a 100-TB corpus if it were ALL
    // one language) — the 1e5 fixed point deliberately gives up one
    // quantization decade to buy that bound, because Spark (non-ANSI)
    // would wrap silently on overflow while DuckDB errors, and the
    // two engines must never diverge.
    "sample_temperature" -> { (s, d) =>
      val counts = docs(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("sfp", floor(sqrt(col("n").cast("double")) * 1e5).cast("long"))
      val tot = counts.agg(sum("sfp").as("stot"))
      docs(s, d)
        .join(broadcast(counts), "lang")
        .crossJoin(broadcast(tot))
        .withColumn("t", expr(s"$TempBudget * 1000000 * sfp div stot div n"))
        .filter(expr(s"$mixSql % 1000000") < col("t"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Probability-proportional-to-size (Poisson/PPS) sampling: each
    // document's inclusion probability is min(1, B·x_i/Σx) — the
    // importance-sampling standard for token-budgeted corpus draws
    // (long documents carry more tokens, so equal-probability draws
    // under-weight them). All arithmetic after the one broadcast total
    // is BIGINT fixed-point in a fixed order (B·1e6·x_i div Σx) and
    // acceptance is the shared portable hash residue — deterministic,
    // re-runnable, hash-exact in both engines. BIGINT headroom:
    // B·1e6·x_i needs x_i ≲ 4.6e7 chars per doc at B=200 — two
    // decades above real web documents. The 100-TB shape: one
    // broadcast scalar, then a pure narrow filter.
    "sample_weighted" -> { (s, d) =>
      val tot = docs(s, d).agg(sum("n_chars").as("ctot"))
      docs(s, d)
        .crossJoin(broadcast(tot))
        .withColumn("t", least(lit(1000000L),
          expr(s"$WeightedBudget * 1000000 * n_chars div ctot")))
        .filter(expr(s"$mixSql % 1000000") < col("t"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // Stratified downsampling: per-language keep rates decided by a
    // portable multiplicative hash of doc_id — deterministic,
    // re-runnable, and a pure narrow filter (the 100-TB shape: no
    // shuffle, no sort but presentation; sampling decisions are local).
    "sample_stratified" -> { (s, d) =>
      docs(s, d)
        .withColumn("h", expr(s"$mixSql % 10"))
        .filter(col("h") <
          when(col("lang") === "en", lit(EnTenths)).otherwise(lit(OtherTenths)))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Exact quota sampling: exactly K documents per language stratum,
    // chosen by portable-hash order (deterministic, re-runnable, no
    // engine-specific RNG). Shape: two-level exact top-K — local top-K
    // inside `QuotaSalt` hash buckets first, then top-K of the
    // ≤ Salt×K survivors per stratum — so no single task ever sorts a
    // whole stratum (a bare per-language window would put all of `en`,
    // i.e. ~40% of a 100-TB corpus, on one reducer). The salt is
    // plan-internal: the final rank re-sorts, so the output equals the
    // single-window semantics the oracle runs.
    "sample_quota" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val mixed = docs(s, d)
        .select(col("doc_id"), col("lang"), expr(mixSql).as("mix"))
      val byBucket = Window
        .partitionBy(col("lang"), pmod(xxhash64(col("doc_id")), lit(QuotaSalt)))
        .orderBy(col("mix"), col("doc_id"))
      val byLang = Window.partitionBy("lang").orderBy(col("mix"), col("doc_id"))
      mixed
        .withColumn("rb", row_number().over(byBucket)).filter(col("rb") <= QuotaK)
        .withColumn("rnk", row_number().over(byLang)).filter(col("rnk") <= QuotaK)
        .select("lang", "rnk", "doc_id")
        .orderBy("lang", "rnk")
    },

    // Exact-N global sample: the FixedN documents with the smallest
    // portable-hash rank — the deterministic, re-runnable stand-in for
    // "give me exactly N random docs" (reservoir sampling without the
    // sequential reservoir). Shape: orderBy+limit plans as
    // TakeOrderedAndProject — per-partition N-row heaps merged on the
    // driver, never a global sort; at 100 TB the driver sees
    // partitions × N ids, nothing row-scaled.
    "sample_fixed_n" -> { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("lang"), expr(mixSql).as("mix"))
        .orderBy(col("mix"), col("doc_id")).limit(FixedN)
        .select("doc_id", "lang", "mix")
        .orderBy("doc_id")
    },

    // Mixture repetition planning (epoch-level source reweighting, the
    // Dolma/RedPajama-style "see shard X 3.0 times per epoch"): the
    // integer part of each source's weight repeats every document, the
    // fractional tenth repeats a deterministic hash-slice of them.
    // Pure per-row generate — the fan-out IS the requested output
    // size; no shuffle, no state, trivially 100-TB-shaped.
    "sample_mixture_repeat" -> { (s, d) =>
      docs(s, d)
        .withColumn("w10", expr(MixtureW10Expr))
        .withColumn("repeats",
          (expr("w10 div 10") +
            when(expr(s"$mixSql % 10") < col("w10") % 10, lit(1))
              .otherwise(lit(0))).cast("int"))
        // repeats >= 1 pre-filter matches the oracle's range(1, n+1)
        // = empty semantics: Spark's step-less sequence(1, 0) would
        // yield a DESCENDING [1, 0] and silently emit 2 copies for a
        // doc meant to get none (unreachable while the min tier is
        // 10 tenths, but a sub-1.0x weight would trip it); the
        // explicit step makes any future 0-repeat row fail loudly
        // instead of fanning out backwards
        .filter(col("repeats") >= 1)
        .select(col("doc_id"), col("source"), col("repeats").as("n_copies"),
          explode(sequence(lit(1), col("repeats"), lit(1))).as("copy"))
        .orderBy("doc_id", "copy")
    },

    // Overlapping token-window chunking (the RAG / long-doc splitter:
    // fixed windows every `stride` tokens so no boundary sentence is
    // lost): chunk starts come from `sequence(0, len-1, stride)`,
    // members from a bounded `slice` — pure per-row generate + map
    // work, no shuffle but the presentation sort, and the ≤ len/stride
    // fan-out is the output's own size (the 100-TB shape: chunking is
    // a map-side re-batching, never a join).
    "text_chunk_overlap" -> { (s, d) =>
      docs(s, d)
        .withColumn("toks", tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride))).as("start_tok"))
        .withColumn("chunk_toks", slice(col("toks"), col("start_tok") + 1, lit(ChunkLen)))
        .select(col("doc_id"),
          expr(s"start_tok div $ChunkStride").as("chunk_id"),
          col("start_tok"),
          size(col("chunk_toks")).as("n_chunk_toks"),
          concat_ws(" ", col("chunk_toks")).as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },

    // Per-language document-length histogram (the corpus-profile QC
    // pass run before and after every filter stage): power-of-two
    // length buckets via the INTEGER binary-magnitude trick
    // `length(bin(n_chars))` — both engines print the same binary
    // string, so bucketing never touches a float log2 (whose libm
    // rounding differs across engines exactly at the bucket edges).
    // One map-side-partial hash aggregate; codebook-sized output.
    "text_length_hist" -> { (s, d) =>
      docs(s, d)
        .groupBy(col("lang"), expr("length(bin(n_chars))").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
          sum("n_chars").as("sum_chars"))
        .orderBy("lang", "bucket")
    },

    // Token-budget sampling (the "draw N tokens from this corpus"
    // primitive a training run starts from): documents enter in
    // deterministic hash order per source shard and accumulate until
    // the shard's token budget is met; a document is kept if it
    // STARTS under budget (so the draw overshoots by < 1 doc, never
    // undershoots). Same per-shard running-sum window as
    // pack_sequences — one exchange on source, shards fill in
    // parallel, no driver state.
    // `source` has a handful of distinct values at ANY corpus size, so
    // the running sum rides ParallelRank.withRunningSum above the size
    // cutover: per-(source, mix-bucket) local prefix sums + a
    // broadcast bucket-offset table, instead of one task per source
    // shard. Below the cutover it is the plain single-window plan.
    "sample_token_budget" -> { (s, d) =>
      ParallelRank.withRunningSum(
          docs(s, d)
            .withColumn("n_toks", size(tokens(col("text"))))
            .withColumn("mix", expr(mixSql)),
          Seq(col("source")), Seq(col("mix"), col("doc_id")),
          col("n_toks"), "cum")
        .filter(col("cum") - col("n_toks") < lit(TokenBudget))
        .select("doc_id", "source", "n_toks", "cum")
        .orderBy("doc_id")
    },

    // Sequence packing (concat-then-chunk, the standard pre-training
    // layout): documents concatenate in doc_id order WITHIN EACH
    // source shard and chunk at a fixed token budget; a doc's pack is
    // the chunk holding its first token. Packing is a running sum per
    // source partition — at 100 TB you pack per shard in parallel,
    // which is exactly this window's partitioning; no global sort,
    // no driver state.
    // Same prefix-sum scale shape as sample_token_budget: per-source
    // packing is a running sum, and above the size cutover it runs
    // segmented per (source, doc_id-bucket) with broadcast offsets so
    // a 10-TB shard packs on the whole cluster, not one task.
    "pack_sequences" -> { (s, d) =>
      ParallelRank.withRunningSum(
          docs(s, d).withColumn("n_toks", size(tokens(col("text")))),
          Seq(col("source")), Seq(col("doc_id")),
          col("n_toks"), "cum")
        .select(
          col("doc_id"), col("source"), col("n_toks"),
          (col("cum") - col("n_toks")).as("tok_offset"),
          floor((col("cum") - col("n_toks")) / lit(PackBudget)).as("pack_id"))
        .orderBy("doc_id")
    },

    // Token-balanced output sharding (the "write N equal training
    // shards" layout step): documents ranked heaviest-first by token
    // count, dealt to NShards shards in SNAKE order (longest-
    // processing-time-first round-robin with alternating direction —
    // the classic deterministic balancer: each N-row wave adds one
    // doc per shard, and reversing direction every wave cancels the
    // within-wave bias). The global heaviest-first rank rides
    // ParallelRank.withRowNumber — at corpus scale the rank is
    // assembled from per-bucket local ranks + broadcast offsets, no
    // single-task global sort; the shard assignment itself is pure
    // integral per-row arithmetic (`div`, the repo's NTILE-boundary
    // convention) and the output is NShards aggregate rows.
    "pack_shard_balance" -> { (s, d) =>
      val ranked = ParallelRank.withRowNumber(
        docs(s, d)
          .withColumn("n_toks", size(tokens(col("text"))).cast("long"))
          .withColumn("negt", -col("n_toks")),
        Seq.empty, Seq(col("negt"), col("doc_id")), "rn")
      ranked
        .withColumn("shard_id",
          when(expr(s"(rn - 1) div $NShards") % 2 === 0,
            expr(s"(rn - 1) % $NShards"))
          .otherwise(lit(NShards - 1) - expr(s"(rn - 1) % $NShards")))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"),
          max("n_toks").as("max_toks"), min("doc_id").as("first_doc"))
        .orderBy("shard_id")
    }
  )

  // ---- generated DuckDB oracles (same regexes, same arithmetic) ----

  private val toksSql =
    """list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"""

  private def shinglesSql(n: Int) = {
    val parts = (1 to n).map(j => s"toks[i+$j]").mkString(", ")
    s"CASE WHEN len(toks) >= $n THEN list_transform(range(0, len(toks)-${n - 1}), i -> concat_ws(' ', $parts)) ELSE [] END"
  }

  val oracleSql: Map[String, String] = Map(
    "profile_columns" -> {
      val per = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_s,
           |  CAST(MAX($c) AS VARCHAR) AS max_s FROM documents""".stripMargin
      }
      per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY column_name")
    },

    "text_redact_pii" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(pii, '$EmailRe')) AS n_email,
         |  len(regexp_extract_all(pii, '$PhoneRe')) AS n_phone,
         |  len(regexp_extract_all(pii, '$Ipv4Re')) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(pii,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g'),
         |    '$Ipv4Re', '<IP>', 'g') AS redacted
         |FROM (SELECT doc_id, $piiSqlExpr AS pii FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""SELECT doc_id, len(toks) AS n_tokens,
         |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_word_frac,
         |  CAST(list_max(list_transform(list_distinct(toks),
         |    u -> len(list_filter(toks, t -> t = u)))) AS DOUBLE) / len(toks) AS top_word_frac,
         |  CASE WHEN len(sh2) > 0
         |    THEN 1.0 - CAST(len(list_distinct(sh2)) AS DOUBLE) / len(sh2)
         |    ELSE 0.0 END AS dup_2gram_frac
         |FROM (SELECT doc_id, toks, ${shinglesSql(2)} AS sh2
         |      FROM (SELECT doc_id, $toksSql AS toks FROM documents)
         |      WHERE len(toks) > 0)
         |ORDER BY doc_id""".stripMargin,

    "text_contamination" ->
      s"""WITH based AS (
         |  SELECT doc_id, source, list_distinct(g) AS g FROM (
         |    SELECT doc_id, source, ${shinglesSql(3)} AS g
         |    FROM (SELECT doc_id, source, $toksSql AS toks FROM documents))
         |  WHERE len(g) > 0),
         |bench AS (
         |  SELECT DISTINCT unnest(g) AS gram FROM based
         |  WHERE source = 'src0' AND doc_id < 200),
         |cand AS (SELECT doc_id, g FROM based WHERE doc_id >= 200),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS n_hit
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM cand)
         |  JOIN bench USING (gram) GROUP BY doc_id)
         |SELECT c.doc_id, len(c.g) AS n_grams,
         |  COALESCE(h.n_hit, 0) AS n_hit,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(c.g) AS contamination
         |FROM cand c LEFT JOIN hits h ON c.doc_id = h.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "sample_split" ->
      s"""SELECT doc_id, lang, source,
         |  CASE WHEN $mixSql % 100 < $SplitTrainPct THEN 'train'
         |       WHEN $mixSql % 100 < ${SplitTrainPct + SplitValPct} THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // SUM over BIGINT is HUGEINT in DuckDB -> cast back; integer
    // division order mirrors the Spark expression exactly
    "sample_temperature" ->
      s"""WITH counts AS (
         |  SELECT lang, COUNT(*) AS n,
         |    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE)) * 100000) AS BIGINT) AS sfp
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(SUM(sfp) AS BIGINT) AS stot FROM counts)
         |SELECT doc_id, lang FROM documents
         |JOIN counts USING (lang) CROSS JOIN tot
         |WHERE $mixSql % 1000000 < $TempBudget * 1000000 * sfp // stot // n
         |ORDER BY doc_id""".stripMargin,

    "sample_weighted" ->
      s"""WITH tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS ctot FROM documents)
         |SELECT doc_id, lang, n_chars FROM documents CROSS JOIN tot
         |WHERE $mixSql % 1000000 <
         |  least(1000000, $WeightedBudget * 1000000 * n_chars // ctot)
         |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $mixSql % 10 <
         |  CASE WHEN lang = 'en' THEN $EnTenths ELSE $OtherTenths END
         |ORDER BY doc_id""".stripMargin,

    "sample_fixed_n" ->
      s"""SELECT doc_id, lang, mix FROM (
         |  SELECT doc_id, lang, $mixSql AS mix FROM documents
         |  ORDER BY mix, doc_id LIMIT $FixedN)
         |ORDER BY doc_id""".stripMargin,

    "sample_quota" ->
      s"""SELECT lang, rnk, doc_id FROM (
         |  SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY $mixSql, doc_id) AS rnk
         |  FROM documents)
         |WHERE rnk <= $QuotaK ORDER BY lang, rnk""".stripMargin,

    "sample_mixture_repeat" ->
      s"""SELECT doc_id, source, CAST(repeats AS INT) AS n_copies,
         |  CAST(unnest(range(1, repeats + 1)) AS INT) AS copy
         |FROM (
         |  SELECT doc_id, source,
         |    w10 // 10 + CASE WHEN $mixSql % 10 < w10 % 10
         |      THEN 1 ELSE 0 END AS repeats
         |  FROM (SELECT doc_id, source, $MixtureW10Expr AS w10 FROM documents))
         |ORDER BY doc_id, copy""".stripMargin,

    "text_chunk_overlap" ->
      s"""SELECT doc_id, st // $ChunkStride AS chunk_id, st AS start_tok,
         |  len(list_slice(toks, st + 1, st + $ChunkLen)) AS n_chunk_toks,
         |  array_to_string(list_slice(toks, st + 1, st + $ChunkLen), ' ') AS chunk_text
         |FROM (
         |  SELECT doc_id, toks, unnest(range(0, len(toks), $ChunkStride)) AS st
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
         |  WHERE len(toks) > 0)
         |ORDER BY doc_id, chunk_id""".stripMargin,

    "text_length_hist" ->
      """SELECT lang, CAST(length(bin(n_chars)) AS INT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "sample_token_budget" ->
      s"""SELECT doc_id, source, n_toks, cum FROM (
         |  SELECT doc_id, source, n_toks,
         |    CAST(SUM(n_toks) OVER (PARTITION BY source
         |      ORDER BY $mixSql, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM (SELECT doc_id, source, len($toksSql) AS n_toks FROM documents))
         |WHERE cum - n_toks < $TokenBudget
         |ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      s"""SELECT doc_id, source, n_toks,
         |  cum - n_toks AS tok_offset,
         |  CAST(floor((cum - n_toks) / $PackBudget.0) AS BIGINT) AS pack_id
         |FROM (
         |  SELECT doc_id, source, n_toks,
         |    CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM (SELECT doc_id, source, len($toksSql) AS n_toks FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "pack_shard_balance" ->
      s"""WITH ranked AS (
         |  SELECT doc_id, n_toks,
         |    ROW_NUMBER() OVER (ORDER BY -n_toks, doc_id) AS rn
         |  FROM (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks
         |        FROM documents))
         |SELECT shard_id, COUNT(*) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
         |  MAX(n_toks) AS max_toks, MIN(doc_id) AS first_doc
         |FROM (
         |  SELECT doc_id, n_toks,
         |    CASE WHEN ((rn - 1) // $NShards) % 2 = 0 THEN (rn - 1) % $NShards
         |         ELSE ${NShards - 1} - (rn - 1) % $NShards END AS shard_id
         |  FROM ranked)
         |GROUP BY shard_id ORDER BY shard_id""".stripMargin
  )
}
