package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.BatchCompiler
import graft.sources.Tables
import graft.spec.Spec

/** The whole spec→DAG→DataFrame stack as one oracle-checked query: a
  * YAML pipeline (rename → pattern route → count-windowed jq
  * aggregation through a real `jq` subprocess) replayed over the
  * events table, with the DuckDB oracle reproducing the exact window
  * assignment and aggregation arithmetic.
  */
object PipelineQueries {

  /** The ingest-edge row shape behind the parse-once object barrier
    * (pipeline_e2e_stress): field names match the pipeline input
    * contract, including the arrival-stamp sequence column.
    */
  final case class PipeIn(n: String, d: String, __seq: Long, arrival: Double)

  type Q = (SparkSession, String) => DataFrame

  // pinned to the reference-parity global buffer: this oracle
  // replicates the single global arrival-order window assignment
  val pipelineYaml: String =
    """name: replay
      |window-key: global
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  aggregate:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: '{n: "agg", d: {sum: (map(.d.k) | add), n: length, t0: .[0].t[0].i}}'
      |""".stripMargin

  private def runPipeline(yaml: String)(s: SparkSession, d: String): DataFrame = {
      val ev = Tables.events(s, d)
      val input = ev.select(
        col("event_type").as("n"),
        col("props").as("d"),
        col("event_id").as("__seq"),
        (col("ts_us") / lit(1e6)).as("arrival"))
      val tpl = Spec.parseYaml(yaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(
          col("n"),
          get_json_object(col("d"), "$.sum").cast("double").cast("long").as("sum_k"),
          get_json_object(col("d"), "$.n").cast("double").cast("long").as("n_events"),
          get_json_object(col("d"), "$.t0").cast("double").as("t0"))
        .orderBy("t0")
  }

  /** The keyed-replay variant (`window-key: name`): windows buffer per
    * event name — window assignment shuffles by `n` and runs all keys
    * in parallel instead of serializing through one global sort. The
    * jq output carries the window's name so the oracle can replicate
    * per-key window assignment exactly.
    */
  val keyedYaml: String =
    """name: replay
      |window-key: name
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  aggregate:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: '{n: "agg", d: {sum: (map(.d.k) | add), n: length, t0: .[0].t[0].i, nm: .[0].n}}'
      |""".stripMargin

  /** Same pipeline shape through the compiled jsonnet tier — runs with
    * no stream-jsonnet helper binary (the `function(events)` object
    * construction is in JsonnetCompiler's subset).
    */
  val jsonnetYaml: String =
    """name: replay
      |window-key: global
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  aggregate:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jsonnet: 'function(events) {n: "agg", d: {sum: std.foldl(function(acc, e) acc + e.d.k, events, 0), n: std.length(events), t0: events[0].t[0].i}}'
      |""".stripMargin

  /** The reference's stress-test sieve (examples/stress-test/
    * pipeline.yaml:39-70): three chained wrapped jq filters dropping
    * multiples of 2, 5, 7 — run entirely on the compiled wrapped-jq
    * tier (no subprocess; JqCompilerSpec proves tier equivalence
    * byte-for-byte on this exact filter shape).
    *
    * Cost profile (sf0.1, local[32], warm): Catalyst collapses all
    * three steps into ONE whole-stage pass — parquet scan reading only
    * `props`, one parse-once projection behind the ingest object
    * barrier (see the query body), a single fused filter with the
    * three fmod conditions, project, then the query's own orderBy.
    * ~1.0 s warmed after the r10 parse-once fix (was ~1.4-1.6 s with
    * the parse re-inlined per filter reference).
    */
  val stressYaml: String =
    """name: sieve
      |jq-tier: compiled
      |steps:
      |  two:
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq:
      |        jq-expr: '.[].d | if fmod(.; 2) == 0 then empty else . end'
      |        wrap: "not.multiples.of.two"
      |  five:
      |    after: [two]
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq:
      |        jq-expr: '.[].d | if fmod(.; 5) == 0 then empty else . end'
      |        wrap: "not.multiples.of.five"
      |  seven:
      |    after: [five]
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq:
      |        jq-expr: '.[].d | if fmod(.; 7) == 0 then empty else . end'
      |        wrap: "not.multiples.of.seven"
      |""".stripMargin

  /** The reference's own aggregation story is jq `reduce` over window
    * vectors (reference README.md:624-626 "moving aggregates") — this
    * pipeline runs it end-to-end: a per-event entries pass (`to_entries
    * | map(select(.value != null)) | from_entries`, the filter-object
    * idiom) then a window aggregation whose sum is an explicit
    * `reduce .[] as $x (0; . + $x.d.k)` fold. Same oracle as
    * pipeline_e2e: the entries pass is 1:1 (it edits payloads, never
    * drops events), so window assignment is unchanged, and the reduce
    * fold equals SUM(k) with jq's null-is-identity `+`.
    */
  val reduceYaml: String =
    """name: replay
      |window-key: global
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  strip:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: '.[] | {n: .n, d: (.d | to_entries | map(select(.value != null)) | from_entries), t: .t}'
      |  aggregate:
      |    after: [strip]
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: '{n: "agg", d: {sum: (reduce .[] as $x (0; . + $x.d.k)), n: length, t0: .[0].t[0].i}}'
      |""".stripMargin

  /** Window-vector ORDERING through jq `sort_by` — the reference's
    * "sort the window before emitting" idiom — with the whole payload
    * as the sorted element array. Runs on both tiers: the compiled
    * tier lowers it to ONE aggregate (collect → stable comparator
    * sort by (key, arrival) → to_json), byte-identical to the jq
    * binary's rendering.
    */
  val sortbyYaml: String =
    """name: replay
      |window-key: global
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  aggregate:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: '{n: "agg", d: (sort_by(.n) | map({nm: .n, k: .d.k}))}'
      |""".stripMargin

  private def runSortbyPipeline(yaml: String)(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val input = ev.select(
      col("event_type").as("n"),
      col("props").as("d"),
      col("event_id").as("__seq"),
      (col("ts_us") / lit(1e6)).as("arrival"))
    val tpl = Spec.parseYaml(yaml)
    val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
    val out = BatchCompiler.compile(s, tpl, stamped).output
    // d is the whole sorted-array JSON text; window identity is not in
    // the payload, so the total order is the payload text itself.
    // Canonicalize element-object key order through an explicit struct
    // schema: the subprocess tier's variant re-render sorts object keys
    // (k before nm), the compiled tier emits declaration order — the
    // round-trip pins both to (nm, k), DuckDB's struct_pack order.
    out.select(col("n"),
        to_json(from_json(col("d"),
          org.apache.spark.sql.types.DataType.fromDDL("array<struct<nm:string,k:bigint>>"))).as("d"))
      .orderBy("d")
  }

  val queries: Map[String, Q] = Map(
    // sort_by pipeline through the real jq subprocess...
    "pipeline_e2e_sortby" -> { (s, d) => runSortbyPipeline(sortbyYaml)(s, d) },
    // ...and the compiled one-aggregate lowering — same oracle
    "pipeline_e2e_sortby_compiled" -> { (s, d) =>
      runSortbyPipeline("jq-tier: compiled\n" + sortbyYaml)(s, d)
    },

    // reduce + entries pipeline through the real jq subprocess...
    "pipeline_e2e_reduce" -> { (s, d) => runPipeline(reduceYaml)(s, d) },
    // ...and through the compiled tier — same oracle, both exact
    "pipeline_e2e_reduce_compiled" -> { (s, d) =>
      runPipeline("jq-tier: compiled\n" + reduceYaml)(s, d)
    },

    "pipeline_e2e_stress" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      // Parse props ONCE at the ingest edge, like the reference's
      // NDJSON reader. Without the object barrier the three chained
      // steps' compiled-jq filters re-inline the `d` alias (FilterExec
      // has no subexpression elimination; pushdown re-inlines through
      // projections and explode barriers alike), so the parse ran 3×
      // per row inside the merged filter + 1× in the project —
      // measured 1.43 s vs 1.04 s at sf0.1 with the barrier, whose
      // own cost is one narrow 4-column object round-trip. PlanSpec
      // sweeps every query for this trap.
      val parsed = Tables.fanout(ev).select(
          col("event_type").as("n"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("k BIGINT")
              .asInstanceOf[org.apache.spark.sql.types.StructType])
            .getField("k").cast("string").as("d"),
          col("event_id").as("__seq"),
          (col("ts_us") / lit(1e6)).as("arrival"))
        .as[PipeIn].map(identity).toDF()
      val tpl = Spec.parseYaml(stressYaml)
      val stamped = BatchCompiler.stampInput(tpl, parsed, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(col("n"), col("d").cast("long").as("v")).orderBy("v")
    },

    "pipeline_e2e_jsonnet" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val input = ev.select(
        col("event_type").as("n"),
        col("props").as("d"),
        col("event_id").as("__seq"),
        (col("ts_us") / lit(1e6)).as("arrival"))
      val tpl = Spec.parseYaml(jsonnetYaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(
          col("n"),
          get_json_object(col("d"), "$.sum").cast("double").cast("long").as("sum_k"),
          get_json_object(col("d"), "$.n").cast("double").cast("long").as("n_events"),
          get_json_object(col("d"), "$.t0").cast("double").as("t0"))
        .orderBy("t0")
    },

    // same pipeline through BOTH jq tiers, checked against one truth:
    // the subprocess tier runs real jq; the compiled tier lowers the
    // expression to native aggregates
    "pipeline_e2e_compiled" -> { (s, d) =>
      runPipeline("jq-tier: compiled\n" + pipelineYaml)(s, d)
    },

    // `limit(n; .[] | ...)` through the COMPILED tier — the round-16
    // fallback-inventory widening: the first 3 k>5 matches of every
    // 100-event window, as a keyed row_number over the step's vector
    // ids (never a global sort; JqFuzzSpec pins the compiled semantics
    // against the jq binary on random programs)
    "pipeline_e2e_limit" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val input = ev.select(
        col("event_type").as("n"),
        col("props").as("d"),
        col("event_id").as("__seq"),
        (col("ts_us") / lit(1e6)).as("arrival"))
      val tpl = Spec.parseYaml(limitYaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(
          col("n"),
          get_json_object(col("d"), "$.k").cast("double").cast("long").as("k"),
          get_json_object(col("d"), "$.t0").cast("double").as("t0"))
        .orderBy("t0", "k")
    },

    // the compiled pipeline AGAIN on the VariantType payload tier
    // (SURVEY §1.3): `d` parsed once into a Spark 4 variant column that
    // rides between steps, compiled-jq field access reading the binary
    // encoding instead of re-parsing JSON text per access. Same oracle
    // as pipeline_e2e_compiled — the tier must be output-invisible.
    "pipeline_e2e_variant" -> { (s, d) =>
      runPipeline("payload-tier: variant\njq-tier: compiled\n" + pipelineYaml)(s, d)
    },

    // per-name windows (the scalable replay path), real jq subprocess
    "pipeline_e2e_keyed" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val input = ev.select(
        col("event_type").as("n"),
        col("props").as("d"),
        col("event_id").as("__seq"),
        (col("ts_us") / lit(1e6)).as("arrival"))
      val tpl = Spec.parseYaml(keyedYaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(
          get_json_object(col("d"), "$.nm").as("nm"),
          get_json_object(col("d"), "$.sum").cast("double").cast("long").as("sum_k"),
          get_json_object(col("d"), "$.n").cast("double").cast("long").as("n_events"),
          get_json_object(col("d"), "$.t0").cast("double").as("t0"))
        .orderBy("nm", "t0")
    },

    "pipeline_e2e" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val input = ev.select(
        col("event_type").as("n"),
        col("props").as("d"),
        col("event_id").as("__seq"),
        (col("ts_us") / lit(1e6)).as("arrival"))
      val tpl = Spec.parseYaml(pipelineYaml)
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      val out = BatchCompiler.compile(s, tpl, stamped).output
      out.select(
          col("n"),
          get_json_object(col("d"), "$.sum").cast("double").cast("long").as("sum_k"),
          get_json_object(col("d"), "$.n").cast("double").cast("long").as("n_events"),
          get_json_object(col("d"), "$.t0").cast("double").as("t0"))
        .orderBy("t0")
    }
  )

  /** The limit-form pipeline: a count-windowed per-event jq stream
    * capped at the first 3 matches per window, compiled tier.
    */
  val limitYaml: String =
    """name: replay
      |window-key: global
      |jq-tier: compiled
      |steps:
      |  classify:
      |    flatmap:
      |      rename:
      |        prepend: "app."
      |  pick:
      |    after: [classify]
      |    match/drop:
      |      not: "app.error"
      |    window:
      |      events: 100
      |    reduce:
      |      send-receive-jq: 'limit(3; .[] | select(.d.k > 5) | {n: "pick", d: {k: .d.k, t0: .t[0].i}})'
      |""".stripMargin

  private val e2eOracle =
      """WITH f AS (
        |  SELECT epoch_us(ts)/1000000.0 AS t0v,
        |         TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |         ROW_NUMBER() OVER (ORDER BY epoch_us(ts)/1000000.0, event_id) AS rn
        |  FROM events WHERE event_type <> 'error')
        |SELECT 'agg' AS n, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n_events, MIN(t0v) AS t0
        |FROM f GROUP BY (rn-1)//100 ORDER BY t0""".stripMargin

  private val keyedOracle =
      """WITH f AS (
        |  SELECT event_type AS et, epoch_us(ts)/1000000.0 AS t0v,
        |         TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY epoch_us(ts)/1000000.0, event_id) AS rn
        |  FROM events WHERE event_type <> 'error')
        |SELECT 'app.' || et AS nm, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       COUNT(*) AS n_events, MIN(t0v) AS t0
        |FROM f GROUP BY et, (rn-1)//100 ORDER BY nm, t0""".stripMargin

  // the jsonnet pipeline now carries the std.foldl sum too (compiled
  // as an arrival-ordered left fold), so it shares the plain e2e
  // oracle's exact shape

  private val stressOracle =
      """SELECT 'not.multiples.of.seven' AS n,
        |  TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS v
        |FROM events
        |WHERE TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) IS NOT NULL
        |  AND TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 2 != 0
        |  AND TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 5 != 0
        |  AND TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 7 != 0
        |ORDER BY v""".stripMargin

  // same window assignment as e2eOracle; the element list is ordered
  // (nm, rn) = jq's stable sort_by(.n), rendered by DuckDB's to_json
  // (byte-identical to jq -c and Spark to_json for these shapes)
  private val sortbyOracle =
      """WITH f AS (
        |  SELECT 'app.' || event_type AS nm,
        |         CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |         ROW_NUMBER() OVER (ORDER BY epoch_us(ts)/1000000.0, event_id) AS rn
        |  FROM events WHERE event_type <> 'error')
        |SELECT 'agg' AS n,
        |       CAST(to_json(list(struct_pack(nm := nm, k := k) ORDER BY nm, rn)) AS VARCHAR) AS d
        |FROM f GROUP BY (rn-1)//100 ORDER BY d""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "pipeline_e2e_sortby" -> sortbyOracle,
    "pipeline_e2e_sortby_compiled" -> sortbyOracle,
    "pipeline_e2e_stress" -> stressOracle,
    "pipeline_e2e" -> e2eOracle,
    "pipeline_e2e_compiled" -> e2eOracle,
    "pipeline_e2e_variant" -> e2eOracle,
    "pipeline_e2e_jsonnet" -> e2eOracle,
    "pipeline_e2e_keyed" -> keyedOracle,
    // strip is payload-1:1 and k is never null in the corpus, so the
    // window assignment and sums match the plain e2e oracle exactly
    "pipeline_e2e_reduce" -> e2eOracle,
    "pipeline_e2e_reduce_compiled" -> e2eOracle,
    // window assignment over ALL surviving events (the select runs
    // INSIDE each window's jq program), then the first 3 k>5 matches
    // per window in arrival order
    "pipeline_e2e_limit" ->
      """WITH f AS (
        |  SELECT epoch_us(ts)/1000000.0 AS t0v,
        |         TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |         ROW_NUMBER() OVER (ORDER BY epoch_us(ts)/1000000.0, event_id) AS rn
        |  FROM events WHERE event_type <> 'error'),
        |g AS (SELECT k, t0v, rn, (rn-1)//100 AS w FROM f WHERE k > 5),
        |h AS (SELECT k, t0v, ROW_NUMBER() OVER (PARTITION BY w ORDER BY rn) AS r FROM g)
        |SELECT 'pick' AS n, k, t0v AS t0 FROM h WHERE r <= 3 ORDER BY t0, k""".stripMargin)
}
