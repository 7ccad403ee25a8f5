package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Pattern, Signatures}
import graft.functions.{EventFunctions, JsonSchemaFilter}
import graft.sources.Tables

/** The reference's event-pipeline operators (SURVEY.md §2.2-2.4)
  * exercised end-to-end over the `events` table: routing, rename,
  * keep/dedup/keep-when, reduce/flatmap windows, union fan-in, trace
  * stamping, and the compiled jq-expression tier.
  *
  * The events table maps onto the Event model as n = "app." ++
  * event_type, d = props (JSON string), event time = ts (see
  * FIXTURES.md §6). Money-style sums go through exact DECIMAL (see
  * RelationalQueries for the oracle-parity conventions).
  */
object EventQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("n", concat(lit("app."), col("event_type")))

  private val decVal = col("value").cast("decimal(18,2)")

  /** Sessionized events: one row per (user, session) with bounds and
    * exact value sums — 30-min idle gap. One shuffle on user_id, two
    * ordered window passes (boundary flag via lag, session id via
    * running sum), one hash aggregate. Shared by `ev_sessionize` and
    * the interval join.
    */
  private def sessionTable(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        sum(decVal).cast("double").as("sum_value"))
  }

  /** Distinct (event_type, hour-bucket) rows — shared by the two gap
    * queries (and mirrored by both oracles' `// 3600000000`), so the
    * bucketing can never drift between the summary and the row list.
    */
  private def presHours(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(col("event_type"), expr("ts_us div 3600000000").as("h"))
      .distinct()

  val queries: Map[String, Q] = Map(

    // §2.2 match/drop: composite pattern filter, pure RLIKE + boolean algebra.
    "ev_route_drop" -> { (s, d) =>
      StepOps.matchDrop(ev(s, d),
          Pattern.And(Seq(Pattern.Str("app.#"), Pattern.Not(Pattern.Str("#.error")))))
        .groupBy("n").agg(count(lit(1)).as("cnt"))
        .orderBy("n")
    },

    // §2.2 match/pass: matched branch is transformed, unmatched passes through.
    "ev_route_pass" -> { (s, d) =>
      StepOps.matchPass(ev(s, d), Pattern.Str("app.error")) { matched =>
        StepOps.renameReplace(matched, "app.alert")
      }.groupBy("n").agg(count(lit(1)).as("cnt")).orderBy("n")
    },

    // §2.4#1 rename with affixes.
    "ev_rename_affix" -> { (s, d) =>
      StepOps.renameAffix(ev(s, d), Some("in."), Some(".out"))
        .select("n").distinct().orderBy("n")
    },

    // §2.4#3 keep first-N per vector (vector = event_type × day).
    "ev_keep_first" -> { (s, d) =>
      val df = StepOps.tumblingTimeVectors(ev(s, d), col("ts_us"), 86400.0)
      StepOps.keepFirst(df, Seq(col("event_type"), col("vec_id")),
          Seq(col("ts_us"), col("event_id")), 5)
        .select("event_id", "event_type", "vec_id")
        .orderBy("event_id")
    },

    // §2.4#3 keep last-N per vector (vector = whole user partition).
    "ev_keep_last" -> { (s, d) =>
      StepOps.keepLast(ev(s, d), Seq(col("user_id")),
          Seq(col("ts_us"), col("event_id")), 2)
        .select("event_id", "user_id").orderBy("event_id")
    },

    // §2.4#2 deduplicate within vector, identity = data (payload JSON).
    // The identity key rides the exchange as xxhash64(props), not the
    // raw multi-KB payload — at 100 TB the shuffle sorts 8-byte hashes
    // instead of JSON strings (collision odds at 2^-64 per vector are
    // below any practical dataset size). Projection happens BEFORE the
    // window so only the 5 needed columns ride the exchange.
    "ev_dedup_data" -> { (s, d) =>
      val df = StepOps.tumblingTimeVectors(ev(s, d), col("ts_us"), 86400.0)
        .select(col("event_type"), col("vec_id"),
          xxhash64(col("props")).as("props_h"), col("ts_us"), col("event_id"))
      StepOps.dedupWithin(df, Seq(col("event_type"), col("vec_id")),
          Seq(col("props_h")), Seq(col("ts_us"), col("event_id")))
        .select("event_id").orderBy("event_id")
    },

    // §2.4#4 keep-when: JSON-Schema payload filter compiled to native columns.
    // The schema exercises numeric ranges plus multipleOf, a
    // deliberately-overlapping oneOf (k in [25,30] matches both arms →
    // rejected), and routes the k constraint through a local $ref
    // ($defs, draft-07 replace-siblings semantics) — resolution happens
    // at plan build, so the compiled predicate is identical to the
    // inlined schema and the oracle is unchanged.
    "ev_keep_when" -> { (s, d) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val schema = mapper.readTree(
        """{"type":"object","required":["k"],
           "$defs":{"kc":{"type":"integer","minimum":10,"exclusiveMaximum":50,"multipleOf":3}},
           "properties":{"k":{"$ref":"#/$defs/kc"}},
           "oneOf":[{"properties":{"k":{"maximum":30}}},
                    {"properties":{"k":{"minimum":25}}}]}""")
      ev(s, d).filter(JsonSchemaFilter.compile(schema, col("props")))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .orderBy("event_id")
    },

    // §2.4#4 keep-when over a payload with string + array members,
    // validated DIRECTLY from the typed struct (the zero-parse kernel
    // path — no to_json, no re-parse; `ev_keep_when` above covers the
    // string-parse path). Payload synthesis goes through the
    // KeepWhenPayload kernel — ONE jackson probe of props per row —
    // because the Column formulation can't express "parse once":
    // FilterExec does no subexpression elimination and pushdown
    // re-inlines projected aliases, so k's four payload references
    // each inlined their own from_json/get_json_object parse
    // (measured 5 parse copies in the physical plan; 2.4 s → ~1 s
    // at sf0.1). The survivors' output k re-extracts from the
    // payload — evaluated post-filter on ~9% of rows.
    // pattern / minLength / maxLength (code-point counts) on `ty`,
    // multipleOf on `k`, and the draft-07 applicators — items /
    // minItems / maxItems / uniqueItems / contains on `arr`,
    // patternProperties (member-name regex), if/then/else conditioned
    // on the `ty` prefix. Every keyword mirrors as a scalar predicate
    // in the oracle, so the whole subset stays hash-gated.
    "ev_keep_when_str" -> { (s, d) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val schema = mapper.readTree(
        """{"type":"object","required":["ty","k","arr"],
           "properties":{
             "ty":{"type":"string","pattern":"^(cl|si|pu)","minLength":5,"maxLength":8},
             "k":{"type":"integer","multipleOf":2},
             "arr":{"type":"array","items":{"type":"integer","minimum":0},
                    "minItems":3,"maxItems":3,"uniqueItems":true,
                    "contains":{"const":2}}},
           "patternProperties":{"^k":{"exclusiveMinimum":0}},
           "if":{"required":["ty"],"properties":{"ty":{"pattern":"^cl"}}},
           "then":{"properties":{"k":{"minimum":10}}},
           "else":{"properties":{"k":{"maximum":90}}}}""")
      ev(s, d)
        .withColumn("payload",
          JsonSchemaFilter.keepWhenPayload(col("event_type"), col("props")))
        .filter(JsonSchemaFilter.compileStruct(schema, col("payload")))
        .select(col("event_id"), col("event_type").as("ty"),
          col("payload").getField("k").as("k"))
        .orderBy("event_id")
    },

    // §2.3 reduce-mode time windows (aligned tumbling, 6h buckets).
    "ev_window_time" -> { (s, d) =>
      StepOps.tumblingTimeVectors(ev(s, d), col("ts_us"), 6 * 3600.0)
        .groupBy("event_type", "vec_id")
        .agg(count(lit(1)).as("cnt"),
          sum(decVal).cast("double").as("sum_value"),
          min("event_id").as("first_id"))
        .orderBy("event_type", "vec_id")
    },

    // §2.3 reduce-mode count windows (disjoint groups of 50 per name).
    "ev_window_count" -> { (s, d) =>
      StepOps.reduceCountVectors(ev(s, d), Seq(col("event_type")),
          Seq(col("ts_us"), col("event_id")), 50)
        .groupBy("event_type", "vec_id")
        .agg(count(lit(1)).as("cnt"),
          sum(decVal).cast("double").as("sum_value"),
          min("event_id").as("first_id"), max("event_id").as("last_id"))
        .orderBy("event_type", "vec_id")
    },

    // §2.3 flatmap-mode sliding per-event windows of size 3, via the
    // rank-bucketed frame (plain partitionBy(event_type) frames cap at
    // 5-task parallelism — 25x wall at 100x data).
    "ev_window_sliding" -> { (s, d) =>
      StepOps.withSlidingFrameAggs(
          ev(s, d).select("event_type", "ts_us", "event_id", "value"),
          Seq(col("event_type")), Seq(col("ts_us"), col("event_id")), 3) { (df, w) =>
        df.withColumn("frame_n", count(lit(1)).over(w))
          .withColumn("frame_sum", sum(decVal).over(w).cast("double"))
      }
        .select("event_id", "frame_n", "frame_sum")
        .orderBy("event_id")
    },

    // §2.3 flatmap-mode sliding windows with BOTH arms: a buffer
    // closes at 50 events or 1h after its head, whichever first
    // (reference src/step.ts:84-131). Project to the 4 needed columns
    // BEFORE the window so the multi-KB props payload doesn't ride the
    // exchange or the 50x per-event duplication.
    "ev_window_sliding_time" -> { (s, d) =>
      StepOps.slidingTimeVectors(
          ev(s, d).select("event_type", "ts_us", "event_id", "value"),
          Seq(col("event_type")),
          Seq(col("ts_us"), col("event_id")), col("ts_us"), 50, 3600L * 1000000L)
        .groupBy("event_type", "vec_id")
        .agg(count(lit(1)).as("cnt"),
          sum(decVal).cast("double").as("sum_value"),
          min("event_id").as("first_id"), max("event_id").as("last_id"))
        .orderBy("event_type", "vec_id")
    },

    // §2.6 implicit union: a step with several `after` upstreams.
    "ev_union_after" -> { (s, d) =>
      val e = ev(s, d)
      val a = StepOps.renameReplace(StepOps.matchDrop(e, Pattern.Str("app.purchase")), "money.in")
      val b = StepOps.renameReplace(StepOps.matchDrop(e, Pattern.Str("app.signup")), "growth.in")
      a.unionByName(b).groupBy("n").agg(count(lit(1)).as("cnt"),
        sum(decVal).cast("double").as("sum_value")).orderBy("n")
    },

    // §1.1 wrap: raw lines become {n: wrap-name, d: line}.
    "ev_wrap_raw" -> { (s, d) =>
      ev(s, d).select(lit("raw.line").as("n"), col("props").as("d"),
          col("event_id"))
        .orderBy("event_id")
    },

    // §2.4#12 compiled jq subset: `.[] | select(.value > 100) |
    //   {id, n, k2: (.props.k * 2)}` as native columns.
    "ev_jq_select_map" -> { (s, d) =>
      ev(s, d).filter(col("value") > 100.0)
        .select(col("event_id"), col("n"),
          (get_json_object(col("props"), "$.k").cast("long") * 2).as("k2"))
        .orderBy("event_id")
    },

    // §1.1 new-event trace stamping: arrival time + pipeline + signature.
    "ev_trace_stamp" -> { (s, d) =>
      val sig = Signatures.ofJson("{}")
      val stamped = ev(s, d).withColumn("t",
        EventFunctions.appendTrace(
          lit(null).cast("array<struct<i:double,p:string,h:string>>"),
          EventFunctions.tracePoint(col("ts_us") / lit(1e6), "graft", sig)))
      stamped.select(col("event_id"),
          element_at(col("t"), -1).getField("i").as("i"),
          element_at(col("t"), -1).getField("p").as("p"),
          element_at(col("t"), -1).getField("h").as("h"),
          size(col("t")).as("trace_len"))
        .orderBy("event_id")
    },

    // As-of join (an operator Spark lacks natively): for each purchase
    // event, the same user's most recent PRIOR view — implemented as a
    // single windowed pass over the unioned stream (no join at all),
    // which is the shape that survives 100 TB: one shuffle on the key,
    // no range-join explosion.
    "ev_asof_join" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      ev(s, d)
        .withColumn("last_view_us",
          max(when(col("event_type") === "view", col("ts_us"))).over(w))
        .filter(col("event_type") === "purchase" && col("last_view_us").isNotNull)
        .select(col("event_id"), col("user_id"),
          (col("ts_us") - col("last_view_us")).as("gap_us"))
        .orderBy("event_id")
    },

    // Gap-based sessionization (the canonical stateful stream op, the
    // batch dual of flatMapGroupsWithState): a session breaks after
    // 30 min idle. One shuffle on user_id, then two ordered window
    // passes (boundary flag via lag, session id via running sum) and a
    // hash aggregate — no self-join, no range join, so the plan is the
    // same one you'd run on 100 TB: a single exchange keyed by user.
    // Value sums go through exact DECIMAL (oracle-parity convention).
    "ev_sessionize" -> { (s, d) =>
      sessionTable(s, d)
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_id")
    },

    // Interval-overlap join (the relational operator Spark has no
    // native plan for): how many OTHER users' events fall inside each
    // session's [start_us, end_us]. A naive `ts BETWEEN start AND end`
    // join plans a BroadcastNestedLoop/cartesian — quadratic and
    // undistributable. The scale shape is BIN BUCKETING: intervals
    // explode to the hour bins they cover (sessions close at a 30-min
    // gap, so the fan-out is small and bounded by duration), each
    // probe event lives in EXACTLY ONE bin (so a matched pair appears
    // once — no post-join dedup), the join is a plain equi-join on the
    // bin, and the exact BETWEEN + user inequality filter after it.
    // IntervalJoinSpec asserts no nested-loop/cartesian in the plan.
    // Last-touch attribution — the marketing face of the event
    // battery: each purchase credits the user's most recent
    // click/view STRICTLY before it (total order (ts_us, event_id))
    // within a 7-day window; no touch in window → 'direct'. ONE pass:
    // a per-user ordered window carries the last touch forward as a
    // single struct (no self-join, no range join — the window
    // partitions on user_id, which scales with the data), then a
    // #channels-group rollup. Revenue in exact cents (the fixed-point
    // discipline), so the oracle hash-matches.
    "ev_attribution_last_touch" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("click", "view"),
        struct(col("ts_us").as("t_us"), col("event_type").as("t_type")))
      e.withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("last_touch").isNotNull &&
               col("last_touch.t_us") >= col("ts_us") - lit(604800000000L),
            col("last_touch.t_type")).otherwise(lit("direct")))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("revenue_cents"))
        .orderBy("channel")
    },

    // LINEAR multi-touch attribution: a purchase's value splits evenly
    // across every click/view in the 7 days strictly before it (none →
    // 'direct' keeps it all). Exactness: value in cents (BIGINT), each
    // (purchase, channel) credit is the integer floor-division
    // (vc·10000·n_ch) div n_tot — hundredths of a cent, identical
    // remainder-drop in both engines, no float anywhere. Shape: the
    // SAME per-user ordered pass as last-touch — two RANGE-frame
    // window counts (one WindowExec, no self-join, no range join), so
    // the data cost stays the per-user sort the 100×-scale row already
    // prices.
    "ev_attribution_linear" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400000000L
      val e = ev(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-7 * DayUs, -1)
      // both counts in ONE select → one Window node over one
      // exchange+sort; the three credit arms EXPLODE from a per-row
      // array instead of a 3-way union, which would re-evaluate the
      // whole window subtree per arm (pushed-filter diamonds don't
      // reuse exchanges — three scans measured before the rewrite)
      val p = e.select(col("*"),
          count(when(col("event_type") === "click", 1)).over(w).as("n_click"),
          count(when(col("event_type") === "view", 1)).over(w).as("n_view"))
        .filter(col("event_type") === "purchase")
        .withColumn("vc", floor(col("value") * 100.0 + 0.5).cast("long"))
        .withColumn("n_tot", col("n_click") + col("n_view"))
      val arms = array(
        when(col("n_click") > 0, struct(lit("click").as("channel"),
          expr("(vc * 10000 * n_click) div n_tot").as("credit_fp"))),
        when(col("n_view") > 0, struct(lit("view").as("channel"),
          expr("(vc * 10000 * n_view) div n_tot").as("credit_fp"))),
        when(col("n_tot") === 0, struct(lit("direct").as("channel"),
          expr("vc * 10000").as("credit_fp"))))
      p.select(explode(filter(arms, x => x.isNotNull)).as("a"))
        .groupBy(col("a.channel").as("channel"))
        .agg(count(lit(1)).as("n_credited"), sum("a.credit_fp").as("credit_fp"))
        .orderBy("channel")
    },

    // TIME-DECAY multi-touch attribution: a touch's weight halves per
    // day of age — weight 2^(6−b) for age bucket b (b·1d, (b+1)·1d],
    // seven integer buckets spanning the 7-day window. Exactness: the
    // bucket weights are integers, the per-(purchase, channel) credit
    // is (vc·10000·w_ch) div w_tot — all-BIGINT, mirrored termwise.
    // Shape: 14 RANGE-frame counts over ONE (user_id, ts_us) window
    // spec — a single WindowExec pass computes every frame, so decay
    // costs the same per-user sort as last-touch, not 7 self-joins.
    "ev_attribution_time_decay" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400000000L
      val e = ev(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"), col("value"))
      def frame(b: Int) = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-(b + 1) * DayUs, -(b * DayUs + 1))
      // all 14 counts in ONE select: frames group into Window nodes
      // over a single exchange+sort; credit arms explode from an
      // array (see ev_attribution_linear — a 3-way union re-evaluates
      // the whole window subtree per arm)
      val bucketCounts = (0 to 6).flatMap { b =>
        Seq(count(when(col("event_type") === "click", 1)).over(frame(b)).as(s"ck$b"),
          count(when(col("event_type") === "view", 1)).over(frame(b)).as(s"vw$b"))
      }
      val wClick = (0 to 6).map(b => col(s"ck$b") * lit(1L << (6 - b))).reduce(_ + _)
      val wView = (0 to 6).map(b => col(s"vw$b") * lit(1L << (6 - b))).reduce(_ + _)
      val p = e.select(col("*") +: bucketCounts: _*)
        .withColumn("w_click", wClick).withColumn("w_view", wView)
        .filter(col("event_type") === "purchase")
        .withColumn("vc", floor(col("value") * 100.0 + 0.5).cast("long"))
        .withColumn("w_tot", col("w_click") + col("w_view"))
      val arms = array(
        when(col("w_click") > 0, struct(lit("click").as("channel"),
          expr("(vc * 10000 * w_click) div w_tot").as("credit_fp"))),
        when(col("w_view") > 0, struct(lit("view").as("channel"),
          expr("(vc * 10000 * w_view) div w_tot").as("credit_fp"))),
        when(col("w_tot") === 0, struct(lit("direct").as("channel"),
          expr("vc * 10000").as("credit_fp"))))
      p.select(explode(filter(arms, x => x.isNotNull)).as("a"))
        .groupBy(col("a.channel").as("channel"))
        .agg(count(lit(1)).as("n_credited"), sum("a.credit_fp").as("credit_fp"))
        .orderBy("channel")
    },

    // POSITION-BASED (U-shaped, 40/20/40) multi-touch attribution —
    // the fourth member of the family, same single per-user window
    // pass: the first and last touch channels come from min/max over
    // the SAME RANGE frame as the counts (touch identity packed into
    // one BIGINT, us·4 + channel code, so min/max are plain integer
    // aggregates — portable, and a same-timestamp click/view pair
    // still orders deterministically). Integer endpoint boost: first
    // and last weigh 2(k−2) each, middles 1 — exactly 40%/20%/40% at
    // k ≥ 3, even split at k ≤ 2 — so every credit is
    // (vc·10000·w_ch) div w_tot in BIGINTs, mirrored termwise.
    "ev_attribution_u_shape" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400000000L
      val e = ev(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts_us"), col("value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-7 * DayUs, -1)
      val touchKey = when(col("event_type") === "click", col("ts_us") * 4 + 1)
        .when(col("event_type") === "view", col("ts_us") * 4 + 2)
      val p = e.select(col("*"),
          count(when(col("event_type") === "click", 1)).over(w).as("n_click"),
          count(when(col("event_type") === "view", 1)).over(w).as("n_view"),
          min(touchKey).over(w).as("first_k"),
          max(touchKey).over(w).as("last_k"))
        .filter(col("event_type") === "purchase")
        .withColumn("vc", floor(col("value") * 100.0 + 0.5).cast("long"))
        .withColumn("k", col("n_click") + col("n_view"))
        .withColumn("f", when(col("k") >= 3, (col("k") - 2) * 2).otherwise(lit(1L)))
        .withColumn("fc", (col("first_k") % 4 === 1).cast("long"))
        .withColumn("lc", (col("last_k") % 4 === 1).cast("long"))
        .withColumn("w_click",
          when(col("k") === 0, lit(0L))
            .when(col("k") === 1, col("f") * col("fc"))
            .otherwise(col("f") * (col("fc") + col("lc")) +
              when(col("k") >= 3,
                col("n_click") - col("fc") - col("lc")).otherwise(lit(0L))))
        .withColumn("w_view",
          when(col("k") === 0, lit(0L))
            .when(col("k") === 1, col("f") * (lit(1L) - col("fc")))
            .otherwise(col("f") * (lit(2L) - col("fc") - col("lc")) +
              when(col("k") >= 3,
                col("n_view") - (lit(1L) - col("fc")) - (lit(1L) - col("lc")))
                .otherwise(lit(0L))))
        .withColumn("w_tot",
          when(col("k") <= 1, col("f"))
            .otherwise(col("f") * 2 +
              when(col("k") >= 3, col("k") - 2).otherwise(lit(0L))))
      val arms = array(
        when(col("w_click") > 0, struct(lit("click").as("channel"),
          expr("(vc * 10000 * w_click) div w_tot").as("credit_fp"))),
        when(col("w_view") > 0, struct(lit("view").as("channel"),
          expr("(vc * 10000 * w_view) div w_tot").as("credit_fp"))),
        when(col("k") === 0, struct(lit("direct").as("channel"),
          expr("vc * 10000").as("credit_fp"))))
      p.select(explode(filter(arms, x => x.isNotNull)).as("a"))
        .groupBy(col("a.channel").as("channel"))
        .agg(count(lit(1)).as("n_credited"), sum("a.credit_fp").as("credit_fp"))
        .orderBy("channel")
    },

    "ev_interval_join" -> { (s, d) =>
      val BinUs = 3600L * 1000000L
      val sess = sessionTable(s, d)
        .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"))
      val sBins = sess.withColumn("bin",
        explode(sequence(floor(col("start_us") / BinUs).cast("long"),
          floor(col("end_us") / BinUs).cast("long"))))
      val eBins = ev(s, d)
        .select(col("user_id").as("o_user"), col("ts_us"))
        .withColumn("bin", floor(col("ts_us") / BinUs).cast("long"))
      val hits = sBins.join(eBins, "bin")
        .filter(col("ts_us").between(col("start_us"), col("end_us")) &&
          col("o_user") =!= col("user_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_concurrent"))
      sess.join(hits, Seq("user_id", "session_id"), "left")
        .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"),
          coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
        .orderBy("user_id", "session_id")
    },

    // Salted skew join (SkewOps.saltedJoin's oracle row): events keyed
    // on `event_type` — FIVE distinct values over the whole corpus, the
    // pathological case where a plain shuffle join lands all 100 TB on
    // five reducers. The big side salts each row into 32 deterministic
    // buckets (hash of event_id, not rand() — stable under retries);
    // the 5-row dim replicates ×32 (still broadcast-sized at any corpus
    // scale). The weighted sum is fixed-point (floor(value·1e6 + 0.5)
    // longs × integer weights) so the aggregate is exact integer
    // arithmetic under any shuffle order; the oracle joins plain — the
    // salt must be invisible in the result.
    "join_skew_salted" -> { (s, d) =>
      val events = ev(s, d)
      val dim = events.select("event_type").distinct()
        .withColumn("weight", (length(col("event_type")) % 7 + 1).cast("long"))
      SkewOps.saltedJoin(events, dim, Seq("event_type"),
          salts = 32, saltBy = Seq(col("event_id")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1e6 + 0.5).cast("long") * col("weight"))
            .as("wsum_fp"))
        .select("event_type", "n", "wsum_fp")
        .orderBy("event_type")
    },

    // Cohort retention (the activation dashboard): users cohort by
    // their first-seen day; each active (user, day) pair lands in the
    // (cohort_day, day_offset) cell. Two hash aggregates and one join
    // keyed on user_id — the join reuses the aggregate's partitioning,
    // and the final cell matrix is tiny regardless of corpus size.
    "ev_retention" -> { (s, d) =>
      val DayUs = 86400000000L
      val days = ev(s, d).select(col("user_id"),
        expr(s"ts_us div $DayUs").as("day")).distinct()
      val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
      days.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Rolling active users (the DAU/WAU dashboard pair): distinct
    // (user, day) once, then each active day CONTRIBUTES to the seven
    // window-end days it keeps the user active for — a bounded ×7
    // narrow fan-out replaces the day×day range join (which Spark
    // would plan as a broadcast nested loop at any size), and the
    // distinct-user count per window-end day is an ordinary hash
    // aggregate. Window-end days join the real-day set (broadcast,
    // days-sized) so trailing partial windows past the last real day
    // don't emit.
    "ev_active_users" -> { (s, d) =>
      val DayUs = 86400000000L
      val du = ev(s, d).select(expr(s"ts_us div $DayUs").as("day"), col("user_id"))
        .distinct()
      val days = du.select("day").distinct()
      val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = du
        .select(explode(sequence(col("day"), col("day") + 6, lit(1))).as("day"),
          col("user_id"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, "day").orderBy("day")
    },

    // Markov transition estimation: adjacent (from, to) event-type
    // pairs within each user's ts-ordered stream, with the conditional
    // probability per source type. The lead() window rides the
    // HIGH-cardinality user_id key; per-source totals are a 5-row
    // aggregate broadcast back; the probability is one quantized
    // double division of exact counts.
    "ev_transitions" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val cnt = ev(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("from_type").agg(sum("n").as("tot"))
      cnt.join(broadcast(tot), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          expr("floor((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e12 + 0.5) / 1e12")
            .as("p"))
        .orderBy("from_type", "to_type")
    },

    // Sequence-pattern matching (MATCH_RECOGNIZE-lite): per user, the
    // ts-ordered event-initial string, then regex occurrence counts —
    // adjacent view→purchase ("vp") and eventual view→…→purchase
    // ("v[^p]*p", which both engines match ending at the FIRST
    // purchase after each view, so non-overlapping counts agree).
    // The ordered collect is the honest cost of sequence analytics:
    // one user-keyed exchange, per-group array sort bounded by that
    // user's activity.
    "ev_seq_pattern" -> { (s, d) =>
      val e = ev(s, d).select(col("user_id"), col("ts_us"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      e.groupBy("user_id")
        .agg(array_sort(collect_list(
          struct(col("ts_us"), col("event_id"), col("ch")))).as("seq"))
        .select(col("user_id"),
          array_join(transform(col("seq"), x => x("ch")), "").as("sq"))
        .select(col("user_id"), length(col("sq")).cast("long").as("n_events"),
          expr("regexp_count(sq, 'vp')").cast("long").as("n_adjacent"),
          expr("regexp_count(sq, 'v[^p]*p')").cast("long").as("n_eventual"))
        .orderBy("user_id")
    },

    // Pipeline-health gap detection: per event type, hourly buckets
    // with zero events between that type's first and last active hour
    // — the "did ingestion silently stop for a while" check. No
    // low-cardinality window anywhere: the first gap is found by
    // anti-joining each present bucket's successor (h+1) against the
    // present set — both shuffles key on (type, hour), data-sized.
    // Missing counts are pure arithmetic (span − present) off the
    // per-type aggregate.
    "ev_gap_detect" -> { (s, d) =>
      val pres = presHours(s, d)
      val r = pres.groupBy("event_type")
        .agg(min("h").as("h0"), max("h").as("h1"), count(lit(1)).as("n_present"))
      val succ = pres.select(col("event_type"), (col("h") + 1).as("hc"))
        .join(broadcast(r.select(col("event_type"), col("h1"))), Seq("event_type"))
        .filter(col("hc") <= col("h1"))
      val firstGap = succ
        .join(pres.select(col("event_type"), col("h").as("hc")),
          Seq("event_type", "hc"), "left_anti")
        .groupBy("event_type").agg(min("hc").as("first_gap_hour"))
      r.join(firstGap, Seq("event_type"), "left")
        .select(col("event_type"),
          (col("h1") - col("h0") + 1).as("n_expected"),
          col("n_present"),
          (col("h1") - col("h0") + 1 - col("n_present")).as("n_missing"),
          col("first_gap_hour"))
        .orderBy("event_type")
    },

    // The per-gap row list (ev_gap_detect's summary sibling): one row
    // per missing-hour run. The lag window partitions by event_type —
    // LOW cardinality, but over the distinct (type, hour) table,
    // which is METADATA-sized at any corpus scale (hours in the
    // timeline × types, ~1e5 rows for years of data), so the 5-task
    // stage is bounded work, not the events-table trap.
    "ev_gap_list" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val pres = presHours(s, d)
      val w = Window.partitionBy("event_type").orderBy("h")
      pres.withColumn("nh", lead("h", 1).over(w))
        .filter(col("nh") > col("h") + 1)
        .select(col("event_type"), (col("h") + 1).as("gap_start"),
          (col("nh") - col("h") - 1).as("gap_len"))
        .orderBy("event_type", "gap_start")
    },

    // Ordered 3-stage funnel: signup -> first view at-or-after the
    // signup -> first purchase at-or-after that view, per user. Three
    // conditional-min aggregates, each joined back on user_id (the
    // same key every time, so the exchanges line up); emitted per-user
    // so the oracle checks stage times, not just the final counts.
    "ev_funnel" -> { (s, d) =>
      val e = ev(s, d).select("user_id", "event_type", "ts_us")
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("s_us"))
      val s2 = e.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("ts_us") >= col("s_us"))
        .groupBy("user_id").agg(min("ts_us").as("v_us"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts_us") >= col("v_us"))
        .groupBy("user_id").agg(min("ts_us").as("p_us"))
      s1.join(s2.select("user_id", "v_us"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select("user_id", "s_us", "v_us", "p_us")
        .orderBy("user_id")
    },

    // Time-CONSTRAINED funnel (the product-analytics conversion-window
    // form): the first view within 7 days of first signup, the first
    // purchase within 3 days of that view — stale conversions don't
    // count. Same min-chained equi-join shape as ev_funnel (each stage
    // is a hash aggregate + a user-keyed join that reuses the
    // partitioning), with the window bound as a join-side filter.
    "ev_funnel_windowed" -> { (s, d) =>
      val ViewWinUs = 7L * 86400000000L
      val BuyWinUs = 3L * 86400000000L
      val e = ev(s, d).select("user_id", "event_type", "ts_us")
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("s_us"))
      val s2 = e.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("ts_us") >= col("s_us") &&
          col("ts_us") <= col("s_us") + ViewWinUs)
        .groupBy("user_id").agg(min("ts_us").as("v_us"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts_us") >= col("v_us") &&
          col("ts_us") <= col("v_us") + BuyWinUs)
        .groupBy("user_id").agg(min("ts_us").as("p_us"))
      s1.join(s2.select("user_id", "v_us"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select("user_id", "s_us", "v_us", "p_us")
        .orderBy("user_id")
    },

    // §2.3 the exact anchored count-or-time hybrid (100 ev / 6h per name).
    // Oracle: recursive semantics — checked rows-only by the driver,
    // exact-checked by HybridWindowSpec goldens.
    "ev_window_hybrid" -> { (s, d) =>
      HybridWindow.anchoredVectors(ev(s, d), Seq("event_type"), "ts_us",
          Seq("event_id"), 100, 6 * 3600.0)
        .groupBy("event_type", "vec_id")
        .agg(count(lit(1)).as("cnt"), min("event_id").as("first_id"),
          max("event_id").as("last_id"))
        .orderBy("event_type", "vec_id")
    },

    // OHLC time-bucket rollup (the telemetry/market materialized
    // view): per event_type × hour, the value of the earliest and
    // latest event (open/close via min_by/max_by on a (ts, id) struct
    // — a total order, so ties can't flip the answer), extrema, count
    // and an exact-DECIMAL sum. One map-side-combinable hash
    // aggregate keyed by (type, bucket) — bucket cardinality grows
    // with the timeline, so the shuffle spreads at any corpus size.
    "ev_ohlc" -> { (s, d) =>
      val HourUs = 3600L * 1000000L
      ev(s, d)
        .groupBy(col("event_type"), expr(s"ts_us div $HourUs").as("bucket"))
        .agg(
          min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
          max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"),
          max("value").as("high"), min("value").as("low"),
          count(lit(1)).as("n_events"),
          sum(decVal).cast("double").as("sum_value"))
        .orderBy("event_type", "bucket")
    },

    // Robust rate-spike detection: per-minute event counts per type,
    // flagged where count > median + 3·MAD (median absolute
    // deviation — outlier-proof where mean/stddev are not). Medians
    // ride the shared exact-percentile core (HistogramIndex
    // .percentileFromCounts — value-histogram counts + distributed
    // prefix sum, never one-task-per-type), and every comparison is
    // integral: med_x2 = 2·median and mad_x4 = 4·MAD are exact longs
    // (halves ×2), so the spike boolean carries no float-edge risk.
    "ev_rate_anomaly" -> { (s, d) =>
      val MinUs = 60L * 1000000L
      // persisted: referenced by the median's counts build, the dev
      // frame (twice — MAD build and the final projection), so without
      // it the events scan+aggregate re-runs once per reference (the
      // unpersisted static plan carried 50 copies of the scan). Rate
      // rows are (type, minute) counts — timeline-sized, not
      // corpus-sized, at any scale.
      val rates = ev(s, d)
        .groupBy(col("event_type"), expr(s"ts_us div $MinUs").as("minute_b"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val med = HistogramIndex.percentileFromCounts(
          rates.groupBy(col("event_type"), col("cnt").as("__pv"))
            .agg(count(lit(1)).as("__pc")),
          "event_type", 0.5, "medv")
        .select(col("event_type"), (col("medv") * 2).cast("long").as("med_x2"))
      val dev = rates.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("cnt") * 2 - col("med_x2")))
      val mad = HistogramIndex.percentileFromCounts(
          dev.groupBy(col("event_type"), col("dev2").as("__pv"))
            .agg(count(lit(1)).as("__pc")),
          "event_type", 0.5, "madv")
        .select(col("event_type"), (col("madv") * 2).cast("long").as("mad_x4"))
      dev.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("minute_b"), col("cnt"),
          col("med_x2"), col("mad_x4"),
          (col("cnt") * 4 > col("med_x2") * 2 + col("mad_x4") * 3).as("spike"))
        .orderBy("event_type", "minute_b")
    }
  )

  private val tsUs = "epoch_us(ts)"

  val oracleSql: Map[String, String] = Map(
    "ev_route_drop" ->
      """SELECT 'app.'||event_type AS n, COUNT(*) AS cnt FROM events
        |WHERE event_type <> 'error' GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_route_pass" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'app.alert'
        |            ELSE 'app.'||event_type END AS n, COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_rename_affix" ->
      """SELECT DISTINCT 'in.app.'||event_type||'.out' AS n FROM events ORDER BY 1""".stripMargin,

    "ev_keep_first" ->
      s"""SELECT event_id, event_type, vec_id FROM (
         |  SELECT event_id, event_type, $tsUs // 86400000000 AS vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, $tsUs // 86400000000
         |                       ORDER BY $tsUs, event_id) AS rn
         |  FROM events) WHERE rn <= 5 ORDER BY event_id""".stripMargin,

    "ev_keep_last" ->
      s"""SELECT event_id, user_id FROM (
         |  SELECT event_id, user_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY $tsUs DESC, event_id DESC) AS rn
         |  FROM events) WHERE rn <= 2 ORDER BY event_id""".stripMargin,

    "ev_dedup_data" ->
      s"""SELECT event_id FROM (
         |  SELECT event_id,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, $tsUs // 86400000000, props
         |                       ORDER BY $tsUs, event_id) AS rn
         |  FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "ev_keep_when" ->
      """SELECT event_id, k FROM (
        |  SELECT event_id, TRY_CAST(json_extract_string(props,'$.k') AS DOUBLE) AS k
        |  FROM events WHERE json_type(props,'$.k') IN ('UBIGINT','BIGINT'))
        |WHERE k >= 10 AND k < 50 AND k % 3 = 0
        |  AND CAST(k <= 30 AS INT) + CAST(k >= 25 AS INT) = 1
        |ORDER BY event_id""".stripMargin,

    // arr = [k%5, k%3, (k div 2)%5]; `//` is floor division in DuckDB
    // vs truncating `div` in Spark, but they differ only at k < 0 and
    // those rows are excluded by k > 0 (patternProperties) in BOTH
    // engines, so the conjunction decides identically.
    "ev_keep_when_str" ->
      """SELECT event_id, ty, k FROM (
        |  SELECT event_id, event_type AS ty,
        |    TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events WHERE json_type(props,'$.k') IN ('UBIGINT','BIGINT'))
        |WHERE regexp_matches(ty, '^(cl|si|pu)')
        |  AND length(ty) >= 5 AND length(ty) <= 8
        |  AND k % 2 = 0
        |  AND k > 0
        |  AND (CASE WHEN regexp_matches(ty, '^cl') THEN k >= 10 ELSE k <= 90 END)
        |  AND (k % 5) <> (k % 3) AND (k % 5) <> ((k // 2) % 5)
        |  AND (k % 3) <> ((k // 2) % 5)
        |  AND ((k % 5) = 2 OR (k % 3) = 2 OR ((k // 2) % 5) = 2)
        |ORDER BY event_id""".stripMargin,

    "ev_window_time" ->
      s"""SELECT event_type, $tsUs // 21600000000 AS vec_id, COUNT(*) AS cnt,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  MIN(event_id) AS first_id
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_window_count" ->
      s"""SELECT event_type, (rn - 1) // 50 AS vec_id, COUNT(*) AS cnt,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  MIN(event_id) AS first_id, MAX(event_id) AS last_id
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |        ORDER BY $tsUs, event_id) AS rn FROM events)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_window_sliding" ->
      s"""SELECT event_id,
         |  COUNT(*) OVER w AS frame_n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS frame_sum
         |FROM events
         |WINDOW w AS (PARTITION BY event_type ORDER BY $tsUs, event_id
         |             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
         |ORDER BY event_id""".stripMargin,

    // one row per (head, member) pair, bounded by the 50-row frame and
    // the 1h time arm — the exact slidingTimeVectors membership rule
    "ev_window_sliding_time" ->
      s"""WITH base AS (
         |  SELECT event_type k, event_id, $tsUs us, CAST(value AS DECIMAL(18,2)) v,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY $tsUs, event_id) rn
         |  FROM events)
         |SELECT h.k AS event_type, h.rn - 1 AS vec_id, COUNT(*) AS cnt,
         |  CAST(SUM(m.v) AS DOUBLE) AS sum_value,
         |  MIN(m.event_id) AS first_id, MAX(m.event_id) AS last_id
         |FROM base h JOIN base m
         |  ON m.k = h.k AND m.rn >= h.rn AND m.rn < h.rn + 50
         |  AND m.us - h.us < 3600000000
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_union_after" ->
      """SELECT n, COUNT(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT 'money.in' AS n, value FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT 'growth.in' AS n, value FROM events WHERE event_type = 'signup')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_wrap_raw" ->
      """SELECT 'raw.line' AS n, props AS d, event_id FROM events ORDER BY event_id""".stripMargin,

    "ev_jq_select_map" ->
      """SELECT event_id, 'app.'||event_type AS n,
        |  TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) * 2 AS k2
        |FROM events WHERE value > 100.0 ORDER BY event_id""".stripMargin,

    "ev_trace_stamp" ->
      s"""SELECT event_id, $tsUs / 1000000.0 AS i, 'graft' AS p,
         |  '${Signatures.ofJson("{}")}' AS h, 1 AS trace_len
         |FROM events ORDER BY event_id""".stripMargin,

    "ev_asof_join" ->
      s"""SELECT event_id, user_id, $tsUs - last_view_us AS gap_us FROM (
         |  SELECT event_id, user_id, ts, event_type,
         |    MAX(CASE WHEN event_type = 'view' THEN $tsUs END) OVER (
         |      PARTITION BY user_id ORDER BY $tsUs, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
         |  FROM events)
         |WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
         |ORDER BY event_id""".stripMargin,

    "ev_retention" ->
      s"""WITH days AS (
         |  SELECT DISTINCT user_id, $tsUs // 86400000000 AS day FROM events),
         |coh AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1)
         |SELECT cohort_day, day - cohort_day AS day_offset, COUNT(*) AS n_users
         |FROM days JOIN coh USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ev_active_users" ->
      s"""WITH du AS (
         |  SELECT DISTINCT $tsUs // 86400000000 AS day, user_id FROM events),
         |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
         |contrib AS (SELECT unnest(range(day, day + 7)) AS day, user_id FROM du),
         |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib
         |        WHERE day IN (SELECT day FROM du) GROUP BY day)
         |SELECT day, dau, wau FROM dau JOIN wau USING (day)
         |ORDER BY day""".stripMargin,

    "ev_transitions" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY $tsUs, event_id) AS next_type
         |  FROM events),
         |c AS (SELECT event_type AS from_type, next_type AS to_type,
         |        COUNT(*) AS n
         |      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
         |      FROM c GROUP BY 1)
         |SELECT from_type, to_type, n,
         |  floor((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e12 + 0.5) / 1e12 AS p
         |FROM c JOIN t USING (from_type)
         |ORDER BY from_type, to_type""".stripMargin,

    "ev_seq_pattern" ->
      s"""WITH seq AS (
         |  SELECT user_id,
         |    string_agg(substr(event_type, 1, 1), ''
         |      ORDER BY $tsUs, event_id) AS sq
         |  FROM events GROUP BY user_id)
         |SELECT user_id, CAST(length(sq) AS BIGINT) AS n_events,
         |  CAST(len(regexp_extract_all(sq, 'vp')) AS BIGINT) AS n_adjacent,
         |  CAST(len(regexp_extract_all(sq, 'v[^p]*p')) AS BIGINT) AS n_eventual
         |FROM seq ORDER BY user_id""".stripMargin,

    "ev_gap_list" ->
      s"""WITH d AS (
         |  SELECT DISTINCT event_type, $tsUs // 3600000000 AS h FROM events),
         |l AS (SELECT event_type, h,
         |        lead(h) OVER (PARTITION BY event_type ORDER BY h) AS nh
         |      FROM d)
         |SELECT event_type, h + 1 AS gap_start, nh - h - 1 AS gap_len
         |FROM l WHERE nh > h + 1
         |ORDER BY event_type, gap_start""".stripMargin,

    "ev_gap_detect" ->
      s"""WITH pres AS (
         |  SELECT DISTINCT event_type, $tsUs // 3600000000 AS h FROM events),
         |r AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1,
         |        COUNT(*) AS n_present FROM pres GROUP BY 1),
         |fg AS (SELECT pres.event_type, MIN(pres.h + 1) AS first_gap_hour
         |       FROM pres JOIN r ON pres.event_type = r.event_type
         |       WHERE pres.h + 1 <= r.h1
         |         AND NOT EXISTS (SELECT 1 FROM pres p2
         |                         WHERE p2.event_type = pres.event_type
         |                           AND p2.h = pres.h + 1)
         |       GROUP BY pres.event_type)
         |SELECT r.event_type, h1 - h0 + 1 AS n_expected, n_present,
         |  h1 - h0 + 1 - n_present AS n_missing, first_gap_hour
         |FROM r LEFT JOIN fg ON r.event_type = fg.event_type
         |ORDER BY r.event_type""".stripMargin,

    "ev_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, $tsUs AS us FROM events),
         |s1 AS (SELECT user_id, MIN(us) AS s_us FROM e
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT user_id, MIN(us) AS v_us FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND us >= s_us GROUP BY 1),
         |s3 AS (SELECT user_id, MIN(us) AS p_us FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND us >= v_us GROUP BY 1)
         |SELECT user_id, s_us, v_us, p_us
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "ev_funnel_windowed" ->
      s"""WITH e AS (SELECT user_id, event_type, $tsUs AS us FROM events),
         |s1 AS (SELECT user_id, MIN(us) AS s_us FROM e
         |       WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT user_id, MIN(us) AS v_us FROM e JOIN s1 USING (user_id)
         |       WHERE event_type = 'view' AND us >= s_us
         |         AND us <= s_us + 604800000000 GROUP BY 1),
         |s3 AS (SELECT user_id, MIN(us) AS p_us FROM e JOIN s2 USING (user_id)
         |       WHERE event_type = 'purchase' AND us >= v_us
         |         AND us <= v_us + 259200000000 GROUP BY 1)
         |SELECT user_id, s_us, v_us, p_us
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "ev_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, $tsUs AS us, CAST(value AS DECIMAL(18,2)) AS v,
         |    CASE WHEN LAG($tsUs) OVER w IS NULL
         |           OR $tsUs - LAG($tsUs) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id)),
         |sess AS (
         |  SELECT user_id, us, v,
         |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(us) AS start_us, MAX(us) AS end_us,
         |  CAST(SUM(v) AS DOUBLE) AS sum_value,
         |  MAX(us) - MIN(us) AS dur_us
         |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Two last_value windows over the same frame/order pick the same
    // row, so (t_us, t_type) stay consistent like Spark's struct.
    "ev_attribution_last_touch" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, $tsUs AS us, value FROM events),
         |attr AS (
         |  SELECT user_id, us, value, event_type,
         |    last_value(CASE WHEN event_type IN ('click','view') THEN us END IGNORE NULLS)
         |      OVER w AS t_us,
         |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
         |      OVER w AS t_type
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT CASE WHEN t_us IS NOT NULL AND t_us >= us - 604800000000 THEN t_type
         |            ELSE 'direct' END AS channel,
         |  COUNT(*) AS n_purchases,
         |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         |FROM attr WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_attribution_linear" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, $tsUs AS us, value FROM events),
         |cnt AS (
         |  SELECT user_id, event_type, us, value,
         |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w7 AS n_click,
         |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w7 AS n_view
         |  FROM e
         |  WINDOW w7 AS (PARTITION BY user_id ORDER BY us
         |                RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
         |p AS (
         |  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         |    n_click, n_view, n_click + n_view AS n_tot
         |  FROM cnt WHERE event_type = 'purchase'),
         |arms AS (
         |  SELECT 'click' AS channel, (vc * 10000 * n_click) // n_tot AS credit_fp
         |    FROM p WHERE n_click > 0
         |  UNION ALL
         |  SELECT 'view', (vc * 10000 * n_view) // n_tot FROM p WHERE n_view > 0
         |  UNION ALL
         |  SELECT 'direct', vc * 10000 FROM p WHERE n_tot = 0)
         |SELECT channel, COUNT(*) AS n_credited,
         |  CAST(SUM(credit_fp) AS BIGINT) AS credit_fp
         |FROM arms GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_attribution_u_shape" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, $tsUs AS us, value FROM events),
         |cnt AS (
         |  SELECT user_id, event_type, us, value,
         |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w7 AS n_click,
         |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w7 AS n_view,
         |    MIN(CASE WHEN event_type = 'click' THEN us * 4 + 1
         |             WHEN event_type = 'view' THEN us * 4 + 2 END) OVER w7 AS first_k,
         |    MAX(CASE WHEN event_type = 'click' THEN us * 4 + 1
         |             WHEN event_type = 'view' THEN us * 4 + 2 END) OVER w7 AS last_k
         |  FROM e
         |  WINDOW w7 AS (PARTITION BY user_id ORDER BY us
         |                RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
         |p AS (
         |  SELECT vc, k, f, fc, lc, n_click, n_view,
         |    CASE WHEN k = 0 THEN 0
         |         WHEN k = 1 THEN f * fc
         |         ELSE f * (fc + lc) +
         |           CASE WHEN k >= 3 THEN n_click - fc - lc ELSE 0 END END AS w_click,
         |    CASE WHEN k = 0 THEN 0
         |         WHEN k = 1 THEN f * (1 - fc)
         |         ELSE f * (2 - fc - lc) +
         |           CASE WHEN k >= 3 THEN n_view - (1 - fc) - (1 - lc) ELSE 0 END END AS w_view,
         |    CASE WHEN k <= 1 THEN f
         |         ELSE 2 * f + CASE WHEN k >= 3 THEN k - 2 ELSE 0 END END AS w_tot
         |  FROM (
         |    SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         |      n_click, n_view, n_click + n_view AS k,
         |      CASE WHEN n_click + n_view >= 3
         |           THEN (n_click + n_view - 2) * 2 ELSE 1 END AS f,
         |      CASE WHEN first_k % 4 = 1 THEN 1 ELSE 0 END AS fc,
         |      CASE WHEN last_k % 4 = 1 THEN 1 ELSE 0 END AS lc
         |    FROM cnt WHERE event_type = 'purchase')),
         |arms AS (
         |  SELECT 'click' AS channel, (vc * 10000 * w_click) // w_tot AS credit_fp
         |    FROM p WHERE w_click > 0
         |  UNION ALL
         |  SELECT 'view', (vc * 10000 * w_view) // w_tot FROM p WHERE w_view > 0
         |  UNION ALL
         |  SELECT 'direct', vc * 10000 FROM p WHERE k = 0)
         |SELECT channel, COUNT(*) AS n_credited,
         |  CAST(SUM(credit_fp) AS BIGINT) AS credit_fp
         |FROM arms GROUP BY 1 ORDER BY 1""".stripMargin,

    "ev_attribution_time_decay" -> {
      val DayUs = 86400000000L
      val buckets = (0 to 6).map { b =>
        val lo = (b + 1) * DayUs
        val hi = b * DayUs + 1
        s"""    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER
           |      (PARTITION BY user_id ORDER BY us
           |       RANGE BETWEEN $lo PRECEDING AND $hi PRECEDING) AS ck$b,
           |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER
           |      (PARTITION BY user_id ORDER BY us
           |       RANGE BETWEEN $lo PRECEDING AND $hi PRECEDING) AS vw$b""".stripMargin
      }.mkString(",\n")
      val wc = (0 to 6).map(b => s"ck$b * ${1L << (6 - b)}").mkString(" + ")
      val wv = (0 to 6).map(b => s"vw$b * ${1L << (6 - b)}").mkString(" + ")
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, $tsUs AS us, value FROM events),
         |cnt AS (
         |  SELECT user_id, event_type, us, value,
         |$buckets
         |  FROM e),
         |p AS (
         |  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         |    $wc AS w_click, $wv AS w_view,
         |    $wc + $wv AS w_tot
         |  FROM cnt WHERE event_type = 'purchase'),
         |arms AS (
         |  SELECT 'click' AS channel, (vc * 10000 * w_click) // w_tot AS credit_fp
         |    FROM p WHERE w_click > 0
         |  UNION ALL
         |  SELECT 'view', (vc * 10000 * w_view) // w_tot FROM p WHERE w_view > 0
         |  UNION ALL
         |  SELECT 'direct', vc * 10000 FROM p WHERE w_tot = 0)
         |SELECT channel, COUNT(*) AS n_credited,
         |  CAST(SUM(credit_fp) AS BIGINT) AS credit_fp
         |FROM arms GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // DuckDB evaluates the BETWEEN range join directly (IEJoin) — the
    // declarative ground truth for the Spark side's bin decomposition
    "ev_interval_join" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, $tsUs AS us,
         |    CASE WHEN LAG($tsUs) OVER w IS NULL
         |           OR $tsUs - LAG($tsUs) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id)),
         |sess AS (
         |  SELECT user_id, us,
         |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged),
         |bounds AS (
         |  SELECT user_id, session_id, MIN(us) AS start_us, MAX(us) AS end_us
         |  FROM sess GROUP BY 1, 2)
         |SELECT b.user_id, b.session_id, b.start_us, b.end_us,
         |  COUNT(e.us) AS n_concurrent
         |FROM bounds b LEFT JOIN (SELECT user_id, $tsUs AS us FROM events) e
         |  ON e.us BETWEEN b.start_us AND b.end_us AND e.user_id <> b.user_id
         |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,

    // the oracle joins PLAIN (no salt) — the salted plan must be
    // result-invisible
    "join_skew_salted" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(length(event_type) % 7 + 1 AS BIGINT) AS weight
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(e.value * 1e6 + 0.5) AS BIGINT) * d.weight)
        |    AS BIGINT) AS wsum_fp
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the anchored count-or-time semantics as a sequential recursive
    // CTE: one row per key per iteration, exactly the scan in
    // HybridWindow.anchoredVectors
    "ev_window_hybrid" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT event_type k, $tsUs us, event_id,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY $tsUs, event_id) rn
         |  FROM events),
         |assign AS (
         |  SELECT k, rn, us, event_id, CAST(0 AS BIGINT) vec, CAST(1 AS BIGINT) cnt, us first_us
         |  FROM base WHERE rn = 1
         |  UNION ALL
         |  SELECT b.k, b.rn, b.us, b.event_id,
         |    CASE WHEN a.cnt >= 100 OR b.us - a.first_us >= 21600000000 THEN a.vec + 1 ELSE a.vec END,
         |    CASE WHEN a.cnt >= 100 OR b.us - a.first_us >= 21600000000 THEN 1 ELSE a.cnt + 1 END,
         |    CASE WHEN a.cnt >= 100 OR b.us - a.first_us >= 21600000000 THEN b.us ELSE a.first_us END
         |  FROM assign a JOIN base b ON b.k = a.k AND b.rn = a.rn + 1)
         |SELECT k AS event_type, vec AS vec_id, COUNT(*) AS cnt,
         |  MIN(event_id) AS first_id, MAX(event_id) AS last_id
         |FROM assign GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // arg_min/arg_max take no composite key in DuckDB, so the (ts,
    // event_id) total order is packed into one HUGEINT: us·2^63 +
    // event_id (exact, no overflow — HUGEINT peaks at 1.7e38).
    "ev_ohlc" -> {
      val key = s"epoch_us(ts)::HUGEINT * ((9223372036854775807::HUGEINT)+1) + event_id"
      s"""SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
         |  arg_min(value, $key) AS open,
         |  arg_max(value, $key) AS close,
         |  MAX(value) AS high, MIN(value) AS low,
         |  COUNT(*) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "ev_rate_anomaly" ->
      s"""WITH rates AS (
         |  SELECT event_type, $tsUs // 60000000 AS minute_b, COUNT(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |med AS (
         |  SELECT event_type, CAST(2 * quantile_cont(cnt, 0.5) AS BIGINT) AS med_x2
         |  FROM rates GROUP BY 1),
         |dev AS (
         |  SELECT r.event_type, minute_b, cnt, med_x2,
         |    abs(2 * cnt - med_x2) AS dev2
         |  FROM rates r JOIN med USING (event_type)),
         |mad AS (
         |  SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad_x4
         |  FROM dev GROUP BY 1)
         |SELECT event_type, minute_b, cnt, med_x2, mad_x4,
         |  4 * cnt > 2 * med_x2 + 3 * mad_x4 AS spike
         |FROM dev JOIN mad USING (event_type)
         |ORDER BY event_type, minute_b""".stripMargin
  )
}
