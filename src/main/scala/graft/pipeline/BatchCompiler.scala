package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{EventFunctions, JsonSchemaFilter}
import graft.io.JqPipe
import graft.model.Signatures
import graft.spec.Spec
import graft.spec.Spec._

/** Compile a validated [[graft.spec.Spec.PipelineTemplate]] into a DAG
  * of DataFrame transformations over the canonical event schema
  * `(n string, d string-of-JSON, t array<struct<i,p,h>>)` plus two
  * bookkeeping columns `__ts` (event time, fractional unix seconds)
  * and `__seq` (stable arrival tiebreak).
  *
  * Mapping (SURVEY.md §2): the reference's bus dissolves into
  * DataFrame lineage — a step's input is the union of its `after`
  * upstreams; `match/drop` is a filter; `match/pass` is
  * filter + union; windows become vec_id assignment in arrival order;
  * step functions are the StepOps combinators; `send-*` are
  * pass-through taps exposed in `Compiled.sinks`; terminal steps union
  * into `Compiled.output`.
  *
  * Window keying: the default (`window-key: name`) buffers windows per
  * event name — window assignment shuffles by `n` and runs all keys in
  * parallel, the shape that survives scale. The reference buffers
  * *globally* in arrival order (one buffer per step,
  * src/step.ts:70-151); `window-key: global` opts into that exact
  * semantic for bit-for-bit parity, at the cost of serializing the
  * windowed steps of a replay through one task.
  */
object BatchCompiler {

  val eventType: StructType = StructType(Seq(
    StructField("n", StringType),
    StructField("d", StringType),
    StructField("t", ArrayType(StructType(Seq(
      StructField("i", DoubleType),
      StructField("p", StringType),
      StructField("h", StringType)))))))

  /** A sink tap plus how the runner should deliver it. */
  sealed trait Delivery
  case object ToStdout extends Delivery
  final case class ToFile(path: String, distributed: Boolean = false) extends Delivery
  final case class ToHttp(target: String, method: String,
                          headers: Map[String, String]) extends Delivery
  final case class ToExpose(endpoint: String, port: Int, responses: Int) extends Delivery
  final case class ToRedis(host: String, port: Int, target: String, mode: String) extends Delivery
  final case class ToAmqp(conf: graft.sinks.AmqpBroker.Conf) extends Delivery
  final case class ToMqtt(conf: graft.sinks.MqttBroker.Conf) extends Delivery

  final case class SinkSpec(lines: DataFrame, delivery: Delivery)

  final case class Compiled(output: DataFrame, sinkSpecs: Map[String, SinkSpec]) {
    /** Tap view (NDJSON lines per sink) — what tests and the driver read. */
    def sinks: Map[String, DataFrame] = sinkSpecs.view.mapValues(_.lines).toMap
  }

  /** Load the template's input as an event DataFrame. */
  def loadInput(spark: SparkSession, tpl: PipelineTemplate,
                provided: Option[DataFrame]): DataFrame = tpl.input match {
    case ProvidedInput =>
      provided.getOrElse(throw new IllegalArgumentException(
        "template has no input form; a DataFrame must be provided"))
    case FileInput(path, wrapName) =>
      // "-" replays stdin (the reference's primary input): spool the
      // stream to a temp file so Spark can read it like any other
      val resolved =
        if (path == "-") {
          val tmp = java.nio.file.Files.createTempFile("graft-stdin", ".ndjson")
          java.nio.file.Files.copy(System.in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          tmp.toString
        } else path
      val lines = spark.read.text(resolved).withColumn("__seq", monotonically_increasing_id())
      val ev = wrapName match {
        case Some(w) =>
          // raw line wrapped as a JSON string payload; to_json(struct)
          // handles the escaping, then the {"v": ... } envelope is
          // stripped to leave the bare JSON string literal
          val quoted = to_json(struct(col("value").as("v")))
          lines.select(lit(w).as("n"),
            quoted.substr(lit(6), length(quoted) - 6).as("d"),
            lit(null).cast(eventType("t").dataType).as("t"), col("__seq"))
        case None =>
          val v = try_parse_json(col("value"))
          lines.select(
            try_variant_get(v, "$.n", "string").as("n"),
            to_json(try_variant_get(v, "$.d", "variant")).as("d"),
            from_json(to_json(try_variant_get(v, "$.t", "variant")),
              eventType("t").dataType).as("t"),
            col("__seq"))
            .filter(col("n").isNotNull)
      }
      ev
    case GeneratorInput(_, name) =>
      throw new IllegalArgumentException(
        s"generator input is a streaming source; use StreamCompiler (name=$name)")
  }

  /** Stamp arrival trace points on input events (reference
    * src/event.ts:218-230) and normalize bookkeeping columns.
    */
  def stampInput(tpl: PipelineTemplate, events: DataFrame,
                 arrivalTs: Column): DataFrame = {
    val sig = tpl.signature
    val df0 = if (events.columns.contains("__seq")) events
      else events.withColumn("__seq", monotonically_increasing_id())
    df0
      .withColumn("t", EventFunctions.appendTrace(
        if (events.columns.contains("t")) col("t") else lit(null).cast(eventType("t").dataType),
        EventFunctions.tracePoint(arrivalTs, tpl.name, sig)))
      .withColumn("__ts", EventFunctions.eventTime(col("t")))
      .select("n", "d", "t", "__ts", "__seq")
  }

  def compile(spark: SparkSession, tpl: PipelineTemplate, input: DataFrame): Compiled = {
    val sinks = scala.collection.mutable.LinkedHashMap[String, SinkSpec]()
    val outputs = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    val variantPayload = tpl.payloadTier == "variant"

    // variant payload tier: parse `d` ONCE into a VariantType column
    // that rides between steps; compiled-jq `.d` paths read it instead
    // of re-parsing the JSON text per access (payloadSource rebind in
    // applyVariantScoped). Steps that construct a new payload emit
    // fresh `d` text, so `__dv` is recomputed after every step.
    def attachDv(df: DataFrame): DataFrame =
      if (variantPayload) df.withColumn("__dv", try_parse_json(col("d"))) else df
    def applyVariantScoped[A](body: => A): A =
      if (variantPayload)
        graft.functions.JqCompiler.payloadSource.withValue(() => col("__dv"))(body)
      else body

    val input0 = attachDv(input)
    Spec.topoOrder(tpl).foreach { step =>
      val upstream = (if (step.after.isEmpty) Seq("$input") else step.after).map {
        case "$input" => input0
        case other    => outputs(other)
      }.reduce(_ unionByName _)

      val (matched, passed) = step.pattern match {
        case None => (upstream, None)
        case Some(p) =>
          val c = EventFunctions.matchesPattern(col("n"), p)
          (upstream.filter(c),
            if (step.matchMode == MatchMode.Pass) Some(upstream.filter(!c)) else None)
      }

      val processed = attachDv(applyVariantScoped(applyFn(spark, tpl, step, matched, sinks)))
      outputs(step.name) = passed.fold(processed)(processed.unionByName(_))
    }

    val terminalNames = {
      val referenced = tpl.steps.flatMap(_.after).toSet
      tpl.steps.map(_.name).filterNot(referenced.contains)
    }
    val out = terminalNames.map(outputs(_)) match {
      case Seq()  => input0.limit(0)
      case builds => builds.reduce(_ unionByName _)
    }
    Compiled(if (variantPayload) out.drop("__dv") else out, sinks.toMap)
  }

  // ---- per-step function application ----

  private def applyFn(spark: SparkSession, tpl: PipelineTemplate, step: StepSpec,
                      df: DataFrame,
                      sinks: scala.collection.mutable.Map[String, SinkSpec]): DataFrame = {
    val ord = Seq(col("__ts"), col("__seq"))
    val vecIdCols = vecCols(tpl)

    def withVectors(d: DataFrame): (DataFrame, Seq[Column]) =
      (vectorized(tpl, d, step), vecIdCols.map(col))

    step.fn match {
      case Rename(replace, prepend, append) =>
        replace match {
          case Some(r) => df.withColumn("n", lit(r))
          case None => df.withColumn("n",
            concat(lit(prepend.getOrElse("")), col("n"), lit(append.getOrElse(""))))
        }

      case Deduplicate(byName, byData, byTrace) =>
        val keys = Seq(
          if (byName) Some(col("n")) else None,
          if (byData) Some(coalesce(col("d"), lit("\u0000"))) else None,
          if (byTrace) Some(coalesce(to_json(col("t")), lit("\u0000"))) else None).flatten
        val (vd, vCols) = withVectors(df)
        (if (keys.isEmpty) graft.operators.StepOps.keepFirst(vd, vCols, ord, 1)
         else graft.operators.StepOps.dedupWithin(vd, vCols, keys, ord))
          .drop(vecIdCols: _*)

      case Keep(first, last) =>
        val (vd, vCols) = withVectors(df)
        val out = (first, last) match {
          case (Some(n), _) => graft.operators.StepOps.keepFirst(vd, vCols, ord, n)
          case (_, Some(n)) => graft.operators.StepOps.keepLast(vd, vCols, ord, n)
          case _            => vd
        }
        out.drop(vecIdCols: _*)

      case KeepWhen(schema) =>
        df.filter(JsonSchemaFilter.compile(schema, col("d")))

      case SendStdout(jq) =>
        sinks(step.name) = SinkSpec(formatted(spark, tpl, step, df, jq), ToStdout)
        df // pass-through

      case SendFile(path, jq, distributed) =>
        sinks(s"${step.name}:$path") = SinkSpec(formatted(spark, tpl, step, df, jq),
          ToFile(path, distributed))
        df // pass-through

      case SendHttp(target, method, headers, jq) =>
        // one request per vector: body = NDJSON of the vector's events
        // (reference src/step-functions/send-http.ts:88-154); with a
        // jq-expr, one request per jq result
        val bodies = jq match {
          case None       => vectorBodies(spark, tpl, df, step)
          case Some(expr) => formatted(spark, tpl, step, df, Some(expr))
        }
        sinks(step.name) = SinkSpec(bodies, ToHttp(target, method, headers))
        df // pass-through

      case ExposeHttpFn(endpoint, port, responses) =>
        sinks(step.name) = SinkSpec(vectorBodies(spark, tpl, df, step),
          ToExpose(endpoint, port, responses))
        df // pass-through

      case SendRedis(host, port, target, mode, jq) =>
        sinks(step.name) = SinkSpec(formatted(spark, tpl, step, df, jq),
          ToRedis(host, port, target, mode))
        df // pass-through

      case SendAmqp(host, port, exchange, exType, durable, autoDel,
                    routingKey, expiration, priority, persistent, jq) =>
        // without jq: one message per vector (NDJSON, timestamped with
        // the vector's max event time); with jq: one message per
        // result (reference send-amqp.ts:196-238)
        val conf = graft.sinks.AmqpBroker.Conf(host, port, exchange, exType,
          durable, autoDel, routingKey, expiration, priority, persistent,
          ndjson = jq.isEmpty)
        val bodies = jq match {
          case None       => vectorBodiesTs(spark, tpl, df, step)
          case Some(expr) => formatted(spark, tpl, step, df, Some(expr))
        }
        sinks(step.name) = SinkSpec(bodies, ToAmqp(conf))
        df // pass-through

      case SendMqtt(host, port, topic, qos, jq) =>
        // default topic cdp/<pipeline>/<step> (send-mqtt.ts:74-75)
        val conf = graft.sinks.MqttBroker.Conf(host, port,
          topic.getOrElse(s"cdp/${tpl.name}/${step.name}"), qos,
          ndjson = jq.isEmpty)
        val mqttBodies = jq match {
          case None       => vectorBodies(spark, tpl, df, step)
          case Some(expr) => formatted(spark, tpl, step, df, Some(expr))
        }
        sinks(step.name) = SinkSpec(mqttBodies, ToMqtt(conf))
        df // pass-through

      case SendReceiveHttp(target, headers, wrapName) =>
        httpTransform(spark, tpl, step, df, target, headers, wrapName)

      case SendReceiveJsonnet(expr, wrapName) =>
        // in-subset expressions run as native Columns (no binary, same
        // machinery as the compiled jq tier); the general case pipes
        // vectors through the stream-jsonnet helper
        val jsonnetProgram = tpl.jsonnetPrelude.fold(expr)(p => p + "\n" + expr)
        val compiledJsonnet =
          if (wrapName.isEmpty) graft.functions.JsonnetCompiler.tryCompile(jsonnetProgram)
          else None
        compiledJsonnet match {
          case Some(c) => compiledJq(spark, tpl, step, df, c)
          case None =>
            val bin = sys.env("GRAFT_JSONNET_BIN")
            // prelude + code, like the reference (io/jsonnet.ts:14-15)
            val program = tpl.jsonnetPrelude.fold(expr)(p => p + "\n" + expr)
            import spark.implicits._
            val vecLines = vectorBodies(spark, tpl, df, step)
            val piped = vecLines.as[String]
              .mapPartitions(it => graft.io.JqPipe.pipeCommand(it, Seq(bin, program)))
              .toDF("line").withColumn("__seq", monotonically_increasing_id())
            parseEventLines(tpl, piped, wrapName)
        }

      case SendReceiveJq(expr, wrapName) =>
        if (tpl.jqTier != "compiled")
          jqTransform(spark, tpl, step, df, expr, wrapName)
        else wrapName match {
          case None =>
            graft.functions.JqCompiler.tryCompile(expr) match {
              case Some(c) => compiledJq(spark, tpl, step, df, c)
              case None    => jqTransform(spark, tpl, step, df, expr, wrapName)
            }
          case Some(w) =>
            graft.functions.JqCompiler.tryCompileWrapped(expr) match {
              case Some(pv) => compiledWrappedJq(spark, tpl, df, w, pv)
              case None     => jqTransform(spark, tpl, step, df, expr, wrapName)
            }
        }
    }
  }

  /** The compiled jq tier: in-subset expressions run as native columns
    * — no subprocess, codegen'd. Per-event forms keep the original
    * arrival order/time (deterministic, unlike wall-clock stamping);
    * per-vector forms aggregate over the step's vectors with the
    * vector's max event time.
    */
  private def compiledJq(spark: SparkSession, tpl: PipelineTemplate, step: StepSpec,
                         df: DataFrame, c: graft.functions.JqCompiler.Compiled): DataFrame = {
    import graft.functions.JqCompiler._
    val sig = tpl.signature
    c match {
      case CompiledPerEvent(pe) =>
        val filtered = pe.filter.fold(df)(df.filter)
        // `t: .t` passthrough: keep the existing trace verbatim, like
        // the subprocess parse path does for traced replacement events
        val tCol =
          if (pe.keepTrace) col("t")
          else EventFunctions.appendTrace(lit(null).cast(eventType("t").dataType),
            EventFunctions.tracePoint(col("__ts"), tpl.name, sig))
        filtered.select(
          pe.outName.as("n"),
          pe.outPayloadJson.as("d"),
          tCol.as("t"),
          col("__ts"), col("__seq"))
      case CompiledPerEventLimited(pe, n) =>
        // `limit(n; .[] | ...)`: the per-event form capped at n outputs
        // PER VECTOR — the jq program runs once per window vector, so
        // the cap is vector-scoped, a keyed row_number over the step's
        // vector ids in arrival order (never a global sort); singleton
        // steps get vec_id = __seq, where any n >= 1 passes everything
        // — exactly the subprocess's per-vector behavior
        val vd = vectorized(tpl, df, step)
        val vCols = vecCols(tpl)
        val filteredL = pe.filter.fold(vd)(vd.filter)
        val wL = org.apache.spark.sql.expressions.Window
          .partitionBy(vCols.map(col): _*)
          .orderBy(col("__ts"), col("__seq"))
        val tColL =
          if (pe.keepTrace) col("t")
          else EventFunctions.appendTrace(lit(null).cast(eventType("t").dataType),
            EventFunctions.tracePoint(col("__ts"), tpl.name, sig))
        filteredL
          .withColumn("__rn", row_number().over(wL))
          .filter(col("__rn") <= n)
          .select(
            pe.outName.as("n"),
            pe.outPayloadJson.as("d"),
            tColL.as("t"),
            col("__ts"), col("__seq"))
      case CompiledPerVector(pv) =>
        val vd = vectorized(tpl, df, step)
        val vCols = vecCols(tpl)
        val ord = struct(col("__ts"), col("__seq"))
        val aggCols = pv.aggs(ord).map { case (k, c0) => c0.as(k) } :+ max(col("__ts")).as("__vts")
        val agged = vd.groupBy(vCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        val payload = pv.keys match {
          case Seq("d") => col("d").cast("string")
          case keys     => to_json(struct(keys.map(col): _*))
        }
        // keyed mode: vec_id restarts per key, so the arrival tiebreak is a
        // deterministic hash of the vector identity (cross-key close order
        // was wall-clock nondeterministic in the reference too)
        val seqExpr =
          if (vCols.size > 1) xxhash64(vCols.map(col): _*) else col("vec_id")
        agged.select(
          pv.outName.as("n"),
          payload.as("d"),
          EventFunctions.appendTrace(lit(null).cast(eventType("t").dataType),
            EventFunctions.tracePoint(col("__vts"), tpl.name, sig)).as("t"),
          col("__vts").as("__ts"), seqExpr.as("__seq"))
    }
  }

  /** The compiled wrapped-jq tier: per-event value streams under a
    * `wrap:` directive (the stress-test filter shape) as native
    * Columns. Output events keep the original arrival order/time
    * (deterministic, like the other per-event compiled forms).
    */
  private def compiledWrappedJq(spark: SparkSession, tpl: PipelineTemplate,
                                df: DataFrame, wrapName: String,
                                pv: graft.functions.JqCompiler.PerEventValue): DataFrame = {
    val sig = tpl.signature
    pv.filter.fold(df)(df.filter).select(
      lit(wrapName).as("n"),
      pv.valueJson.as("d"),
      EventFunctions.appendTrace(lit(null).cast(eventType("t").dataType),
        EventFunctions.tracePoint(col("__ts"), tpl.name, sig)).as("t"),
      col("__ts"), col("__seq"))
  }

  /** Terminal events rendered as reference-format NDJSON lines. */
  def renderNdjson(df: DataFrame): DataFrame = df.select(eventJson.as("line"))

  /** NDJSON body per vector, in vector order. */
  private def vectorBodies(spark: SparkSession, tpl: PipelineTemplate,
                           df: DataFrame, step: StepSpec): DataFrame = {
    val vCols = vecCols(tpl).map(col)
    vectorized(tpl, df, step)
      .groupBy(vCols: _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ts"), col("__seq"), eventJson.as("ej")))),
        x => x.getField("ej")), "\n").as("line"))
      .orderBy(vCols: _*)
      .select("line")
  }

  /** [[vectorBodies]] plus the vector's max event timestamp (seconds,
    * truncated) — what send-amqp stamps NDJSON messages with
    * (reference send-amqp.ts:231-236).
    */
  private def vectorBodiesTs(spark: SparkSession, tpl: PipelineTemplate,
                             df: DataFrame, step: StepSpec): DataFrame = {
    val vCols = vecCols(tpl).map(col)
    vectorized(tpl, df, step)
      .groupBy(vCols: _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ts"), col("__seq"), eventJson.as("ej")))),
        x => x.getField("ej")), "\n").as("line"),
        floor(max(col("__ts"))).cast("double").as("__vts"))
      .orderBy(vCols: _*)
      .select("line", "__vts")
  }

  /** send-receive-http (reference src/step-functions/send-receive-http.ts:96-143):
    * POST each vector as NDJSON; the response body (NDJSON events, or
    * raw lines when wrapped) REPLACES the vector; request errors yield
    * an empty vector.
    */
  private def httpTransform(spark: SparkSession, tpl: PipelineTemplate, step: StepSpec,
                            df: DataFrame, target: String,
                            headers: Map[String, String],
                            wrapName: Option[String]): DataFrame = {
    import spark.implicits._
    val bodies = vectorBodies(spark, tpl, df, step)
    val piped = bodies.as[String].mapPartitions { it =>
      it.flatMap { body =>
        try {
          val resp = graft.io.HttpOps.send(target, "POST", headers, body)
          if (resp.statusCode() >= 200 && resp.statusCode() < 300)
            resp.body().linesIterator.filter(_.nonEmpty)
          else Iterator.empty
        } catch { case _: Exception => Iterator.empty }
      }
    }.toDF("line").withColumn("__seq", monotonically_increasing_id())
    parseEventLines(tpl, piped, wrapName)
  }

  /** The columns identifying one vector after [[vectorized]]: just
    * `vec_id` on the reference-parity global path, `(__wk, vec_id)`
    * under `window-key: name` (vec_id restarts per key).
    */
  private def vecCols(tpl: PipelineTemplate): Seq[String] =
    if (tpl.windowKey == "name") Seq("__wk", "vec_id") else Seq("vec_id")

  /** Assign `vec_id` per the step's window and mode (reference
    * src/step.ts:70-151): singleton fast path; reduce = anchored
    * count-or-time groups in arrival order; flatmap = sliding
    * per-event vectors, so events are *duplicated* into every vector
    * they belong to — vec_id is the head event's rank, reproducing
    * (A,B,C),(B,C,D),(C,D,E),(D,E),(E) from README.md:643-669.
    *
    * With the template's `window-key: name`, windows buffer per event
    * name instead of in one global arrival buffer: window assignment
    * partitions by `n` (one shuffle, all keys in parallel) rather than
    * serializing the step through a single global sort — the scalable
    * shape, matching what the streaming compiler already does. The
    * reference's cross-key vector close order was wall-clock
    * nondeterministic anyway, so per-key order is the meaningful part.
    */
  private def vectorized(tpl: PipelineTemplate, df: DataFrame, step: StepSpec): DataFrame = {
    val keyed = tpl.windowKey == "name"
    def withKey(d: DataFrame): DataFrame =
      if (keyed) d.withColumn("__wk", coalesce(col("n"), lit(""))) else d
    if (step.window.events <= 1 && step.window.seconds <= 0)
      withKey(df.withColumn("vec_id", col("__seq"))) // singleton: vec_id already unique
    else if (step.flatmap) {
      val n = step.window.events
      val keyCols = if (keyed) Seq(col("__wk")) else Seq.empty
      if (step.window.seconds > 0) {
        // both arms: a buffer closes at `events` members or `seconds`
        // after its head event (event time stands in for the
        // reference's wall clock in batch replay, src/step.ts:84-131;
        // event time carried at microsecond resolution)
        graft.operators.StepOps.slidingTimeVectors(
          withKey(df).withColumn("__tus", (col("__ts") * 1e6).cast("long")), keyCols,
          Seq(col("__ts"), col("__seq")), col("__tus"), n,
          (step.window.seconds * 1e6).toLong)
          .drop("__tus")
      } else
        // count-only sliding frames are rank arithmetic; the
        // distributed rank keeps the stage off the #keys-parallelism
        // cliff (and off the single global sort on the global path)
        graft.operators.ParallelRank.withRowNumber(
            withKey(df), keyCols, Seq(col("__ts"), col("__seq")), "__r1")
          .withColumn("vec_id", // 0-based rank r = __r1 - 1; heads r-(n-1)..r
            explode(sequence(greatest(col("__r1") - lit(n.toLong), lit(0L)),
              col("__r1") - 1)))
          .drop("__r1")
    } else if (step.window.seconds <= 0) {
      // count-only reduce windows: disjoint groups of `events` per key
      // = (rank-1) div events. The anchored-chain operator gives the
      // same answer here but pins its distribution (and everything
      // downstream) to #keys partitions; rank arithmetic runs wide.
      graft.operators.StepOps.reduceCountVectors(
        withKey(df),
        if (keyed) Seq(col("__wk")) else Seq.empty,
        Seq(col("__ts"), col("__seq")), step.window.events)
    } else {
      val base = withKey(df).withColumn("__us", (col("__ts") * 1e6).cast("long"))
      val (keyCols, prepared) =
        if (keyed) (Seq("__wk"), base)
        else (Seq("__k"), base.withColumn("__k", lit(1)))
      val out = graft.operators.HybridWindow.anchoredVectors(
        prepared, keyCols, "__us", Seq("__seq"),
        step.window.events, step.window.seconds)
      (if (keyed) out else out.drop("__k")).drop("__us")
    }
  }

  /** Event rendered as the exact JSON the reference would produce:
    * payload injected verbatim (it is already JSON text).
    */
  private def eventJson: Column =
    to_json(struct(
      col("n").as("n"),
      try_parse_json(coalesce(col("d"), lit("null"))).as("d"),
      col("t").as("t")))

  /** The `send-*` pre-format: NDJSON of the vector, or jq output. */
  private def formatted(spark: SparkSession, tpl: PipelineTemplate, step: StepSpec,
                        df: DataFrame, jq: Option[String]): DataFrame = {
    import spark.implicits._
    jq match {
      case None => df.orderBy("__ts", "__seq").select(eventJson.as("line"))
      case Some(expr) =>
        // the reference writes each step VECTOR to the processor as ONE
        // JSON array line (json-processor.ts:166 — stringify(Event[]) +
        // "\n"; the channel's send item is the whole vector), so jq's
        // `.` is the event array: `map(.d)` projects payloads, `.[]`
        // iterates events. Un-windowed send steps have singleton
        // vectors — each event arrives as a 1-element array, exactly
        // like the reference's un-windowed channels.
        val prelude = tpl.jqPrelude // local: don't serialize the template
        val compiledBody =
          if (tpl.jqTier == "compiled" && prelude.isEmpty)
            graft.functions.JqCompiler.tryCompileSinkMap(expr)
          else None
        compiledBody match {
          case Some(body) =>
            // in-subset sink form (map(.d-path)) runs as ONE native
            // aggregate per vector — no subprocess on the sink path
            val vd = vectorized(tpl, df, step)
            val vCols = vecCols(tpl).map(col)
            val ord = struct(col("__ts"), col("__seq"))
            vd.groupBy(vCols: _*).agg(body(ord).as("line"))
              .orderBy(vCols: _*).select("line")
          case None =>
            vectorArrayLines(tpl, df, step).as[String].mapPartitions(it =>
              JqPipe.pipePartition(it, expr, prelude)).toDF("line")
        }
    }
  }

  /** One JSON array line per step vector, in vector order — the exact
    * processor input the reference produces
    * (src/io/json-processor.ts:166).
    */
  private def vectorArrayLines(tpl: PipelineTemplate, df: DataFrame,
                               step: StepSpec): DataFrame = {
    val vd = vectorized(tpl, df, step)
    val vCols = vecCols(tpl).map(col)
    vd.groupBy(vCols: _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ts"), col("__seq"), eventJson.as("ej")))),
        x => x.getField("ej")), ",").as("body"))
      .orderBy(vCols: _*)
      .select(concat(lit("["), col("body"), lit("]")).as("line"))
  }

  /** send-receive-jq: vectors in, replacement events out. */
  private def jqTransform(spark: SparkSession, tpl: PipelineTemplate, step: StepSpec,
                          df: DataFrame, expr: String, wrapName: Option[String]): DataFrame = {
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    // vectors in arrival order; each vector becomes one JSON array line.
    //
    // Two deliberate exchanges around the heavy per-event work:
    //   - an explicit hash repartition on the vector key BEFORE the
    //     aggregate: the JSON render (eventJson per event) runs inside
    //     the aggregate, and on the global-window path the window's
    //     output is ONE partition — without this the whole corpus
    //     renders on one core. groupBy on the same key/count reuses
    //     the exchange (guide §2.4), so this costs no extra shuffle;
    //   - repartitionByRange (NOT orderBy) to feed the subprocess pipe:
    //     a global sort's post-shuffle partitions get COALESCED by AQE
    //     (25 MB of vector lines -> one partition -> ONE jq process);
    //     an explicit range repartition pins p partitions, so p
    //     processes pump in parallel, and range + per-partition sort
    //     preserves exactly the global vector order the old orderBy
    //     gave (monotonically_increasing_id stays monotone with
    //     arrival across ordered range partitions).
    val vd = vectorized(tpl, df, step).repartition(p, vecCols(tpl).map(col): _*)
    val vCols = vecCols(tpl).map(col)
    val vecLines = vd
      .groupBy(vCols: _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ts"), col("__seq"), eventJson.as("ej")))),
        x => x.getField("ej")), ",").as("body"),
        max("__ts").as("vts"))
      .repartitionByRange(p, vCols: _*)
      .sortWithinPartitions(vCols: _*)
      .select(concat(lit("["), col("body"), lit("]")).as("line"), col("vts"))

    val prelude = tpl.jqPrelude // local: don't serialize the template
    val piped = vecLines.select("line").as[String]
      .mapPartitions(it => JqPipe.pipePartition(it, expr, prelude))
      .toDF("line")
      .withColumn("__seq", monotonically_increasing_id())
    parseEventLines(tpl, piped, wrapName)
  }

  /** Old-event parser semantics on replacement lines: wrapped raw
    * values or parsed events; keep an existing trace, else stamp fresh
    * (reference src/event.ts:244-263).
    */
  private def parseEventLines(tpl: PipelineTemplate, piped: DataFrame,
                              wrapName: Option[String]): DataFrame = {
    val sig = tpl.signature
    val now = lit(System.currentTimeMillis() / 1000.0)
    val parsed = wrapName match {
      case Some(w) =>
        piped.select(lit(w).as("n"), col("line").as("d"),
          lit(null).cast(eventType("t").dataType).as("t"), col("__seq"))
      case None =>
        val v = try_parse_json(col("line"))
        piped.select(
          try_variant_get(v, "$.n", "string").as("n"),
          to_json(try_variant_get(v, "$.d", "variant")).as("d"),
          from_json(to_json(try_variant_get(v, "$.t", "variant")),
            eventType("t").dataType).as("t"),
          col("__seq"))
          .filter(col("n").isNotNull)
    }
    parsed
      .withColumn("t", when(col("t").isNotNull && size(col("t")) > 0, col("t"))
        .otherwise(EventFunctions.appendTrace(lit(null).cast(eventType("t").dataType),
          EventFunctions.tracePoint(now, tpl.name, sig))))
      .withColumn("__ts", EventFunctions.eventTime(col("t")))
      .select("n", "d", "t", "__ts", "__seq")
  }
}
