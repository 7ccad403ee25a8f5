package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{IngestSources, Tables}

/** Oracle-checked batch replays of the ingest family (SURVEY.md §2.1).
  *
  * Each query serializes the `events` table to the reference's NDJSON
  * event shape (`{"n": ..., "d": ...}` — reference src/event.ts:30-52),
  * pushes it through a REAL input face (single-file tail with byte
  * offsets, multi-file spool, live HTTP POST endpoint), re-parses with
  * the same variant-path idiom as the production stdin replay
  * (BatchCompiler.loadInput), and projects a deterministic view the
  * DuckDB oracle reproduces straight from the parquet. A lossless
  * round trip hashes exactly; any drop, duplicate, or mangled line
  * fails the gate.
  *
  * AMQP/MQTT/Redis consumers append to the same spool contract
  * (IngestSources scaladoc), so `ev_spool_replay` is their shared
  * replay; the broker wire protocols themselves are covered by the
  * scripted-broker specs.
  */
object IngestQueries {

  type Q = (SparkSession, String) => DataFrame

  /** events → NDJSON event lines `{"n":"app.<type>","d":{"event_id":…,"k":…}}`. */
  private def eventLines(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(to_json(struct(
      concat(lit("app."), col("event_type")).as("n"),
      struct(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")).as("d")
    )).as("value"))

  /** The production parse (try_parse_json + variant paths, as
    * BatchCompiler.loadInput), projected to the oracle view.
    */
  private def replayed(lines: DataFrame): DataFrame = {
    val v = try_parse_json(col("value"))
    lines.select(
        try_variant_get(v, "$.d.event_id", "long").as("event_id"),
        try_variant_get(v, "$.n", "string").as("n"),
        try_variant_get(v, "$.d.k", "long").as("k"))
      .filter(col("n").isNotNull)
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(

    // §2.1 tail: one file, byte-offset checkpoints; maxBytesPerTrigger
    // forces the replay across multiple micro-batches, so bounded
    // admission and offset continuity are both on the hook. Default
    // trigger (batches back-to-back): a ProcessingTime cadence added a
    // fixed wait per micro-batch — ~3 s of pure sleep at sf0.1's ~15
    // micro-batches — without testing anything extra.
    "ev_tail_replay" -> { (s, d) =>
      val dir = Files.createTempDirectory("graft-tailrep")
      val out = dir.resolve("events").toString
      eventLines(s, d).coalesce(1).write.mode("overwrite").text(out)
      val part = Files.list(Paths.get(out)).filter(_.getFileName.toString.startsWith("part-"))
        .findFirst().get().toString
      val table = s"tailrep_${System.nanoTime()}"
      val q = IngestSources.tailFile(s, part, startAt = "start",
          maxBytesPerTrigger = 1024 * 1024)
        .writeStream.format("memory").queryName(table)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      replayed(s.table(table))
    },

    // §2.1 spool (shared face of http/poll/amqp/mqtt/redis consumers):
    // many unordered NDJSON files, replayed through the batch reader.
    "ev_spool_replay" -> { (s, d) =>
      val spool = Files.createTempDirectory("graft-spoolrep").toString
      eventLines(s, d).repartition(8).write.mode("overwrite").text(spool)
      replayed(s.read.text(spool))
    },

    // §2.1 http push: POST the corpus in NDJSON bodies against the LIVE
    // embedded endpoint (ephemeral port), then replay its spool. The
    // driver-side POST loop is the network face of the test, not a data
    // path — bodies are bounded batches of lines.
    "ev_http_replay" -> { (s, d) =>
      val spool = Files.createTempDirectory("graft-httprep").toString
      val ingest = new IngestSources.HttpIngest("/events", 0, spool)
      val port = ingest.start()
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        val uri = java.net.URI.create(s"http://127.0.0.1:$port/events")
        // toLocalIterator streams one partition at a time to the POST
        // loop — driver memory stays O(partition), not O(corpus),
        // matching the send-file path in BatchRunner.
        import scala.jdk.CollectionConverters._
        eventLines(s, d).toLocalIterator().asScala.map(_.getString(0))
          .grouped(1000).foreach { batch =>
            val resp = client.send(
              java.net.http.HttpRequest.newBuilder(uri)
                .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                  batch.mkString("", "\n", "\n"), StandardCharsets.UTF_8))
                .build(),
              java.net.http.HttpResponse.BodyHandlers.discarding())
            require(resp.statusCode() == 200, s"ingest POST got ${resp.statusCode()}")
          }
      } finally ingest.stop()
      replayed(s.read.text(spool))
    }
  )

  private val replaySql =
    """SELECT event_id, 'app.' || event_type AS n,
      |  TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ev_tail_replay" -> replaySql,
    "ev_spool_replay" -> replaySql,
    "ev_http_replay" -> replaySql)
}
