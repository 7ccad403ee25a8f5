package graft.io

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

/** The general jq tier: pipe JSON lines through a persistent `jq -cM
  * --unbuffered` subprocess, one process per partition-task, reused
  * for every row in the partition (the Spark-shaped version of the
  * reference's one-process-per-step channel,
  * src/io/json-processor.ts:115-187).
  *
  * The program is wrapped `try (...)` exactly like the reference
  * (src/io/jq.ts:14-15) so bad inputs produce no output instead of
  * killing the process. Outputs are NDJSON, 0..N lines per input —
  * per-input attribution is not possible through a persistent stream
  * (same property as the reference's channel).
  */
object JqPipe {

  def wrap(program: String, prelude: Option[String]): String =
    s"${prelude.getOrElse("")}\ntry ($program)"

  /** Pipe a partition's JSON lines through one jq process. A writer
    * thread feeds stdin while the caller drains stdout, so pipe
    * buffers can't deadlock. The iterator is fully lazy on the read
    * side.
    *
    * Deliberately NOT `--unbuffered` (unlike [[JqPool]], whose
    * sentinel echo must arrive before EOF): the feeder closes stdin
    * when the partition is exhausted, so jq's block-buffered stdout
    * flushes on EOF and every line arrives — while a per-event program
    * emitting millions of lines pays one write syscall per ~64 KB
    * block instead of one flush per line (measured 2.5x on the
    * pipeline_e2e_reduce pump, bytes identical).
    */
  def pipePartition(lines: Iterator[String], program: String,
                    prelude: Option[String] = None): Iterator[String] =
    pipeCommand(lines, Seq("jq", "-cM", wrap(program, prelude)))

  /** Same persistent-subprocess contract for any line processor — the
    * jsonnet helper (`stream-jsonnet`-style: one jsonnet
    * `function(events)` applied per input line) plugs in here when a
    * binary is available via GRAFT_JSONNET_BIN.
    */
  def pipeCommand(lines: Iterator[String], cmd: Seq[String]): Iterator[String] = {
    if (!lines.hasNext) return Iterator.empty
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()

    // A dead child must fail the task, not truncate it (reference kills the
    // whole pipeline on child death, src/api.ts:411-422). The feeder records
    // its failure here; EOF on stdout reaps the child and checks both.
    @volatile var feederError: Throwable = null
    val writer = new Thread(() => {
      val w = new BufferedWriter(new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
      try {
        try {
          lines.foreach { l => w.write(l); w.write('\n') }
          w.flush()
        } finally w.close()
      } catch {
        case t: Throwable =>
          // Broken pipe here means the child died mid-partition; remember it
          // so the read side can fail instead of ending early.
          feederError = t
      }
    }, "jq-feeder")
    writer.setDaemon(true)
    writer.start()

    val r = new BufferedReader(new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
    new Iterator[String] {
      private var nextLine: String = r.readLine()
      private var reaped = false
      private def reap(): Unit = if (!reaped) {
        reaped = true
        r.close()
        writer.join(30000)
        val exit = proc.waitFor()
        if (exit != 0)
          throw new java.io.IOException(
            s"${cmd.head} subprocess exited with code $exit mid-partition; " +
              "failing the task instead of returning truncated output")
        if (feederError != null)
          throw new java.io.IOException(
            s"${cmd.head} subprocess stopped accepting input mid-partition", feederError)
      }
      override def hasNext: Boolean = {
        if (nextLine == null) { reap(); false } else true
      }
      override def next(): String = {
        val l = nextLine; nextLine = r.readLine(); l
      }
    }
  }
}
