package graft.io

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Executor-wide pool of long-lived `jq` processes for STREAMING
  * pipelines: a micro-batch trigger fires many times a second, and
  * spawning a process per partition per batch (what the batch tier
  * rightly does once per long partition) would dominate latency. The
  * reference keeps exactly one persistent jq per step for the
  * pipeline's lifetime (src/io/json-processor.ts:115-187); this is
  * the executor-shaped version — processes are created on demand per
  * (program, prelude) up to the task parallelism, reused across
  * micro-batches, and live for the JVM's lifetime.
  *
  * Batch demarcation: jq gives no per-input framing, so the pooled
  * program is wrapped with an end-of-batch sentinel echo —
  * `if . == SENTINEL then . else (try (program)) end`. Callers feed a
  * batch of JSON lines plus the sentinel line and drain stdout until
  * the sentinel echoes back. Inputs on every pipeline path are JSON
  * objects or arrays (never a bare string), so user data cannot
  * collide with the sentinel input; a program whose OUTPUT equals the
  * sentinel string (a NUL-framed marker) would truncate its batch —
  * accepted and documented, same trust level as the reference's
  * unframed channel.
  */
object JqPool {

  /** Raw sentinel text as a compact JSON string line (jq -c echoes
    * control characters in NUL form, so echo comparison is exact).
    */
  private val SentinelLine = "\"\\u0000graft-eob\\u0000\""

  private[io] def wrapPooled(program: String, prelude: Option[String]): String =
    s"${prelude.getOrElse("")}\nif . == $SentinelLine then . else (try ($program)) end"

  /** One persistent jq process plus its pipes; callers are expected to
    * hold it exclusively for the duration of a batch (the pool hands
    * each instance to one task at a time).
    */
  private[io] final class PooledJq(program: String, prelude: Option[String]) {
    private val pb = new ProcessBuilder(
      "jq", "-cM", "--unbuffered", wrapPooled(program, prelude))
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    private[io] val proc = pb.start()
    private val w = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    private val r = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))

    def alive: Boolean = proc.isAlive

    /** Feed one batch, drain its outputs (everything up to the
      * sentinel echo). Throws if the process dies mid-batch — the
      * task fails and Spark's retry gets a fresh process, mirroring
      * the reference's kill-the-pipeline-on-child-death stance.
      */
    def process(lines: Iterator[String]): Seq[String] = {
      lines.foreach { l => w.write(l); w.write('\n') }
      w.write(SentinelLine); w.write('\n')
      w.flush()
      val out = Seq.newBuilder[String]
      var line = r.readLine()
      while (line != null && line != SentinelLine) {
        out += line
        line = r.readLine()
      }
      if (line == null)
        throw new java.io.IOException(
          "pooled jq process died mid-batch; failing the task")
      out.result()
    }

    def destroy(): Unit = proc.destroy()
  }

  private val pool = new ConcurrentHashMap[String, ConcurrentLinkedQueue[PooledJq]]()

  private def queueFor(key: String): ConcurrentLinkedQueue[PooledJq] =
    pool.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[PooledJq]())

  /** Pipe one micro-batch partition through a pooled process. Borrows
    * an idle process for the program (or starts one), returns it after
    * the batch. Dead processes are dropped, not returned.
    */
  def pipe(lines: Iterator[String], program: String,
           prelude: Option[String] = None): Iterator[String] = {
    if (!lines.hasNext) return Iterator.empty
    val key = wrapPooled(program, prelude)
    val q = queueFor(key)
    var jq = q.poll()
    while (jq != null && !jq.alive) jq = q.poll() // reap dead idles
    if (jq == null) jq = new PooledJq(program, prelude)
    try {
      val out = jq.process(lines)
      q.offer(jq)
      out.iterator
    } catch {
      case t: Throwable =>
        jq.destroy()
        throw t
    }
  }

  /** Visible for tests: live pooled process count for a program. */
  private[io] def poolSize(program: String, prelude: Option[String] = None): Int =
    Option(pool.get(wrapPooled(program, prelude))).map(_.size).getOrElse(0)
}
