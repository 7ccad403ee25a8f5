package graft.io

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Subprocess health semantics: a child that dies mid-partition must fail
  * the task, never return silently truncated output (reference kills the
  * pipeline on child death, src/api.ts:411-422,
  * src/io/json-processor.ts:99-103).
  */
class JqPipeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("healthy subprocess passes lines through") {
    val out = JqPipe.pipeCommand(Iterator("a", "b", "c"), Seq("cat")).toList
    assert(out == List("a", "b", "c"))
  }

  test("nonzero exit after full output fails the iterator, not truncates") {
    val ex = intercept[java.io.IOException] {
      JqPipe.pipeCommand(Iterator("a", "b"), Seq("sh", "-c", "cat; exit 7")).toList
    }
    assert(ex.getMessage.contains("exited with code 7"))
  }

  test("child death mid-stream (broken pipe) fails the iterator") {
    // head -n 1 consumes one line and exits; the feeder hits a broken pipe
    // once the OS pipe buffer fills. Feed enough data to guarantee blocking.
    val many = Iterator.tabulate(200000)(i => "x" * 64 + i)
    intercept[java.io.IOException] {
      JqPipe.pipeCommand(many, Seq("sh", "-c", "head -n 1; exit 9")).toList
    }
  }

  test("jq crash mid-partition fails the Spark task instead of truncating") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"""{"i":$i}""").toDF("line").repartition(2)
    val ex = intercept[SparkException] {
      df.mapPartitions { it =>
        JqPipe.pipeCommand(it.map(_.getString(0)), Seq("sh", "-c", "head -n 3; exit 137"))
      }.count()
    }
    assert(ex.getMessage.contains("137") || ex.getCause != null)
  }

  test("clean empty input spawns nothing and yields nothing") {
    assert(JqPipe.pipeCommand(Iterator.empty, Seq("false")).isEmpty)
  }

  // ---- pooled persistent-jq tier (streaming micro-batches) ----

  test("pooled jq transforms batches and reuses one process across them") {
    val prog = "{v: (.i * 2)}"
    val out1 = JqPool.pipe(Iterator("""{"i":1}""", """{"i":2}"""), prog).toList
    assert(out1 == List("""{"v":2}""", """{"v":4}"""))
    assert(JqPool.poolSize(prog) == 1)
    val out2 = JqPool.pipe(Iterator("""{"i":5}"""), prog).toList
    assert(out2 == List("""{"v":10}"""))
    assert(JqPool.poolSize(prog) == 1) // same process, returned after each batch
  }

  test("pooled jq handles 0..N outputs per input and runtime errors silently") {
    val prog = ".[] | select(. > 1)"
    val out = JqPool.pipe(
      Iterator("[1,2,3]", "5", "[9]"), prog).toList
    assert(out == List("2", "3", "9")) // iterating a number errors -> try() drops it
  }

  test("pooled jq death mid-batch fails the call; next call gets a fresh process") {
    val prog = ".x"
    JqPool.pipe(Iterator("""{"x":1}"""), prog).toList // populate pool
    val killed = new JqPool.PooledJq(prog, None)
    killed.destroy()
    // direct contract: a dead process throws instead of truncating
    intercept[java.io.IOException] {
      killed.proc.waitFor()
      killed.process(Iterator("""{"x":2}"""))
    }
    // the pool itself still serves fresh batches
    val out = JqPool.pipe(Iterator("""{"x":3}"""), prog).toList
    assert(out == List("3"))
  }

  test("pooled jq applies the prelude") {
    val out = JqPool.pipe(Iterator("""{"i":4}"""), "{d: (.i | double)}",
      Some("def double: . * 2;")).toList
    assert(out == List("""{"d":8}"""))
  }
}
