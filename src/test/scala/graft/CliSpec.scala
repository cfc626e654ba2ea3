package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI transport: metadata commands (no Spark session needed) parse,
  * mutate the store, and emit one JSON object per line. */
class CliSpec extends AnyFunSuite {

  private def run(args: String*): Seq[String] = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) { Cli.main(args.toArray) }
    out.toString("UTF-8").linesIterator.toSeq
  }

  test("dataset and model metadata commands round-trip") {
    val root = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val add = run(root, "dataset", "add", "d1", "/tmp/x",
      "nation:n_name,n_nationkey|region:r_name")
    assert(add === Seq("""{"id":1,"name":"d1"}"""))
    val get = run(root, "dataset", "get", "1")
    assert(get.head.contains(""""tables":"nation:n_name,n_nationkey|region:r_name""""))
    assert(run(root, "model", "add", "typer") ===
      Seq("""{"id":1,"state":"Untrained"}"""))
    assert(run(root, "model", "state", "1") ===
      Seq("""{"id":1,"state":"Untrained"}"""))
    assert(run(root, "dataset", "list").length === 1)
    assert(run(root, "dataset", "delete", "1") === Seq("""{"deleted":true}"""))
    assert(run(root, "dataset", "list").isEmpty)
    assert(run(root, "model", "state", "9").head.contains("not found"))
  }
}
