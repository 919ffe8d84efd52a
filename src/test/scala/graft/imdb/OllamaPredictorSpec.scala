package graft.imdb

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests of the HTTP predictor's parsing/validation — the
  * network path itself needs an LLM server (absent here; the stub
  * predictor covers pipeline integration). */
class OllamaPredictorSpec extends AnyFunSuite {
  private val p = new OllamaPredictor()

  test("extracts the response field from ollama JSON") {
    assert(p.extractResponse("""{"model":"m","response":"Drama","done":true}""")
      == "Drama")
    assert(p.extractResponse("""{"response":"Sci-Fi"}""") == "Sci-Fi"
      || p.extractResponse("""{"response":"Sci-Fi"}""") == "Sci-Fi")
    assert(p.extractResponse("""{"no_response":1}""") == "unknown")
  }

  test("decodes all JSON escapes, including \\uXXXX") {
    assert(p.extractResponse("""{"response":"Drama"}""") == "Drama")
    assert(p.extractResponse("""{"response":"Sci-Fi"}""") == "Sci-Fi")
    assert(p.extractResponse("""{"response":"War\n"}""") == "War\n")
    assert(p.extractResponse("""{"response":"a\tb\r"}""") == "a\tb\r")
    assert(p.extractResponse("""{"response":"say \"Drama\""}""") == "say \"Drama\"")
    assert(p.extractResponse("""{"response":"back\\slash"}""") == "back\\slash")
    // \uXXXX decodes to the code point (backslash built by concat so
    // Scala's own unicode-escape scanning can't interfere)
    val bs = "\\"
    assert(p.extractResponse("{\"response\":\"" + bs + "u0044rama\"}") == "Drama")
    // malformed \u doesn't crash the executor task
    assert(p.extractResponse("{\"response\":\"" + bs + "uZZZZ\"}").nonEmpty)
  }

  test("normalizes against the whitelist like the reference") {
    assert(p.normalize("Drama") == "Drama")
    assert(p.normalize("  drama \n") == "Drama")
    assert(p.normalize("The genre is Horror.") == "Horror")
    assert(p.normalize("Romantic Comedy") == "Comedy")
    assert(p.normalize("Telenovela") == "unknown")
  }

  test("unreachable server degrades to 'unknown', never throws") {
    val dead = new OllamaPredictor("http://127.0.0.1:1/api/generate",
      timeoutMs = 200)
    val out = dead.predictBatch(Seq(
      Enrichment.MovieMeta("tt1", Some("T"), None, Some(2000), None, None)))
    assert(out == Seq("tt1" -> "unknown"))
  }
}
