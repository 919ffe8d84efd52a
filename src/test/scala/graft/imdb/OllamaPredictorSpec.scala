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
