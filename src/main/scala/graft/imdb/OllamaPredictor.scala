package graft.imdb

import graft.imdb.Enrichment.{GenrePredictor, MovieMeta, MovieGenres}

/** M8's real LLM path: genre prediction via an ollama-compatible HTTP
  * endpoint (reference: llm_predictor.py:63-137). Offline environments
  * use [[Enrichment.StubPredictor]]; this implementation exists for
  * API parity and deployments with an LLM server reachable.
  *
  * Differences from the reference, by design:
  *  - runs INSIDE executor tasks (shipped via mapPartitions), so calls
  *    parallelize across partitions instead of serializing on the
  *    driver (SURVEY X3 fix);
  *  - one prompt per movie like the reference (llm_predictor.py:88-94
  *    batches only to log progress), but connection reuse per batch;
  *  - responses validated against the genre whitelist -> 'unknown'
  *    (llm_predictor.py:183-195), same as every other predictor.
  */
class OllamaPredictor(
    url: String = "http://localhost:11434/api/generate",
    model: String = "gemma3:4b",
    timeoutMs: Int = 30000) extends GenrePredictor {

  /** Prompt mirrors llm_predictor.py:153-164: movie metadata in, one
    * genre out of the fixed list. */
  private def prompt(m: MovieMeta): String = {
    val genres = MovieGenres.mkString(", ")
    s"""Classify the movie into exactly one genre from this list:
       |$genres.
       |Title: ${m.primaryTitle.getOrElse("unknown")}
       |Original title: ${m.originalTitle.getOrElse("unknown")}
       |Year: ${m.startYear.map(_.toString).getOrElse("unknown")}
       |Runtime minutes: ${m.runtimeMinutes.map(_.toString).getOrElse("unknown")}
       |Number of votes: ${m.numVotes.map(_.toString).getOrElse("unknown")}
       |Answer with the genre name only.""".stripMargin
  }

  override def predictBatch(batch: Seq[MovieMeta]): Seq[(String, String)] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    batch.map { m =>
      val genre =
        try {
          val body =
            s"""{"model": ${quote(model)}, "prompt": ${quote(prompt(m))},
               | "stream": false}""".stripMargin
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(url))
            .timeout(java.time.Duration.ofMillis(timeoutMs))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          extractResponse(resp.body())
        } catch { case _: Exception => "unknown" }
      m.tconst -> normalize(genre)
    }
  }

  /** Pull the "response" field out of ollama's JSON reply without a
    * JSON library (none on the unmanaged classpath guaranteed). All
    * JSON escapes are decoded — including \uXXXX, which a naive
    * take-next-char branch would turn into literal 'uXXXX' garbage
    * that then mis-normalizes to 'unknown'. */
  private[imdb] def extractResponse(json: String): String = {
    val key = "\"response\""
    val i = json.indexOf(key)
    if (i < 0) return "unknown"
    val start = json.indexOf('"', i + key.length + 1)
    if (start < 0) return "unknown"
    val sb = new StringBuilder
    var j = start + 1
    while (j < json.length && json(j) != '"') {
      if (json(j) == '\\' && j + 1 < json.length) {
        json(j + 1) match {
          case 'u' if j + 5 < json.length =>
            try {
              sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
              j += 6
            } catch { case _: NumberFormatException => sb.append('�'); j += 2 }
          case 'n' => sb.append('\n'); j += 2
          case 't' => sb.append('\t'); j += 2
          case 'r' => sb.append('\r'); j += 2
          case 'b' => sb.append('\b'); j += 2
          case 'f' => sb.append('\f'); j += 2
          case c => sb.append(c); j += 2 // \" \\ \/ decode to themselves
        }
      } else { sb.append(json(j)); j += 1 }
    }
    sb.toString
  }

  /** Whitelist validation with the reference's case-insensitive
    * containment fallback (llm_predictor.py:183-195). */
  private[imdb] def normalize(raw: String): String = {
    val t = raw.trim
    MovieGenres.find(_.equalsIgnoreCase(t))
      .orElse(MovieGenres.find(g => t.toLowerCase.contains(g.toLowerCase)))
      .getOrElse("unknown")
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
