package graft.semantic

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper

/** Remote-LLM keyword classifier — the production implementation of the
  * reference's X1 operator (ETL_customer_behavior.py:27-136), completing
  * the [[BatchClassifier]] plumbing with an actual HTTPS client.
  *
  * Protocol: OpenAI-compatible chat-completions JSON (the reference
  * drives the same family of endpoint): one POST per ≤`batchSize`
  * keywords, a prompt pinning the closed 14-category vocabulary, and a
  * JSON-object response body mapping each keyword to its category.
  *
  * Hard rules carried over from the round-1 design review:
  *  - credentials are INJECTED (constructor), never embedded — the
  *    reference ships a live API key in source; this class cannot even
  *    default one;
  *  - OFF by default: nothing in the library constructs it; tests run
  *    against [[MockLlmClassifier]] or a localhost stub, never the
  *    network;
  *  - total function: transport/parse/validation failure degrades every
  *    affected keyword to the `Other` fallback after `maxRetries`
  *    attempts — a classifier outage must not fail a 100 TB job;
  *  - executor-side: instances ride the mapPartitions closure
  *    (Serializable; the HttpClient is transient and rebuilt per
  *    executor), so classification stays distributed exactly like the
  *    mock path.
  */
final class RemoteLlmClassifier(
    endpoint: String,
    apiKey: String,
    model: String,
    override val batchSize: Int = 300,
    maxRetries: Int = 2,
    timeoutMs: Long = 30000L) extends BatchClassifier {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()

  override def classifyBatch(keywords: Seq[String]): Map[String, String] = {
    val fallback = keywords.map(_ -> KeywordClassifier.Fallback).toMap
    if (keywords.isEmpty) return Map.empty
    var attempt = 0
    while (attempt <= maxRetries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(endpoint))
          .timeout(Duration.ofMillis(timeoutMs))
          .header("Content-Type", "application/json")
          .header("Authorization", s"Bearer $apiKey")
          .POST(HttpRequest.BodyPublishers.ofString(
            RemoteLlmClassifier.requestBody(model, keywords)))
          .build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2)
          return fallback ++ RemoteLlmClassifier.parseMapping(resp.body(), keywords)
        // non-2xx: retry (429/5xx transients); fall through
      } catch { case NonFatal(_) => /* transport error: retry */ }
      attempt += 1
    }
    fallback
  }
}

object RemoteLlmClassifier {

  private val mapper = new ObjectMapper()

  /** The classification prompt: closed vocabulary + strict JSON-object
    * output contract (mirrors the reference prompt's shape at
    * ETL_customer_behavior.py:71-85 without reproducing its text). */
  def prompt(keywords: Seq[String]): String = {
    val vocab = KeywordClassifier.Vocabulary.mkString(", ")
    s"""Classify each keyword into exactly one category from this list:
       |$vocab
       |Reply with ONLY a JSON object mapping every keyword to its
       |category, e.g. {"keyword": "category"}. Keywords:
       |${keywords.mkString("\n")}""".stripMargin
  }

  /** OpenAI-compatible chat-completions request body. */
  def requestBody(model: String, keywords: Seq[String]): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", 0.0) // determinism matters more than flair
    val msgs = root.putArray("messages")
    val m = msgs.addObject()
    m.put("role", "user")
    m.put("content", prompt(keywords))
    root.putObject("response_format").put("type", "json_object")
    mapper.writeValueAsString(root)
  }

  /** Extract the keyword→category mapping from a chat-completions
    * response. Only requested keywords survive; categories outside the
    * closed vocabulary degrade to the fallback. Any parse failure →
    * empty map (the caller's fallback fills the gaps). */
  def parseMapping(responseBody: String, keywords: Seq[String]): Map[String, String] = {
    try {
      val content = mapper.readTree(responseBody)
        .path("choices").path(0).path("message").path("content").asText("")
      val obj = mapper.readTree(content)
      if (!obj.isObject) return Map.empty
      val wanted = keywords.toSet
      val vocab = KeywordClassifier.Vocabulary.toSet
      val out = Map.newBuilder[String, String]
      obj.properties().forEach { e =>
        if (wanted.contains(e.getKey)) {
          val cat = e.getValue.asText("")
          out += e.getKey -> (if (vocab.contains(cat)) cat
                              else KeywordClassifier.Fallback)
        }
      }
      out.result()
    } catch { case NonFatal(_) => Map.empty }
  }
}
