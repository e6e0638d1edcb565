package graft.semantic

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for the remote-LLM classifier — a LOCALHOST stub
  * server plays the model endpoint; nothing here touches the network. */
class RemoteLlmClassifierSpec extends SparkSpec {

  private def chatResponse(mapping: Map[String, String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val content = mapper.writeValueAsString {
      val o = mapper.createObjectNode()
      mapping.foreach { case (k, v) => o.put(k, v) }
      o
    }
    val root = mapper.createObjectNode()
    val msg = root.putArray("choices").addObject().putObject("message")
    msg.put("role", "assistant")
    msg.put("content", content)
    mapper.writeValueAsString(root)
  }

  /** Serve `body` for every POST, recording auth headers + request count. */
  private def withServer(status: Int, body: String)
                        (f: (String, AtomicInteger, java.util.List[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    val auths = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    server.createContext("/v1/chat", { exchange =>
      calls.incrementAndGet()
      auths.add(exchange.getRequestHeaders.getFirst("Authorization"))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(status, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat", calls, auths)
    finally server.stop(0)
  }

  test("request body carries model, vocabulary and every keyword; parse round-trips") {
    val body = RemoteLlmClassifier.requestBody("test-model", Seq("vtv go", "phim ma"))
    assert(body.contains("test-model"))
    assert(body.contains("vtv go") && body.contains("phim ma"))
    KeywordClassifier.Vocabulary.foreach(v => assert(body.contains(v)))

    val resp = chatResponse(Map("vtv go" -> "TV Channel", "phim ma" -> "Horror"))
    val m = RemoteLlmClassifier.parseMapping(resp, Seq("vtv go", "phim ma"))
    assert(m == Map("vtv go" -> "TV Channel", "phim ma" -> "Horror"))
  }

  test("out-of-vocabulary categories and unrequested keys are sanitized") {
    val resp = chatResponse(Map("a" -> "Made Up Genre", "mystery" -> "Drama"))
    val m = RemoteLlmClassifier.parseMapping(resp, Seq("a"))
    assert(m == Map("a" -> KeywordClassifier.Fallback)) // OOV -> Other, "mystery" dropped
    assert(RemoteLlmClassifier.parseMapping("not json", Seq("a")).isEmpty)
  }

  test("end-to-end against a stub endpoint: distributed batches, bearer auth") {
    val mapping = Map("vtv hd" -> "TV Channel", "phim hay" -> "Drama",
                      "bong da" -> "Sports")
    withServer(200, chatResponse(mapping)) { (url, calls, auths) =>
      val clf = new RemoteLlmClassifier(url, "secret-key", "test-model", batchSize = 2)
      val df = spark.createDataFrame(Seq(
        (1, "vtv hd"), (2, "phim hay"), (3, "bong da"), (4, "vtv hd")
      )).toDF("id", "keyword")
      val out = clf.applyDistinct(spark, df, "keyword", "category")
        .select("id", "category").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(out == Map(1 -> "TV Channel", 2 -> "Drama", 3 -> "Sports", 4 -> "TV Channel"))
      assert(calls.get() >= 2) // 3 distinct keywords, batchSize 2
      auths.forEach(a => assert(a == "Bearer secret-key"))
    }
  }

  test("server failure degrades every keyword to the fallback, after retries") {
    withServer(500, "oops") { (url, calls, _) =>
      val clf = new RemoteLlmClassifier(url, "k", "m", maxRetries = 1)
      val m = clf.classifyBatch(Seq("x", "y"))
      assert(m == Map("x" -> "Other", "y" -> "Other"))
      assert(calls.get() == 2) // initial + 1 retry
    }
  }
}
