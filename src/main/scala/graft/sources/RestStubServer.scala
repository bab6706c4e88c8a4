package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** In-JVM HTTP stub for the rest_source connector (FIXTURES.md
  * "Non-parquet fixtures"): serves deterministic JSON pages shaped like the
  * events table, with the reference spec's four failure classes on demand
  * (/root/reference/README.md:33 — invalid response, empty payload, rate
  * limit, connectivity):
  *
  *   GET /records?page=N&limit=M[&event_type=T]   → JSON array of records
  *   &fail=429once   → first hit of each page returns HTTP 429, retry wins
  *   &fail=500once   → same with HTTP 500
  *   &fail=malformed → page 1 body is truncated JSON
  *   &fail=empty     → page 1 is []
  *
  * Record i of page p (id = p·limit + i): deterministic type/value mix —
  * the unit specs recompute the same closed form to assert counts.
  */
object RestStubServer {
  val types = Array("click", "view", "purchase", "signup", "error")

  def recordJson(id: Long): String = {
    val t = types(((id * 2654435761L) % 5).toInt)
    val v = ((id * 1315423911L) % 10000L) / 100.0
    s"""{"event_id": $id, "event_type": "$t", "value": $v}"""
  }

  def expectedType(id: Long): String = types(((id * 2654435761L) % 5).toInt)
  def expectedValue(id: Long): Double = ((id * 1315423911L) % 10000L) / 100.0

  final class Handle(val server: HttpServer, val port: Int) {
    def url: String = s"http://127.0.0.1:$port/records"
    def stop(): Unit = server.stop(0)
  }

  /** total pages served; beyond that → []. */
  def start(totalRows: Long = 1000L): Handle = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val failedOnce = new ConcurrentHashMap[String, Boolean]()
    server.createContext("/records", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        val page = params.getOrElse("page", "0").toLong
        val limit = params.getOrElse("limit", "100").toLong
        val fail = params.getOrElse("fail", "")
        val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        def send(code: Int, body: String): Unit = {
          val bs = body.getBytes(StandardCharsets.UTF_8)
          x.sendResponseHeaders(code, bs.length)
          x.getResponseBody.write(bs); x.close()
        }
        if (params.contains("requireAuth") && auth != s"Bearer ${params("requireAuth")}") {
          send(401, """{"error": "unauthorized"}""")
        } else if ((fail == "429once" || fail == "500once") &&
            failedOnce.putIfAbsent(s"$fail-$page", true) == null) {
          send(if (fail == "429once") 429 else 500, """{"error": "try later"}""")
        } else if (fail == "malformed" && page == 1) {
          send(200, """[{"event_id": 1, "event_ty""")
        } else if (fail == "empty" && page == 1) {
          send(200, "[]")
        } else {
          val start = page * limit
          val end = math.min(start + limit, totalRows)
          val typeFilter = params.get("event_type")
          val minId = params.get("min_id").map(_.toLong)
          val rows = (start until end)
            .filter(id => minId.forall(id > _))
            .map(recordJson)
            .filter(r => typeFilter.forall(t => r.contains(s""""$t"""")))
          send(200, rows.mkString("[", ", ", "]"))
        }
      }
    })
    server.start()
    new Handle(server, server.getAddress.getPort)
  }
}
