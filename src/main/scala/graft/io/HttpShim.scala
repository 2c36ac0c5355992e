package graft.io

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** S12 — the reference's HTTP JSON serving shim (main.py:6-30): FastAPI
  * routes `/payments` and `/reviews` that read a CSV per request and
  * return it as a JSON array of row objects (an `{"error": ...}` object
  * on failure, still HTTP 200 — main.py:14-22).
  *
  * Spark-first equivalent: each route maps to a DataFrame THUNK evaluated
  * per request (the reference re-reads the file per request; same
  * freshness semantics), serialized with `toJSON` so row objects are
  * keyed by column name exactly like DictReader rows. Serving collects to
  * the driver by design — this is a small-result API shim, not a data
  * plane — but `maxRows` caps the collect so a mis-pointed route cannot
  * OOM the driver.
  *
  * `port = 0` binds an ephemeral port (tests); `Shim.port` reports it.
  */
object HttpShim {

  final case class Shim(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def start(routes: Map[String, () => DataFrame], port: Int = 0,
            maxRows: Int = 100000): Shim = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    routes.foreach { case (path, mk) =>
      server.createContext(s"/$path", handler(mk, maxRows))
    }
    server.setExecutor(null) // serve on the dispatch thread; shim semantics
    server.start()
    Shim(server)
  }

  /** The reference's two routes over CSV files (main.py:8-9, 24-30),
    * parsed with the S1 ingester.
    */
  def csvRoutes(spark: org.apache.spark.sql.SparkSession,
                payments: String, reviews: String)
      : Map[String, () => DataFrame] = Map(
    "payments" -> (() => CsvIngest.readCsv(spark, payments)),
    "reviews" -> (() => CsvIngest.readCsv(spark, reviews)))

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    Option(s).getOrElse("null").foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x") // all controls
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  private def handler(mk: () => DataFrame, maxRows: Int): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          try mk().limit(maxRows).toJSON.collect().mkString("[", ",", "]")
          catch {
            // parity with read_csv's catch-all error object (main.py:21-22)
            case e: Exception =>
              s"""{"error":${jsonQuote(String.valueOf(e.getMessage))}}"""
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }
}
