package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** §2.A `rest_source`: a paginated, token-authed, rate-limit-tolerant REST
  * API exposed as a Spark DataSource V2 table — the reference's extract
  * stage (/root/reference/README.md:12-13,:17-18,:33) re-expressed as a
  * first-class Spark source.
  *
  * Scale design: one InputPartition per page range → page fetches fan out
  * across executors; `SupportsPushDownRequiredColumns` prunes the parsed
  * JSON to the needed fields; `SupportsPushDownFilters` translates
  * `event_type = 'x'` into an API query parameter (README.md:13's query
  * params), so filtering happens server-side. Retry with exponential
  * backoff on 429/5xx; credentials come from an env var named in options
  * (never inline — README.md:17-18).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.rest")
  *     .option("url", "http://host/records")
  *     .option("pages", "20").option("pageSize", "50")
  *     .option("authTokenEnv", "API_TOKEN")      // optional
  *     .load()
  * }}}
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RestSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(new CaseInsensitiveStringMap(properties))
}

object RestSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))
}

final class RestTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"rest(${options.get("url")})"
  override def schema(): StructType = RestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(options)
}

final class RestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = RestSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // ONE event_type equality and ONE event_id lower bound become
    // server-side query params (the incremental-extraction pattern:
    // `event_id > last_seen` → &min_id=); everything else — including
    // additional equalities — stays with Spark post-scan so conjunctions
    // like a='x' AND a='y' still evaluate correctly to empty.
    val eq = filters.collectFirst { case f @ EqualTo("event_type", _: String) => f }
    val gt = filters.collectFirst { case f @ GreaterThan("event_id", _: Long) => f }
    pushed = (eq.toSeq ++ gt.toSeq).toArray
    filters.filterNot(f => pushed.contains(f))
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(s: StructType): Unit = {
    requiredSchema = StructType(s.fields.filter(f => RestSource.schema.fieldNames.contains(f.name)))
  }

  override def build(): Scan = new RestScan(options, requiredSchema, pushed)
}

final class RestScan(options: CaseInsensitiveStringMap, requiredSchema: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"RestScan(url=${options.get("url")}, pushed=${pushed.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val pages = options.getInt("pages", 1)
    val perPart = options.getInt("pagesPerPartition", 4)
    (0 until pages by perPart).map { first =>
      RestInputPartition(first, math.min(first + perPart, pages) - 1): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val typeParam = pushed.collectFirst { case EqualTo("event_type", v: String) => v }
    val minIdParam = pushed.collectFirst { case GreaterThan("event_id", v: Long) => v }
    RestReaderFactory(
      options.get("url"),
      options.getInt("pageSize", 100),
      Option(options.get("authTokenEnv")),
      Option(options.get("failMode")),
      options.getInt("maxRetries", 4),
      typeParam,
      minIdParam,
      requiredSchema.fieldNames.toSeq)
  }
}

case class RestInputPartition(firstPage: Int, lastPage: Int) extends InputPartition

case class RestReaderFactory(url: String, pageSize: Int, authTokenEnv: Option[String],
    failMode: Option[String], maxRetries: Int, typeParam: Option[String],
    minIdParam: Option[Long], fields: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestInputPartition]
    new RestPartitionReader(p, this)
  }
}

final class RestPartitionReader(part: RestInputPartition, cfg: RestReaderFactory)
    extends PartitionReader[InternalRow] with Logging {

  private val mapper = new ObjectMapper()
  private var page = part.firstPage
  private var rows: Iterator[JsonNode] = Iterator.empty
  private var current: JsonNode = _

  private def fetchPage(p: Int): Iterator[JsonNode] = {
    val params = Seq(s"page=$p", s"limit=${cfg.pageSize}") ++
      cfg.typeParam.map(t => s"event_type=$t") ++
      cfg.minIdParam.map(m => s"min_id=$m") ++
      cfg.failMode.map(f => s"fail=$f")
    val sep = if (cfg.url.contains("?")) "&" else "?"
    val target = new java.net.URI(cfg.url + sep + params.mkString("&")).toURL
    var attempt = 0
    while (true) {
      val conn = target.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(5000); conn.setReadTimeout(15000)
      cfg.authTokenEnv.flatMap(e => sys.env.get(e)).foreach { tok =>
        conn.setRequestProperty("Authorization", s"Bearer $tok")
      }
      try {
        val code = conn.getResponseCode
        if (code == 200) {
          val body = new String(conn.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val node = mapper.readTree(body) // malformed JSON throws → spec's "invalid response" class
          if (!node.isArray) throw new java.io.IOException(s"expected JSON array, got: $node")
          return node.elements().asScala.toVector.iterator
        } else if ((code == 429 || code >= 500) && attempt < cfg.maxRetries) {
          attempt += 1
          val backoffMs = 50L << attempt // exponential backoff per README.md:33
          logWarning(s"rest_source: HTTP $code on page $p, retry $attempt after ${backoffMs}ms")
          Thread.sleep(backoffMs)
        } else {
          throw new java.io.IOException(s"rest_source: HTTP $code on page $p after $attempt retries")
        }
      } finally conn.disconnect()
    }
    Iterator.empty // unreachable
  }

  override def next(): Boolean = {
    while (!rows.hasNext && page <= part.lastPage) {
      rows = fetchPage(page)
      page += 1
    }
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = {
    val values = cfg.fields.map {
      case "event_id" => java.lang.Long.valueOf(current.get("event_id").asLong())
      case "event_type" => UTF8String.fromString(current.get("event_type").asText())
      case "value" => java.lang.Double.valueOf(current.get("value").asDouble())
    }
    InternalRow.fromSeq(values)
  }

  override def close(): Unit = ()
}
