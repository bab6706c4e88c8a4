package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 BATCH WRITER: a "document collection" sink modeling the reference
  * spec's load stage (/root/reference/README.md:24,:28 — one collection
  * per connector, documents as JSON) with the full V2 commit protocol,
  * which the engine's other sinks (built-in parquet/jsonl writers) never
  * surface directly:
  *
  *   - executor task → `DocSinkWriter` streams rows as JSON lines into a
  *     STAGING file (`_staging/<uuid>-p<partition>-t<task>.jsonl`); its
  *     `commit()` returns the staged name, `abort()` deletes it — a
  *     speculative or failed task can never leak a visible file;
  *   - driver → `DocSinkBatchWrite.commit()` moves every staged file into
  *     the collection dir and then writes the `_DOC_MANIFEST` LAST (file
  *     list + row count), so a manifest-trusting reader sees the commit
  *     as atomic even on stores without atomic directory rename (the
  *     Iceberg/Delta visibility idea in one file); `abort()` sweeps the
  *     staging dir;
  *   - `SaveMode.Overwrite` arrives as `SupportsTruncate.truncate()`:
  *     previously-committed files are removed inside `commit()` — old
  *     data outlives a FAILED overwrite (truncation is deferred, not
  *     eager).
  *
  * The table declares ACCEPT_ANY_SCHEMA (the noop-sink pattern) and takes
  * the authoritative schema from `LogicalWriteInfo` — a document store
  * has no fixed DDL (README.md:23, SURVEY §1.1 "dynamic/inferred
  * schema"). Supported leaf types are validated at PLAN time in
  * `newWriteBuilder` (same fail-fast posture as RestSource's typed
  * decode), not per-row in executors.
  *
  * Scale shape: one writer per task, append-only streaming writes, no
  * driver data movement — the driver touches file NAMES only (commit
  * messages), never rows. At 100 TB the staging/manifest pattern is
  * exactly what object-store committers do.
  */
class DocSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: there is nothing to infer from an empty collection,
  // and ACCEPT_ANY_SCHEMA means appends never compare against this
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocSinkTable(Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("DocSink requires a path")))
}

final class DocSinkTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"docsink($path)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocSinkWriteBuilder(path, info.schema())
}

final class DocSinkWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  DocSinkJson.validate(schema) // plan-time type gate
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new DocSinkBatchWrite(path, schema, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!doTruncate, "streaming DocSink is append-only (no complete/truncate mode)")
      new DocSinkStreamingWrite(path, schema)
    }
  }
}

final case class DocStaged(file: String, rows: Long) extends WriterCommitMessage

final class DocSinkBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DocSinkWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) { // deferred truncation: old data survives a failed write
      eachFile(dir)(p =>
        if (p.getFileName.toString.endsWith(".jsonl") ||
          p.getFileName.toString == "_DOC_MANIFEST") Files.deleteIfExists(p))
    }
    val staged = messages.collect { case DocStaged(f, n) => (f, n) }
    staged.foreach { case (f, _) =>
      Files.move(dir.resolve("_staging").resolve(f), dir.resolve(f),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // manifest LAST: its existence IS the commit for strict readers
    val manifest = staged.map { case (f, n) => s"$f\t$n" }
      .mkString("", "\n", s"\ntotal\t${staged.map(_._2).sum}\n")
    Files.write(dir.resolve("_DOC_MANIFEST"),
      manifest.getBytes(StandardCharsets.UTF_8))
    sweepStaging(dir) // leftovers from aborted speculative tasks
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepStaging(Paths.get(path)) // nothing visible was ever published

  private def sweepStaging(dir: Path): Unit = {
    val st = dir.resolve("_staging")
    if (Files.isDirectory(st)) {
      eachFile(st)(Files.deleteIfExists(_))
      Files.deleteIfExists(st)
    }
  }

  private def eachFile(dir: Path)(f: Path => Unit): Unit = {
    val s = Files.list(dir)
    try s.iterator().asScala.foreach(f) finally s.close()
  }
}

final class DocSinkWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocSinkWriter(path, schema, partitionId, taskId)
}

/** Streaming flavor of the same protocol: per-EPOCH commits. The epoch
  * manifest (`_DOC_MANIFEST_e<id>`, written last) doubles as the replay
  * guard — after a checkpoint restart Spark may re-commit the last epoch,
  * and an existing manifest turns that replay into a no-op (staged
  * leftovers are swept, nothing is re-published): idempotent commit +
  * replayed source offsets = the standard exactly-once sink recipe. */
final class DocSinkStreamingWrite(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new DocSinkStreamingWriterFactory(path, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val manifest = dir.resolve(s"_DOC_MANIFEST_e$epochId")
    val staged = messages.collect { case DocStaged(f, n) => (f, n) }
    if (Files.exists(manifest)) { // replayed epoch: already published
      staged.foreach { case (f, _) =>
        Files.deleteIfExists(dir.resolve("_staging").resolve(f))
      }
      return
    }
    staged.foreach { case (f, _) =>
      Files.move(dir.resolve("_staging").resolve(f), dir.resolve(f),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val body = staged.map { case (f, n) => s"$f\t$n" }
      .mkString("", "\n", s"\ntotal\t${staged.map(_._2).sum}\n")
    Files.write(manifest, body.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case DocStaged(f, _) => f }.foreach { f =>
      Files.deleteIfExists(Paths.get(path).resolve("_staging").resolve(f))
    }
}

/** Named top-level factory: ships to executors, so it must be free of any
  * reference back to the driver-side StreamingWrite. */
final class DocSinkStreamingWriterFactory(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DocSinkWriter(path, schema, partitionId, taskId, s"e$epochId-")
}

final class DocSinkWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long, prefix: String = "") extends DataWriter[InternalRow] {
  private val name =
    s"$prefix${java.util.UUID.randomUUID().toString.take(8)}-p$partitionId-t$taskId.jsonl"
  private val staging = {
    val st = Paths.get(path).resolve("_staging")
    Files.createDirectories(st)
    st.resolve(name)
  }
  private val out = Files.newBufferedWriter(staging, StandardCharsets.UTF_8,
    StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    out.write(DocSinkJson.renderRow(row, schema)); out.write('\n'); rows += 1
  }
  override def commit(): WriterCommitMessage = { out.close(); DocStaged(name, rows) }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(staging) }
  override def close(): Unit = ()
}

/** Deterministic JSON rendering of Catalyst internal values — primitives,
  * struct/array, string-keyed map; timestamps as ISO-8601 µs UTC. */
private[sources] object DocSinkJson {
  def validate(dt: DataType): Unit = dt match {
    case s: StructType => s.fields.foreach(f => validate(f.dataType))
    case a: ArrayType => validate(a.elementType)
    case m: MapType =>
      require(m.keyType == StringType, s"DocSink map keys must be STRING, got ${m.keyType}")
      validate(m.valueType)
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
         BooleanType | StringType | TimestampType | DateType | _: DecimalType => ()
    case other =>
      throw new IllegalArgumentException(s"DocSink does not support type $other")
  }

  def renderRow(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(", ")
      str(sb, schema(i).name)
      sb.append(": ")
      if (row.isNullAt(i)) sb.append("null")
      else value(sb, row.get(i, schema(i).dataType), schema(i).dataType)
      i += 1
    }
    sb.append('}')
    sb.toString
  }

  private def value(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = dt match {
    case StringType => str(sb, v.asInstanceOf[UTF8String].toString)
    case LongType | IntegerType | ShortType | ByteType | BooleanType => sb.append(v.toString)
    case DoubleType | FloatType => sb.append(v.toString)
    case d: DecimalType =>
      sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString)
    case TimestampType => // stored as µs since epoch
      str(sb, java.time.Instant.EPOCH.plus(v.asInstanceOf[Long],
        java.time.temporal.ChronoUnit.MICROS).toString)
    case DateType =>
      str(sb, java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case st: StructType =>
      sb.append(renderRow(v.asInstanceOf[InternalRow], st))
    case at: ArrayType =>
      val arr = v.asInstanceOf[ArrayData]
      sb.append('[')
      var i = 0
      while (i < arr.numElements()) {
        if (i > 0) sb.append(", ")
        if (arr.isNullAt(i)) sb.append("null")
        else value(sb, arr.get(i, at.elementType), at.elementType)
        i += 1
      }
      sb.append(']')
    case mt: MapType =>
      val m = v.asInstanceOf[MapData]
      sb.append('{')
      var i = 0
      while (i < m.numElements()) {
        if (i > 0) sb.append(", ")
        str(sb, m.keyArray().getUTF8String(i).toString)
        sb.append(": ")
        if (m.valueArray().isNullAt(i)) sb.append("null")
        else value(sb, m.valueArray().get(i, mt.valueType), mt.valueType)
        i += 1
      }
      sb.append('}')
    case other => throw new IllegalStateException(s"unvalidated type $other")
  }

  private def str(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
