package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Plan-time schema validation + the per-type JSON decoders
  * (ADVICE r2: FLOAT/DATE/TIMESTAMP/DECIMAL DDL used to pass planning and
  * throw UnsupportedOperationException per-row inside executors). */
class RestTypesSpec extends AnyFunSuite {

  private def node(json: String) = RestSource.mapper.readTree(json)

  test("validateSchema accepts every decodable type, nested included") {
    RestSource.validateSchema(StructType.fromDDL(
      "id BIGINT, n INT, s SMALLINT, b TINYINT, x DOUBLE, f FLOAT, " +
        "p DECIMAL(12,2), ok BOOLEAN, t STRING, d DATE, ts TIMESTAMP, " +
        "meta STRUCT<k: STRING, score: FLOAT>, tags ARRAY<DATE>"))
  }

  test("validateSchema rejects undecodable types with the field path") {
    val e = intercept[IllegalArgumentException] {
      RestSource.validateSchema(StructType.fromDDL(
        "id BIGINT, payload BINARY, meta STRUCT<m: MAP<STRING, STRING>>"))
    }
    assert(e.getMessage.contains("payload"))
    assert(e.getMessage.contains("meta.m"))
  }

  test("FLOAT / SMALLINT / TINYINT decode; mismatches null out") {
    assert(RestSource.toCatalyst(node("2.5"), FloatType) === 2.5f)
    assert(RestSource.toCatalyst(node("12"), ShortType) === 12.toShort)
    assert(RestSource.toCatalyst(node("3"), ByteType) === 3.toByte)
    assert(RestSource.toCatalyst(node("\"n/a\""), FloatType) === null)
  }

  test("DECIMAL decodes exactly; precision overflow nulls out") {
    val d = RestSource.toCatalyst(node("12345.678"), DecimalType(12, 2))
      .asInstanceOf[Decimal]
    assert(d.toJavaBigDecimal === new java.math.BigDecimal("12345.68"))
    assert(RestSource.toCatalyst(node("1e30"), DecimalType(12, 2)) === null)
  }

  test("DATE decodes ISO-8601 days; junk nulls out") {
    val days = RestSource.toCatalyst(node("\"2024-03-01\""), DateType)
    assert(days === java.time.LocalDate.parse("2024-03-01").toEpochDay.toInt)
    assert(RestSource.toCatalyst(node("\"soon\""), DateType) === null)
    assert(RestSource.toCatalyst(node("17897"), DateType) === null) // numbers are ambiguous → null
  }

  test("TIMESTAMP decodes ISO instants, space-separated UTC, and epoch millis") {
    val instant = java.time.Instant.parse("2024-03-01T10:30:00Z")
    val micros = instant.getEpochSecond * 1000000L
    assert(RestSource.toCatalyst(node("\"2024-03-01T10:30:00Z\""), TimestampType) === micros)
    assert(RestSource.toCatalyst(node("\"2024-03-01 10:30:00\""), TimestampType) === micros)
    assert(RestSource.toCatalyst(node(instant.toEpochMilli.toString), TimestampType) === micros)
    assert(RestSource.toCatalyst(node("\"not a time\""), TimestampType) === null)
  }

  test("STRING of a non-textual node keeps the raw JSON") {
    assert(RestSource.toCatalyst(node("""{"a":1}"""), StringType) ===
      UTF8String.fromString("""{"a":1}"""))
  }
}
