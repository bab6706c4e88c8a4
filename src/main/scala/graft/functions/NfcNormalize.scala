package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression:
  * `nfc(text)` canonically composes the input (e.g. `e` + COMBINING ACUTE
  * U+0301 → `é` U+00E9), the normalization every real-corpus text pipeline
  * must apply before hashing/tokenizing — byte-identical logical text
  * otherwise lands in different dedup buckets and different token rows.
  *
  * Spark ships no NFC function (SPARK-48730 added collation support, not a
  * normalizer), so this is the §2.J pattern: a `UnaryExpression` wrapping
  * `java.text.Normalizer` with `doGenCode` delegating to a static helper —
  * one virtual call per row inside the scan's whole-stage-codegen span, no
  * UDF serialization wall. The fast path (`Normalizer.isNormalized`, true
  * for all-ASCII) makes the common case allocation-free, which matters on
  * a 100 TB mostly-ASCII corpus.
  *
  * Oracle twin: DuckDB's `nfc_normalize(text)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override def prettyName: String = "nfc"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. ASCII (and any
    * already-composed) input returns the input reference untouched. */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  /** NFC-normalize a string column. */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
