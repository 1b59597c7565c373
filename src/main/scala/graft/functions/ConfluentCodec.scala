package graft.functions

import java.io.ByteArrayOutputStream

import scala.collection.concurrent.TrieMap

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.{ConfluentWire, FileSchemaRegistry}

/** CONFLUENT-FRAMED codecs — the registry seam
  * ([[graft.streaming.SchemaRegistryClient]]) lifted into Catalyst so a
  * mixed-schema-version "topic" is encoded and decoded INSIDE one
  * whole-stage-codegen'd plan:
  *
  *  - [[ToConfluentOrderV1]]/[[ToConfluentOrderV2]] write a row under
  *    the v1 (float price) or v2 (double price + currency) writer
  *    schema and frame it `0x00 + int32 schemaId + avro` — the
  *    producer half, one expression per registered writer version.
  *  - [[FromConfluentOrder]] unframes, looks the WRITER schema up BY
  *    ID in the (executor-local) file registry, and resolves it
  *    against the v2 READER — so one consumer expression reads every
  *    version on the wire, exactly what the registry exists for.
  *
  * The registry directory is a local path here (local[32]); at cluster
  * scale the lookup client is the HTTP registry — the expression shape
  * (id → cached reader) is identical, and per-id readers are cached in
  * a TrieMap so the registry is touched once per (executor, id), not
  * per row.
  */
object ConfluentOrderCodec {
  /** Per-JVM (registryDir, schemaId) → resolving reader cache. */
  private val readerCache =
    TrieMap.empty[(String, Int), GenericDatumReader[GenericRecord]]

  private[graft] def readerFor(registryDir: String,
      schemaId: Int): GenericDatumReader[GenericRecord] =
    readerCache.getOrElseUpdate((registryDir, schemaId), {
      val writer = new FileSchemaRegistry(registryDir).byId(schemaId)
      new GenericDatumReader[GenericRecord](writer, AvroOrder.schemaV2)
    })
}

/** struct<orderId,product,price:float,timestamp> → framed v1 payload. */
case class ToConfluentOrderV1(child: Expression, schemaId: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](AvroOrder.schema)

  def encode(row: InternalRow): Array[Byte] = {
    val rec = new GenericData.Record(AvroOrder.schema)
    rec.put(0, new Utf8(row.getUTF8String(0).toString))
    rec.put(1, new Utf8(row.getUTF8String(1).toString))
    rec.put(2, java.lang.Float.valueOf(row.getFloat(2)))
    rec.put(3, java.lang.Long.valueOf(row.getLong(3)))
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    ConfluentWire.frame(schemaId, out.toByteArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toConfluentV1", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode((org.apache.spark.sql.catalyst.InternalRow) $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ToConfluentOrderV1 = copy(child = newChild)
}

/** struct<orderId,product,price:double,timestamp,currency> → framed v2
  * payload. */
case class ToConfluentOrderV2(child: Expression, schemaId: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](AvroOrder.schemaV2)

  def encode(row: InternalRow): Array[Byte] = {
    val rec = new GenericData.Record(AvroOrder.schemaV2)
    rec.put(0, new Utf8(row.getUTF8String(0).toString))
    rec.put(1, new Utf8(row.getUTF8String(1).toString))
    rec.put(2, java.lang.Double.valueOf(row.getDouble(2)))
    rec.put(3, java.lang.Long.valueOf(row.getLong(3)))
    rec.put(4, new Utf8(row.getUTF8String(4).toString))
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    ConfluentWire.frame(schemaId, out.toByteArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toConfluentV2", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode((org.apache.spark.sql.catalyst.InternalRow) $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ToConfluentOrderV2 = copy(child = newChild)
}

/** Framed payload (ANY registered writer version) → v2-reader struct
  * via registry lookup + Avro schema resolution. */
case class FromConfluentOrder(child: Expression, registryDir: String)
    extends UnaryExpression {

  override def dataType: DataType = AvroOrder.sparkTypeV2

  def decode(bytes: Array[Byte]): InternalRow = {
    val (id, payload) = ConfluentWire.unframe(bytes)
    val reader = ConfluentOrderCodec.readerFor(registryDir, id)
    val dec = DecoderFactory.get().binaryDecoder(payload, null)
    val rec = reader.read(null, dec)
    InternalRow(
      UTF8String.fromString(rec.get(0).toString),
      UTF8String.fromString(rec.get(1).toString),
      rec.get(2).asInstanceOf[Double],
      rec.get(3).asInstanceOf[Long],
      UTF8String.fromString(rec.get(4).toString))
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fromConfluent", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.decode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FromConfluentOrder = copy(child = newChild)
}

object ToConfluentOrderV1 {
  def apply(c: org.apache.spark.sql.Column,
      schemaId: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(ToConfluentOrderV1(
      org.apache.spark.sql.GraftSqlShim.expression(c), schemaId))
}

object ToConfluentOrderV2 {
  def apply(c: org.apache.spark.sql.Column,
      schemaId: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(ToConfluentOrderV2(
      org.apache.spark.sql.GraftSqlShim.expression(c), schemaId))
}

object FromConfluentOrder {
  def apply(c: org.apache.spark.sql.Column,
      registryDir: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShim.column(FromConfluentOrder(
      org.apache.spark.sql.GraftSqlShim.expression(c), registryDir))
}
