package org.apache.spark.sql.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.types.DataType

/** Package-access bridge to Spark's bundled Avro machinery.
  *
  * Spark 4 ships the whole Avro FILE source inside spark-sql
  * (AvroFileFormat, AvroSerializer/AvroDeserializer, SchemaConverters) but
  * not the column-codec expressions — `CatalystDataToAvro` /
  * `AvroDataToCatalyst` stay in the external spark-avro module, and the
  * built-in `to_avro`/`from_avro` SQL functions hard-error without it.
  * The bundled helpers are `private[sql]`, so this object — compiled into
  * the avro package like graft's other namespace shims (SURVEY.md §7.4) —
  * exposes exactly the surface graft.expressions.AvroCodecs needs to
  * implement the codecs natively (reference avro.py:326,430).
  */
object GraftAvroBridge {
  /** Format string for DataFrame read/write: Spark's short-name lookup
    * hard-errors on "avro" (assuming the external module is missing), but
    * the V1 file-format class itself ships in spark-sql and works. */
  val fileFormatClass = "org.apache.spark.sql.avro.AvroFileFormat"

  def avroJsonFor(dataType: DataType, nullable: Boolean): String =
    SchemaConverters.toAvroType(dataType, nullable).toString
  def sqlTypeFor(jsonSchema: String): DataType =
    SchemaConverters.toSqlType(new Schema.Parser().parse(jsonSchema)).dataType

  /** Catalyst value → Avro binary. One instance per expression; single
    * task thread at a time, like Spark's own codec expressions. Holds only
    * (dataType, schema JSON) across serialization. */
  final class RowEncoder(dataType: DataType, jsonSchema: String)
    extends Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(jsonSchema)
    @transient private lazy val serializer =
      new AvroSerializer(dataType, schema, false)
    @transient private lazy val writer = new GenericDatumWriter[Any](schema)
    @transient private lazy val out = new ByteArrayOutputStream
    @transient private var enc: BinaryEncoder = _
    def encode(catalyst: Any): Array[Byte] = {
      out.reset()
      enc = EncoderFactory.get().directBinaryEncoder(out, enc)
      writer.write(serializer.serialize(catalyst), enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** Avro binary → Catalyst value (InternalRow for record schemas). */
  final class RowDecoder(jsonSchema: String, dataType: DataType)
    extends Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(jsonSchema)
    @transient private lazy val reader = new GenericDatumReader[Any](schema)
    @transient private lazy val deserializer =
      new AvroDeserializer(schema, dataType, "CORRECTED", false, "", -1)
    @transient private var dec: BinaryDecoder = _
    def decode(bytes: Array[Byte]): Any = {
      dec = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, dec)
      deserializer.deserialize(reader.read(null, dec)).orNull
    }
  }
}
