package org.apache.spark.sql.catalyst.expressions

import org.apache.spark.sql.types._

/** Input-type bridge traits for graft's custom expressions.
  *
  * `AbstractDataType` / `TypeCollection` are `private[sql]`, so expressions
  * living in package `graft.expressions` cannot override
  * `ExpectsInputTypes.inputTypes` directly. These traits (compiled into the
  * Spark namespace, like [[org.apache.spark.sql.GraftColumnBridge]]) provide
  * the override; graft expressions just mix one in. `ImplicitCastInputTypes`
  * then lets Catalyst coerce e.g. `array(1.0, 0.0)` (array<decimal>) to
  * `array<double>` instead of failing analysis.
  */
trait GraftStringInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(StringType)
}

trait GraftStringArrayInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(ArrayType(StringType))
}

/** array<float> passes through untouched (embeddings stay Array[Float]);
  * any other numeric array implicit-casts to array<double>. */
trait GraftVectorInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
}

/** (packed long code, array<double> distance table) for PQ ADC scoring. */
trait GraftPqAdcInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(DoubleType))
}

/** (array<tinyint> codes, double scale) for int8 dequantization. */
trait GraftInt8Input extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), DoubleType)
}

/** Sign-packed 64-bit code words (see graft.expressions.VectorImpl.signPack). */
trait GraftLongArrayInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(ArrayType(LongType))
}

/** Raw shingle strings or pre-hashed 64-bit shingles are both accepted
  * (the hashed form avoids materializing string arrays at scale). */
trait GraftStringOrLongArrayInput extends ImplicitCastInputTypes { self: Expression =>
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(TypeCollection(ArrayType(StringType), ArrayType(LongType)))
}
