package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GraftVectorInput}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running second-moment summary of a vector column: count, per-component
  * sums, and the upper triangle of the component-product sums (Σ xᵢxⱼ,
  * row-major). This is THE distributed primitive under covariance / Gram
  * matrices / PCA: each task folds its vectors into one d + d(d+1)/2
  * double buffer (map-side combine), partials merge by element-wise
  * addition, and the corpus never leaves the executors — only the O(d²)
  * summary does. Contrast with the declarative alternative (explode the
  * vector twice, groupBy (i,j)), which shuffles n·d² rows: at d = 64
  * that is 4096 shuffled rows PER VECTOR versus one fixed-size buffer
  * per task here.
  */
final class VectorMoments {
  var d: Int = -1
  var n: Long = 0L
  var sums: Array[Double] = _
  var prods: Array[Double] = _ // upper triangle, row-major

  private def init(dim: Int): Unit = {
    d = dim
    sums = new Array[Double](dim)
    prods = new Array[Double](dim * (dim + 1) / 2)
  }

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val dim = v.numElements()
    if (d < 0) init(dim)
    require(dim == d,
      s"ragged vector column: saw dims $d and $dim — covariance over " +
        "mixed-dimension vectors is undefined; filter or pad first")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      sums(i) += x(i)
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        prods(k) += x(i) * x(j)
        k += 1
        j += 1
      }
      i += 1
    }
    n += 1L
  }

  def merge(o: VectorMoments): Unit = {
    if (o.d < 0) return
    if (d < 0) init(o.d)
    require(o.d == d,
      s"ragged vector column across partitions: dims $d vs ${o.d}")
    var i = 0
    while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
    i = 0
    while (i < prods.length) { prods(i) += o.prods(i); i += 1 }
    n += o.n
  }
}

/** `vector_moments(vec)` — aggregate over `array<float|double>` returning
  * `struct<n: long, sums: array<double>,
  *         pairs: array<struct<i: int, j: int, sxy: double>>>`
  * with one `pairs` entry per upper-triangle (i ≤ j) component pair.
  * NULL vectors are skipped; an all-NULL (or empty) input yields a NULL
  * struct, which explodes to zero rows downstream. */
case class VectorMomentsAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMoments] with GraftVectorInput {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_moments"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sxy", DoubleType, nullable = false))),
      containsNull = false))))

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): VectorMoments = new VectorMoments

  override def update(buf: VectorMoments, input: InternalRow): VectorMoments = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], isFloat)
    buf
  }

  override def merge(buf: VectorMoments, other: VectorMoments): VectorMoments = {
    buf.merge(other); buf
  }

  override def eval(buf: VectorMoments): Any = {
    if (buf.d < 0) return null
    val pairs = new Array[Any](buf.prods.length)
    var k = 0
    var i = 0
    while (i < buf.d) {
      var j = i
      while (j < buf.d) {
        pairs(k) = InternalRow(i, j, buf.prods(k))
        k += 1
        j += 1
      }
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(buf.sums.map(x => x: Any)),
      new GenericArrayData(pairs))
  }

  override def serialize(buf: VectorMoments): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    if (buf.d >= 0) {
      out.writeLong(buf.n)
      var i = 0
      while (i < buf.sums.length) { out.writeDouble(buf.sums(i)); i += 1 }
      i = 0
      while (i < buf.prods.length) { out.writeDouble(buf.prods(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMoments = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VectorMoments
    val d = in.readInt()
    if (d >= 0) {
      buf.d = d
      buf.n = in.readLong()
      buf.sums = new Array[Double](d)
      buf.prods = new Array[Double](d * (d + 1) / 2)
      var i = 0
      while (i < buf.sums.length) { buf.sums(i) = in.readDouble(); i += 1 }
      i = 0
      while (i < buf.prods.length) { buf.prods(i) = in.readDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMomentsAgg =
    copy(child = newChildren.head)
}
