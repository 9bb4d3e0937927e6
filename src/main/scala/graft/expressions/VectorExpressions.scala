package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GraftVectorInput, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit random-hyperplane (Rademacher) signature for cosine LSH
  * (Charikar '02): bit i = sign(Σ_j v_j · r_ij), r_ij ∈ {−1,+1} derived
  * from a splitmix of (seed, i, j) — no plane matrix to store or ship, so
  * executors need zero broadcast state. Two vectors at cosine angle θ
  * disagree on each bit with probability θ/π. */
case class HyperplaneSignature64(child: Expression, seed: Long = 42L)
  extends UnaryExpression with GraftVectorInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig64"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.hyperplaneSig(input.asInstanceOf[ArrayData], isFloat, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.hyperplaneSig($c, $isFloat, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature64 =
    copy(child = newChild)
}

/** Index of the max-cosine centroid for a vector — the IVF assignment hot
  * loop. The (small) centroid matrix rides along as a codegen reference
  * object, so every corpus row is assigned inside whole-stage codegen with
  * zero shuffle and zero broadcast plumbing; ties break to the lowest
  * centroid index. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with GraftVectorInput {
  require(centroids.nonEmpty, "need at least one centroid")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.nearestCentroid(input.asInstanceOf[ArrayData], isFloat, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.nearestCentroid($c, $isFloat, $cents)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

