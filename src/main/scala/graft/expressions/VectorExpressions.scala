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

