package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GraftLongArrayInput, GraftPqAdcInput, GraftVectorInput, UnaryExpression}
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

/** Rademacher (±1) random projection to `outDim` float components —
  * Johnson–Lindenstrauss dimensionality reduction with the Achlioptas
  * construction, signs derived from a splitmix of (seed, k, j) so there
  * is no projection matrix to store or ship. Cosines are preserved to
  * O(1/√outDim); project corpus and queries with the SAME seed. */
case class RandomProject(child: Expression, outDim: Int, seed: Long = 42L)
  extends UnaryExpression with GraftVectorInput {
  require(outDim > 0 && outDim <= 4096, "outDim must be in (0, 4096]")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "random_project"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.randomProject(input.asInstanceOf[ArrayData], isFloat, outDim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.randomProject($c, $isFloat, $outDim, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

/** Symmetric per-vector int8 quantization scale (max|x|/127, double) —
  * pair with [[Int8Quantize]]/[[Int8Dequantize]] to store embeddings at
  * 1 byte/dim instead of 4: at 100 TB of vectors that is the difference
  * between the index fitting the cluster's disks or not, and the re-rank
  * error is bounded by scale/2 per component. Codegen'd, so quantization
  * rides the same WholeStageCodegen span as the scan. */
case class Int8Scale(child: Expression)
  extends UnaryExpression with GraftVectorInput {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_scale"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.int8Scale(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.int8Scale($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): Int8Scale =
    copy(child = newChild)
}

/** Round-to-nearest int8 codes under [[Int8Scale]]'s per-vector scale —
  * array<tinyint>, the 4× storage cut for vector columns. */
case class Int8Quantize(child: Expression)
  extends UnaryExpression with GraftVectorInput {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "int8_quantize"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.int8Quantize(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.int8Quantize($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** 1-bit sign quantization to packed 64-bit words — array<long> of
  * ceil(dim/64) elements, bit (j mod 64) of word (j div 64) set iff
  * component j >= 0. The 32× storage cut below even [[Int8Quantize]]:
  * a 1024-dim float embedding becomes 16 longs, and candidate
  * generation runs on popcount-XOR ([[HammingDistance]]) instead of
  * float math. Codegen'd so packing rides the scan's WholeStageCodegen
  * span. */
case class SignPack(child: Expression)
  extends UnaryExpression with GraftVectorInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_pack"
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.signPack(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.signPack($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** Hamming distance between two [[SignPack]] code arrays: Σ popcount(a_w
  * XOR b_w). For sign-quantized vectors, E[hamming/dim] = θ/π (the
  * hyperplane-LSH collision bound), so ranking by Hamming approximates
  * ranking by angle at 2 bit-ops per 64 dimensions. */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression with GraftLongArrayInput {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.hammingDistance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorImpl.hammingDistance($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Reconstruct float components from int8 codes and their scale:
  * x̂_i = code_i · scale. */
case class Int8Dequantize(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.GraftInt8Input {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "int8_dequantize"
  protected override def nullSafeEval(codes: Any, scale: Any): Any =
    VectorImpl.int8Dequantize(codes.asInstanceOf[ArrayData],
      scale.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, s) =>
      s"graft.expressions.VectorImpl.int8Dequantize($c, $s)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dequantize =
    copy(left = newLeft, right = newRight)
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

/** Product-quantization encode: L2-normalize the vector, split it into
  * `codebooks.length` subvectors, pick each subvector's nearest (L2)
  * centroid from its codebook, and pack the centroid indices into one
  * 64-bit code (8 bits per subspace). At 100 TB this is the memory story:
  * the corpus scan carries an 8-byte code instead of a 256-byte float
  * vector — 32x less I/O — and stays inside whole-stage codegen (the
  * codebooks ride along as a codegen reference object, like
  * [[NearestCentroid]]'s matrix). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with GraftVectorInput {
  require(codebooks.nonEmpty && codebooks.length <= 8,
    "1..8 subspaces fit 8-bit codes in one long")
  require(codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "1..256 centroids per subspace")
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.pqEncode(input.asInstanceOf[ArrayData], isFloat, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.pqEncode($c, $isFloat, $cb)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query asymmetric-distance table: L2-normalize the query, then
  * table[i*ks + c] = dot(q̂_subvector_i, codebooks[i][c]). Computed once
  * per QUERY row (the small side) and broadcast with it; corpus rows then
  * score with [[PqAdcScore]] table lookups only. */
case class PqTable(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression with GraftVectorInput {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_table"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.pqTable(input.asInstanceOf[ArrayData], isFloat, codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.pqTable($c, $isFloat, $cb)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqTable =
    copy(child = newChild)
}

/** ADC score: Σ_i table[i*ks + code_byte_i] ≈ cosine(query, doc) when both
  * sides were L2-normalized at encode/table time. The ANN hot loop — m
  * array reads and adds per (query, doc), no vector math. */
case class PqAdcScore(left: Expression, right: Expression, m: Int, ks: Int)
  extends BinaryExpression with GraftPqAdcInput {
  require(m >= 1 && m <= 8 && ks >= 1 && ks <= 256)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  protected override def nullSafeEval(code: Any, table: Any): Any =
    VectorImpl.pqAdc(code.asInstanceOf[Long], table.asInstanceOf[ArrayData], m, ks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.expressions.VectorImpl.pqAdc($c, $t, $m, $ks)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}


/** Centered linear projection `y = W (x − μ)` with the k×d matrix `W`
  * and mean vector `μ` embedded in the plan as codegen reference objects
  * (same pattern as [[NearestCentroid]]) — the map-only second half of
  * PCA: the expensive part (the covariance) is one [[VectorMomentsAgg]]
  * pass, the eigenbasis is a driver-side O(d³) solve on a d×d matrix,
  * and the projection itself never shuffles. Output `array<double>` of
  * length k. */
case class MatrixProject(child: Expression,
                         means: Array[Double],
                         w: Array[Array[Double]])
  extends UnaryExpression with GraftVectorInput {
  require(w.nonEmpty && w.forall(_.length == means.length),
    "projection rows must match the mean vector's dimension")
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matrix_project"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    VectorImpl.matrixProject(input.asInstanceOf[ArrayData], isFloat, means, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mu = ctx.addReferenceObj("means", means, "double[]")
    val mat = ctx.addReferenceObj("w", w, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorImpl.matrixProject($c, $isFloat, $mu, $mat)")
  }
  override protected def withNewChildInternal(newChild: Expression): MatrixProject =
    copy(child = newChild)
}
