package graft.cf

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.{IndexedRow, IndexedRowMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed truncated SVD — the reference toolkit's Lanczos app
  * (/root/reference/toolkits/collaborative_filtering/svd.cpp:94-118, the
  * one CF app whose output — a singular spectrum — ALS/NMF factorizations
  * do not produce). Spark's native replacement is
  * `IndexedRowMatrix.computeSVD`: ARPACK's implicitly-restarted Lanczos on
  * the driver, with every A'A·v mat-vec distributed over the row matrix —
  * the same computational shape as the reference's distributed mat-vec +
  * driver-side tridiagonal solve, minus its hand-rolled re-orthogonalization
  * (ortho_repeats, svd.cpp:109) which ARPACK handles internally.
  *
  * The mllib entry point is RDD-based by API contract (no Dataset SVD
  * exists); rows are assembled with one groupByKey over the sparse entries
  * and everything else stays in ARPACK/BLAS.
  */
object Spectral {

  /** Sparse (i, j, value) entries → indexed sparse rows, the single
    * assembly both entry points share (so fixes — e.g. to duplicate-entry
    * handling — cannot diverge between them).
    */
  private def sparseRows(entries: DataFrame, nCols: Int) =
    entries.select(col("i").cast("long"), col("j").cast("int"),
      col("value").cast("double")).rdd
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2))))
      .groupByKey()
      .map { case (i, cs) =>
        IndexedRow(i, OldVectors.sparse(nCols, cs.toSeq.sortBy(_._1)))
      }

  /** Top-k singular values of the sparse matrix `entries` (i, j, value).
    * Returns (rank 1..k, sigma) in descending sigma order.
    *
    * @param nCols column dimension (needed to size the sparse row vectors)
    */
  def svdTopK(entries: DataFrame, k: Int, nCols: Int): DataFrame = {
    val spark = entries.sparkSession
    val (s, _) = svdWithV(entries, k, nCols)
    import spark.implicits._
    s.zipWithIndex.map { case (sv, r) => (r + 1, sv) }.toSeq
      .toDF("rank", "sigma")
  }

  /** Row embeddings U·√Σ of the sparse matrix `entries` (i, j, value) —
    * the NetMF/LSA factorization step (Levy & Goldberg NIPS'14: SVD of a
    * PPMI matrix approximates skip-gram with negative sampling; Qiu et al.
    * WSDM'18 NetMF applies it to walk co-occurrence matrices). Returns
    * (id, embedding float array) with one row per input row index; row
    * indices are preserved (vertex ids ride through, no dense row relabel
    * needed — only columns must be dense, the V matrix lives on the
    * driver at nCols×k).
    */
  def svdEmbed(entries: DataFrame, k: Int, nCols: Int): DataFrame = {
    val spark = entries.sparkSession
    val svd = new IndexedRowMatrix(sparseRows(entries, nCols))
      .computeSVD(k, computeU = true)
    val sq = svd.s.toArray.map(math.sqrt)
    import spark.implicits._
    svd.U.rows
      .map(r => (r.index,
        r.vector.toArray.zip(sq).map { case (u, s) => (u * s).toFloat }))
      .toDF("id", "embedding")
  }

  /** Top singular values AND the dominant right-singular-vector support per
    * component — used by specs to check subspace recovery on planted
    * fixtures (signs are not identifiable, supports are).
    */
  def svdWithV(entries: DataFrame, k: Int, nCols: Int)
      : (Array[Double], org.apache.spark.mllib.linalg.Matrix) = {
    val svd = new IndexedRowMatrix(sparseRows(entries, nCols))
      .computeSVD(k, computeU = false)
    (svd.s.toArray, svd.V)
  }
}
