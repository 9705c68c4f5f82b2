package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product quantization for embedding compression (Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011): split each D-dim vector into `m` subvectors, vector-quantize
  * each subspace against its own `ksub`-centroid codebook, and store the
  * vector as `m` small codes — `m·log2(ksub)` bits instead of `32·D`
  * (64-dim float32 → 4 bytes at m=4/ksub=16, a 64× compression). The
  * complement of [[graft.functions.VectorFunctions]]' int8 scalar
  * quantization (x23): PQ is the codebook axis vector stores actually
  * ship, and its codes are what IVF-PQ indexes scan.
  *
  * Scale shape: codebooks are trained per-subspace with
  * [[Similarity.trainKMeans]] (driver-held k×(D/m) centroids, one hash
  * aggregation per iteration — bounded index metadata, like IVF's
  * centroid table); encoding, reconstruction, and scoring are per-row
  * expressions against BROADCAST codebook literals — zero shuffle, no
  * join, linear in the corpus. Nothing here is quadratic in anything. */
object Pq {

  /** Train the `m` per-subspace codebooks — [[Similarity.trainKMeans]]'s
    * deterministic cosine-geometry Lloyd's, per subspace, but JOINTLY:
    * every iteration is ONE job that assigns all m subspaces (posexplode
    * to (j, subvector) — m× the rows at 1/m the width, same bytes) and
    * reduces all m·ksub partial sums in one shuffle, instead of m
    * separate scans per iteration. Per-subspace semantics are identical
    * to calling trainKMeans on each slice (same lowest-id init, same
    * first-max tie-break, empty cells keep their centroid) — PqSpec's
    * exact-roundtrip case pins that. Returns driver-held codebooks:
    * `codebooks(j)(c)` = subspace j's centroid c, index metadata of
    * m·ksub·(D/m) floats. `dim` must divide evenly by `m`. */
  def trainCodebooks(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int,
      iters: Int = 5): IndexedSeq[IndexedSeq[Seq[Float]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val training = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .cache()
    var books: IndexedSeq[IndexedSeq[Array[Float]]] = {
      val init = training.orderBy(col("__id")).limit(ksub).collect()
        .map(_.getSeq[Float](1).toArray)
      (0 until m).map(j =>
        init.map(v => v.slice(j * sub, (j + 1) * sub)).toIndexedSeq)
    }
    for (_ <- 0 until iters) {
      val unit: Seq[Seq[Seq[Float]]] = books.map(_.map { v =>
        val n = math.max(math.sqrt(v.map(x => x.toDouble * x).sum), 1e-12)
        v.map(x => (x / n).toFloat).toSeq
      }.toSeq).toSeq
      // ONE native PqCodes call per row assigns all m subspaces (the
      // posexplode-then-per-centroid-HOF form paid an interpreted dot
      // per codebook entry per exploded row); the slice feeding the
      // partial-sum agg reproduces the per-subspace rows exactly.
      val sums = training
        .withColumn("codes", graft.expressions.VectorExpressions
          .pqCodes(col("__v"), unit.map(_.toIndexedSeq).toIndexedSeq, sub))
        .select(col("__v"), posexplode(col("codes")).as(Seq("j", "cell")))
        .withColumn("sv", slice(col("__v"), col("j") * sub + 1, lit(sub)))
        .groupBy(col("j"), col("cell"))
        .agg(graft.expressions.VectorExpressions.floatVecSum(col("sv")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        (r.getInt(0), r.getInt(1)) ->
          r.getSeq[Double](2).map(x => (x / r.getLong(3)).toFloat).toArray
      }.toMap
      books = books.indices.map(j => books(j).indices.map(c =>
        updated.getOrElse((j, c), books(j)(c))).toIndexedSeq)
    }
    training.unpersist(blocking = false)
    books.map(_.map(_.toSeq))
  }

  /** Encode every vector to its m codes, reconstruct from the codebooks,
    * and score the reconstruction: the input columns plus
    * `code array<int>`, `recon_cos`, and `recon array<float>` (kept so
    * IVF-PQ can add the coarse centroid back). Assignment matches
    * training (argmax of dot with the unit-normalized sub-centroid,
    * first-max tie-break); recon_cos is the cosine between the original
    * vector and its reconstruction, rounded to 4 decimals (the
    * engine-portability rule). All map-side expression math. */
  def encodeReconstruct(df: DataFrame, idCol: String, vecCol: String,
      codebooks: IndexedSeq[IndexedSeq[Seq[Float]]]): DataFrame = {
    val m = codebooks.size
    val sub = codebooks.head.head.size
    // declare-time clash guard (the samplers' convention): the output
    // columns would silently overwrite a caller's
    val clash = df.columns.intersect(Seq("code", "recon", "recon_cos"))
    require(clash.isEmpty,
      s"encodeReconstruct writes columns ${clash.mkString(", ")} that " +
        "already exist on the input — rename them first")
    val unit: IndexedSeq[Seq[Seq[Float]]] = codebooks.map(_.map { v =>
      val n = math.max(math.sqrt(v.map(x => x.toDouble * x).sum), 1e-12)
      v.map(x => (x / n).toFloat)
    })
    // ONE native PqCodes call per row assigns all m subspaces (the
    // staged per-subspace transform-HOF chains paid an interpreted dot
    // per codebook entry — x203's recon leg measured 6.5 s warm over
    // 4 000 rows on that shape); reconstruction is m code lookups into
    // the codebook literals, exactly as before.
    val coded = df.withColumn("code",
      graft.expressions.VectorExpressions.pqCodes(col(vecCol), unit, sub))
    val recon = flatten(array((0 until m).map(j =>
      element_at(typedlit(codebooks(j).map(_.toSeq)),
        element_at(col("code"), j + 1) + 1)): _*))
    coded
      .withColumn("recon", recon)
      .withColumn("recon_cos", graft.expressions.VectorExpressions
        .round4(cosine(col(vecCol), col("recon"))))
  }

  /** IVF-PQ (the FAISS production index shape): assign each vector to
    * its nearest coarse centroid, PQ-encode the RESIDUAL against
    * residual-trained codebooks, reconstruct as centroid + decoded
    * residual. Returns the input columns plus (cell, recon). Callers
    * search by running the IVF scan over the reconstructions — decode-
    * then-dot is numerically identical to the ADC lookup-table trick
    * (a CPU optimization, not a plan change). Map-side end to end:
    * centroids and codebooks are broadcast literals. */
  def ivfPqReconstruct(df: DataFrame, idCol: String, vecCol: String,
      centroids: IndexedSeq[Seq[Float]],
      codebooks: IndexedSeq[IndexedSeq[Seq[Float]]]): DataFrame = {
    // one guard covering BOTH stages' working columns, so a caller
    // column named e.g. 'code' fails here with the right context, not
    // inside encodeReconstruct with a message about the inner call
    val clash = df.columns.intersect(Seq("cell", "code", "recon", "recon_cos"))
    require(clash.isEmpty,
      s"ivfPqReconstruct uses columns ${clash.mkString(", ")} that " +
        "already exist on the input — rename them first")
    val withRes = residuals(df, vecCol, centroids)
    encodeReconstruct(withRes, idCol, "__resid", codebooks)
      .withColumn("recon",
        zip_with(element_at(typedlit(centroids.map(_.toSeq).toSeq),
          col("cell") + 1), col("recon"), (a, b) => a + b))
      .drop("__resid", "recon_cos", "code") // scaladoc contract: + (cell, recon)
  }

  /** Nearest-coarse-centroid assignment + residual, as columns
    * (cell, __resid) on the input — the trainKMeans assignment rule
    * (argmax of dot with the unit centroid, first-max tie-break).
    * Public because IVF-PQ codebooks are trained ON residuals: callers
    * run this once, train on `__resid`, then [[ivfPqReconstruct]]. */
  def residuals(df: DataFrame, vecCol: String,
      centroids: IndexedSeq[Seq[Float]]): DataFrame = {
    require(!df.columns.contains("cell"),
      "residuals writes a 'cell' column that already exists on the input")
    val unit: Seq[Seq[Float]] = centroids.map { v =>
      val n = math.max(math.sqrt(v.map(x => x.toDouble * x).sum), 1e-12)
      v.map(x => (x / n).toFloat)
    }.toSeq
    // one native argmax call per row (see encodeReconstruct)
    df.withColumn("cell",
        graft.expressions.VectorExpressions.argmaxCell(col(vecCol), unit))
      .withColumn("__resid",
        zip_with(col(vecCol),
          element_at(typedlit(centroids.map(_.toSeq).toSeq), col("cell") + 1),
          (a, b) => a - b))
  }
}
