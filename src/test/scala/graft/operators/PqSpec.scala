package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization properties: exact roundtrip on a codebook-sized
  * corpus, code-range invariants, and determinism. */
class PqSpec extends SparkSpec {

  test("corpus of exactly ksub patterns per subspace reconstructs exactly") {
    import spark.implicits._
    // 8-dim vectors, m=2 subspaces of 4 dims; each subspace drawn from 4
    // mutually-orthogonal one-hot patterns -> Lloyd's must land on the
    // patterns themselves and reconstruction is exact (recon_cos = 1.0)
    val rnd = new scala.util.Random(7)
    def oneHot(p: Int): Seq[Float] =
      Seq.tabulate(4)(i => if (i == p) 4.0f else 0.0f)
    val rows = (0L until 64L).map { id =>
      (id, (oneHot(rnd.nextInt(4)) ++ oneHot(rnd.nextInt(4))).toArray)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cbs = Pq.trainCodebooks(df, "vec_id", "embedding",
      dim = 8, m = 2, ksub = 4, iters = 5)
    assert(cbs.size == 2 && cbs.forall(_.size == 4))
    assert(cbs.forall(_.forall(_.size == 4)))
    val enc = Pq.encodeReconstruct(df, "vec_id", "embedding", cbs)
      .select("vec_id", "code", "recon_cos").collect()
    assert(enc.length == 64)
    enc.foreach { r =>
      assert(r.getDouble(2) == 1.0, s"vec ${r.getLong(0)} not exact")
      val code = r.getSeq[Int](1)
      assert(code.size == 2 && code.forall(c => c >= 0 && c < 4), code)
    }
  }

  test("random corpus: codes in range, deterministic, beats random codes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map { id =>
      (id, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("vec_id", "embedding")
    def run() = {
      val cbs = Pq.trainCodebooks(df, "vec_id", "embedding",
        dim = 16, m = 4, ksub = 8, iters = 4)
      Pq.encodeReconstruct(df, "vec_id", "embedding", cbs)
        .select("vec_id", "code", "recon_cos")
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getDouble(2)))
    }
    val a = run()
    assert(a.sameElements(run()), "PQ not deterministic across runs")
    assert(a.forall(_._2.forall(c => c >= 0 && c < 8)))
    // 8 centroids per 4-dim subspace is high-fidelity on this corpus —
    // a misaligned slice/lookup anywhere would crater this mean
    val trained = a.map(_._3).sum / a.length
    assert(trained > 0.6, s"mean reconstruction cosine $trained")
  }

  test("ivfPqReconstruct with a zero coarse centroid equals plain PQ") {
    import spark.implicits._
    // one all-zero centroid -> residual == vector, so the IVF-PQ
    // reconstruction must equal plain-PQ reconstruction exactly
    val rnd = new scala.util.Random(13)
    val rows = (0L until 100L).map { id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("vec_id", "embedding")
    val zero = IndexedSeq(Seq.fill(8)(0.0f))
    val cbs = Pq.trainCodebooks(df, "vec_id", "embedding",
      dim = 8, m = 2, ksub = 4, iters = 3)
    val plain = Pq.encodeReconstruct(df, "vec_id", "embedding", cbs)
      .select("vec_id", "recon").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ivfpq = Pq.ivfPqReconstruct(df, "vec_id", "embedding", zero, cbs)
      .select("vec_id", "recon", "cell").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(ivfpq.forall(_._3 == 0))
    assert(plain.map(_._2.toList).toSeq == ivfpq.map(_._2.toList).toSeq)
  }
}
