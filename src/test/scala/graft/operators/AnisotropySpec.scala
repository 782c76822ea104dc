package graft.operators

import graft.SparkSpec

/** embedding_anisotropy: hand-exact shares on crafted vector sets — a
  * 1-D set reads pc1 = 1e6 and the closed-form mean share, tied
  * orthogonal spread reads exactly half, a constant set hits both
  * guards. Cross-engine exactness is the DuckDB oracle's job at sf0.01.
  */
class AnisotropySpec extends SparkSpec {

  private def emb(vs: Seq[Array[Float]]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, i.toLong % 3, v.toSeq) }
      .toDF("vec_id", "label", "embedding")
  }

  private def dim0(xs: Double*): Seq[Array[Float]] =
    xs.map { x => val a = Array.fill(64)(0.0f); a(0) = x.toFloat; a }

  private def report(vs: Seq[Array[Float]]): (Long, Long, Long) = {
    val r = Similarity.embeddingAnisotropy(emb(vs), iters = 4).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("a 1-D set puts ALL centered variance on PC1; the mean share is closed-form") {
    // values 2,4,6,8 on dim0: mean 5, centered {-3,-1,1,3}
    // pc1_var = 1.0 exactly; mean share = 25*4 / (20 + 25*4) = 5/6
    assert(report(dim0(2, 4, 6, 8)) == ((4L, 1000000L, 833333L)))
  }

  test("tied orthogonal spread reads exactly half on the seeded axis") {
    // two centered unit axes with equal variance; v0 = e0 is an exact
    // eigenvector, so power iteration stays on dim0 and reads 1/2
    val vs = dim0(1, -1) ++ Seq(
      { val a = Array.fill(64)(0.0f); a(1) = 1.0f; a },
      { val a = Array.fill(64)(0.0f); a(1) = -1.0f; a })
    assert(report(vs) == ((4L, 500000L, 0L)), "zero mean: no mean share")
  }

  test("a constant set hits both guards: no variance, all mass in the mean") {
    assert(report(dim0(3, 3, 3)) == ((3L, 0L, 1000000L)))
  }

  test("ragged embeddings inherit the 64-dim zero-pad contract") {
    val short = Seq(Array(2.0f), Array(4.0f), Array(6.0f), Array(8.0f))
    assert(report(short) == ((4L, 1000000L, 833333L)),
      "a 1-dim ragged input behaves exactly like its padded twin")
  }
}
