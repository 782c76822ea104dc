package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** embedding_pca: the deterministic power-iteration contract, pinned
  * against a full independent in-JVM replay (means → covariance →
  * 8 quantized iterations → projection, all in plain Scala — not the
  * Catalyst path the operator rides), plus the geometric reading on a
  * variance-concentrated fixture. Cross-engine exactness is the DuckDB
  * oracle's job at sf0.01.
  */
class PcaSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def write(rows: Seq[Row], name: String): String = {
    val d = tmpDir(name)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  /** Plain-Scala replay of the operator's exact arithmetic. */
  private def model(vecs: Seq[(Long, Seq[Float])], iters: Int): Map[Long, Double] = {
    val Q = 1048576.0
    def q(x: Double): Long = math.floor(x * Q).toLong
    val e64 = vecs.map { case (id, e) =>
      id -> (0 until 64).map(i => if (i < e.length) e(i).toDouble else 0.0)
    }
    val n = e64.size
    val md = (0 until 64).map(j => e64.map(v => q(v._2(j))).sum.toDouble / n / Q)
    val cent = e64.map { case (id, v) => id -> (0 until 64).map(i => v(i) - md(i)) }
    val sm = (0 until 4096).map { ij =>
      cent.map { case (_, c) => q(c(ij / 64) * c(ij % 64)) }.sum.toDouble
    }
    var v = (0 until 64).map(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val wd = (0 until 64).map(i =>
        (0 until 64).map(j => q(sm(i * 64 + j) * v(j))).sum.toDouble / Q)
      val nrm = math.sqrt(wd.foldLeft(0.0)((a, x) => a + x * x))
      if (nrm != 0.0) v = wd.map(_ / nrm)
    }
    cent.map { case (id, c) =>
      id -> (0 until 64).map(i => q(c(i) * v(i))).sum.toDouble / Q
    }.toMap
  }

  test("embedding_pca: full frame matches the independent in-JVM replay exactly") {
    // ragged widths on purpose — the 64-dim pad contract is part of
    // what the replay pins
    val vecs = Seq(
      0L -> Seq(3.0f, 0.5f),
      1L -> Seq(-2.0f, 0.25f, 0.1f),
      2L -> Seq(1.5f, -0.75f),
      3L -> Seq(-4.0f, 0.0f, 0.0f, 0.2f),
      4L -> Seq(0.5f, 1.0f))
    val d = write(vecs.map { case (id, e) => Row(id, e, 0) }, "pca")
    val got = graft.SparkEntry.queries("embedding_pca")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected = model(vecs, iters = 8)
    assert(got == expected, s"got $got, expected $expected")
  }

  test("embedding_pca: the dominant direction is found — pc1 tracks the high-variance axis") {
    // variance concentrated on dim 0 (spread ±4), noise on dim 1 (±0.1):
    // the top PC must align with dim 0, so pc1 ordering equals the dim-0
    // ordering and spans ~the centered dim-0 range
    val vecs = Seq(
      0L -> Seq(4.0f, 0.1f), 1L -> Seq(2.0f, -0.1f), 2L -> Seq(0.0f, 0.1f),
      3L -> Seq(-2.0f, -0.1f), 4L -> Seq(-4.0f, 0.1f))
    val d = write(vecs.map { case (id, e) => Row(id, e, 0) }, "pca-axis")
    val got = graft.SparkEntry.queries("embedding_pca")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byPc = got.toSeq.sortBy(_._2).map(_._1)
    assert(byPc == Seq(4L, 3L, 2L, 1L, 0L) || byPc == Seq(0L, 1L, 2L, 3L, 4L),
      s"pc1 order must follow the dim-0 axis (either sign), got $byPc")
    assert(math.abs(math.abs(got(0L) - got(4L)) - 8.0) < 0.05,
      s"the projected span must be ~the dim-0 span 8.0, got $got")
    intercept[IllegalArgumentException] {
      Similarity.embeddingPca(
        spark.read.parquet(s"$d/embeddings.parquet"), iters = 0)
    }
  }
}
