package graft.operators

import graft.athenaeum.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Distributed-PCA invariants on the sf0.001 embeddings (d = 64). The
  * covariance COMPONENTS are oracle-checked separately (q_embedding_cov);
  * this spec pins the driver-side eigensolve + projection: the math a SQL
  * oracle cannot express. */
class PcaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val d = 64
  private def emb = Tables(spark, dir, "embeddings")

  test("jacobi basis: orthonormal rows, descending eigenvalues, trace preserved") {
    val (vals, mat) = Similarity.pcaBasis(emb, "embedding", d, d)
    // eigenvalues sorted descending and non-negative (covariance is PSD)
    vals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(vals.last >= -1e-10, s"negative eigenvalue ${vals.last}")
    // rows orthonormal: R·Rᵀ = I within solver tolerance
    for (i <- 0 until d; j <- i until d) {
      var dot = 0d
      var c = 0
      while (c < d) { dot += mat(i * d + c) * mat(j * d + c); c += 1 }
      val expect = if (i == j) 1d else 0d
      assert(math.abs(dot - expect) < 1e-9, s"R·Rᵀ[$i,$j] = $dot")
    }
    // similarity transform preserves the trace: Σλ = Σ var(coord)
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .selectExpr("pos", "CAST(v AS DOUBLE) AS v")
      .groupBy("pos")
      .agg(((sum(col("v") * col("v")) - sum("v") * sum("v") / count("*"))
        / count("*")).as("variance"))
      .agg(sum("variance")).head.getDouble(0)
    val traceEig = vals.sum
    assert(math.abs(traceEig - stats) / stats < 1e-3,
      s"trace $stats vs eigenvalue sum $traceEig")
    // top eigenvalue dominates any single coordinate's variance
    val maxVar = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .selectExpr("pos", "CAST(v AS DOUBLE) AS v")
      .groupBy("pos")
      .agg(((sum(col("v") * col("v")) - sum("v") * sum("v") / count("*"))
        / count("*")).as("variance"))
      .agg(max("variance")).head.getDouble(0)
    assert(vals.head >= maxVar - 1e-6)
  }

  test("projection: variance along pc1 matches lambda1; deterministic under repartition") {
    val k = 8
    val (vals, _) = Similarity.pcaBasis(emb, "embedding", d, k)
    val proj = Similarity.pcaProject(emb, "embedding", d, k)
    // sample variance of the first projected coordinate ≈ λ1 (both are
    // population variances over the same rows; quantization puts them
    // within ~1e-4 relative)
    val v1 = proj.selectExpr("pc[0] AS y")
      .agg(((sum(col("y") * col("y")) - sum("y") * sum("y") / count("*"))
        / count("*")).as("v")).head.getDouble(0)
    assert(math.abs(v1 - vals(0)) / vals(0) < 1e-2,
      s"pc1 variance $v1 vs lambda1 ${vals(0)}")
    // basis and projection are partitioning-invariant
    val (vals2, mat2) = Similarity.pcaBasis(emb.repartition(13), "embedding", d, k)
    val (_, mat1) = Similarity.pcaBasis(emb, "embedding", d, k)
    assert(vals.toSeq == vals2.toSeq, "eigenvalues differ under repartition")
    assert(mat1.toSeq == mat2.toSeq, "basis differs under repartition")
    // projected rows carry k coordinates, none null
    assert(proj.selectExpr("size(pc)").distinct.head.getInt(0) == k)
  }

  test("full-rank projection preserves pairwise distances (rotation)") {
    val proj = Similarity.pcaProject(emb.limit(50), "embedding", d, d)
      .selectExpr("vec_id", "embedding", "pc")
    val pairs = proj.as("a").crossJoin(proj.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .selectExpr(
        """aggregate(zip_with(a.embedding, b.embedding,
             (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
             0D, (s, v) -> s + v) AS d_orig""",
        """aggregate(zip_with(a.pc, b.pc, (x, y) -> (x - y) * (x - y)),
             0D, (s, v) -> s + v) AS d_proj""")
      .selectExpr("max(abs(d_orig - d_proj) / greatest(d_orig, 1e-12)) AS rel")
      .head.getDouble(0)
    assert(pairs < 1e-6, s"rotation distorted distances by $pairs")
  }
}
