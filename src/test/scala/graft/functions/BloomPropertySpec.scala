package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec
import graft.functions.expressions.HashImpl

/** Property tests for the Bloom primitives: set/contains consistency,
  * no false negatives ever, bounded false positives, and JVM/SQL
  * formulation agreement on random key sets. The key domain matches the
  * documented contract (non-negative, below 2^63/2654435761 ≈ 3.5e9 —
  * all graft fingerprints are < P ≈ 1e9+7). */
class BloomPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val keyGen = Gen.choose(0L, HashImpl.P - 1)
  private val keysGen = Gen.listOf(keyGen).map(_.distinct)

  test("no false negatives: every inserted key is contained") {
    val m = 1 << 12; val k = 5
    check(Prop.forAll(keysGen) { keys =>
      val mask = new Array[Long](m / 64)
      keys.foreach(HashImpl.bloomSet(_, mask, m, k))
      keys.forall(HashImpl.bloomContains(_, mask, m, k))
    })
  }

  test("false-positive rate stays near the sizing bound") {
    val m = 1 << 14; val k = 5
    val mask = new Array[Long](m / 64)
    val inserted = (0L until 200L).map(_ * 7919L % HashImpl.P)
    inserted.foreach(HashImpl.bloomSet(_, mask, m, k))
    val probes = (1L to 20000L).map(_ * 104729L % HashImpl.P)
      .filterNot(inserted.toSet)
    val fp = probes.count(HashImpl.bloomContains(_, mask, m, k))
    // 200 keys x 5 bits in 16384 bits -> load < 6%, FPP < (0.06)^5 ~ 1e-6;
    // allow two orders of magnitude of slack against hash clumping
    assert(fp <= probes.size / 100,
      s"fp=$fp of ${probes.size} probes — filter is not filtering")
  }

  test("JVM bloomContains agrees with the SQL forall formulation on random sets") {
    import org.apache.spark.sql.functions._
    import graft.operators.Bloom
    val m = 1 << 10; val k = 3
    val keys = (0L until 500L).map(i => (i * 48271L) % HashImpl.P)
    val mask = new Array[Long](m / 64)
    keys.take(50).foreach(HashImpl.bloomSet(_, mask, m, k))
    val df = spark.createDataFrame(
      keys.map(Tuple1(_))).toDF("key")
    val viaSql = df.filter(expr(Bloom.mightContainSql("key", mask, m, k)))
      .collect().map(_.getLong(0)).toSet
    val viaJvm = keys.filter(HashImpl.bloomContains(_, mask, m, k)).toSet
    val viaExpr = df.filter(Bloom.mightContain(col("key"), mask, k))
      .collect().map(_.getLong(0)).toSet
    assert(viaSql == viaJvm && viaExpr == viaJvm)
  }
}
