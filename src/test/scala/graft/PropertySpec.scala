package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{DotProduct, GraftBridge}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (SURVEY §5.2, ScalaCheck 1.18): generated inputs,
  * each property checked over one batched DataFrame evaluation (a Spark job
  * per ScalaCheck case would be prohibitively slow, so cases are sampled
  * from Gen with a fixed seed and asserted in bulk).
  */
class PropertySpec extends AnyFunSuite with SparkFixture {

  private def sample[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  test("DotProduct equals the plain-Scala fold for generated vectors") {
    val vec = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    val pairs = sample(Gen.zip(vec, vec), 40)
    GraftBridge.registerFunction(spark, "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      pairs.map { case (a, b) => Row(a, b) }.asJava,
      StructType(Seq(StructField("a", ArrayType(DoubleType)),
        StructField("b", ArrayType(DoubleType)))))
    val got = df.select(call_function("dot_product", col("a"), col("b")))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), g) =>
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(g == ref, s"dot($a, $b)")
    }
  }

  test("saltedJoin is row-identical to the plain inner join on generated tables") {
    import scala.jdk.CollectionConverters._
    // skewed key space so salting actually has hot keys to spread
    val keyGen = Gen.frequency(7 -> Gen.const(1L), 3 -> Gen.choose(1L, 20L))
    val bigRows = sample(Gen.zip(keyGen, Gen.choose(0L, 1000L)), 300)
    val smallRows = (1L to 20L).map(k => (k, k * 100))
    val bigSchema = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    val smallSchema = StructType(Seq(StructField("sk", LongType), StructField("sv", LongType)))
    val big = spark.createDataFrame(bigRows.map { case (k, v) => Row(k, v) }.asJava, bigSchema)
    val small = spark.createDataFrame(smallRows.map { case (k, v) => Row(k, v) }.asJava, smallSchema)
    for (salt <- Seq(1, 3, 8)) {
      val salted = graft.ops.Scale.saltedJoin(big, small, col("k"), col("sk"), salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      val plain = big.join(small, col("k") === col("sk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      assert(salted.toSeq == plain.toSeq, s"salt=$salt")
    }
  }

  test("conv(substring(md5)) 60-bit hash matches a JVM reference for generated strings") {
    import scala.jdk.CollectionConverters._
    val strGen = Gen.listOfN(12, Gen.alphaNumChar).map(_.mkString)
    val strs = sample(strGen, 40).distinct
    val df = spark.createDataFrame(
      strs.map(Row(_)).asJava,
      StructType(Seq(StructField("s", org.apache.spark.sql.types.StringType))))
    val got = df.select(expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    strs.zip(got).foreach { case (s, g) =>
      val hex = mdRef.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      assert(g == java.lang.Long.parseLong(hex, 16), s"hash60($s)")
    }
  }
}
