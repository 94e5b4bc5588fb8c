package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the binary sign sketch: on ARBITRARY 64-dim
  * vectors — including NaN, ±0.0, ±Infinity, denormals — the packed
  * long must equal the host-side fold under Spark SQL's float
  * ordering (NaN above zero, -0.0 == 0.0), and the Hamming popcount
  * identity the DuckDB oracle uses (pop(a)+pop(b)−2·dot(sa,sb)) must
  * equal bitCount(a XOR b) exactly. These are the two equivalences the
  * q_ann_hamming oracles assume. */
class SignBitsPropSpec extends SparkSpec {

  private val dimGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1e308, -1e308))

  private val vecGen: Gen[List[Double]] = Gen.listOfN(64, dimGen)

  private def hostBits(v: Seq[Double]): Long =
    v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      if (x >= 0.0 || x.isNaN) acc | (1L << i) else acc
    }

  test("packed sketch == host fold and popcount identity == XOR bitCount") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.listOfN(8, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v")
      val got = df.select(col("vec_id"),
          graft.operators.AnnOps.signBits(col("v")).as("bits"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val packOk = vecs.zipWithIndex.forall { case (v, i) =>
        got(i.toLong) == hostBits(v)
      }
      // popcount identity over every pair, in exact integer arithmetic
      val identityOk = (for {
        (a, i) <- vecs.zipWithIndex; (b, j) <- vecs.zipWithIndex; if i < j
      } yield {
        val (ba, bb) = (hostBits(a), hostBits(b))
        val sa = (0 until 64).map(k => (ba >>> k) & 1L)
        val sb = (0 until 64).map(k => (bb >>> k) & 1L)
        val viaIdentity = sa.sum + sb.sum - 2 * sa.zip(sb).map(t => t._1 * t._2).sum
        viaIdentity == java.lang.Long.bitCount(ba ^ bb)
      }).forall(identity)
      packOk && identityOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("wide sketch: arbitrary dims pack per 64-word, 64-dim equals the fast path") {
    import spark.implicits._
    val dims = Seq(1, 63, 64, 65, 128, 150)
    val prop = Prop.forAll(Gen.listOfN(4, Gen.listOfN(150, dimGen))) { raws =>
      dims.forall { dim =>
        val vecs = raws.map(_.take(dim))
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "v")
        val got = df.select(col("vec_id"),
            graft.operators.AnnOps.signBitsWide(col("v")).as("words"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        vecs.zipWithIndex.forall { case (v, i) =>
          val words = got(i.toLong)
          words.length == (dim + 63) / 64 &&
            words.zipWithIndex.forall { case (word, w) =>
              word == hostBits(v.slice(w * 64, math.min((w + 1) * 64, dim)))
            }
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("wide sketch of an empty vector is the empty word array") {
    import spark.implicits._
    val got = Seq((0L, List.empty[Double])).toDF("vec_id", "v")
      .select(graft.operators.AnnOps.signBitsWide(col("v")).as("w"))
      .collect().head.getSeq[Long](0)
    assert(got.isEmpty)
  }

  test("wide Hamming equals the summed per-word popcount, 64-dim matches bit_count") {
    import spark.implicits._
    val ops = graft.operators.AnnOps
    val vecs = (0 until 6).map(i =>
      (i.toLong, (0 until 128).map(d => math.sin(i * 131 + d * 17).toDouble).toList))
    val df = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), ops.signBitsWide(col("v")).as("w"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        ops.hammingWide(col("a.w"), col("b.w")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val words = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((i, _) <- vecs; (j, _) <- vecs) {
      val expect = words(i).zip(words(j))
        .map(t => java.lang.Long.bitCount(t._1 ^ t._2)).sum
      assert(pairs((i, j)) == expect, s"pair ($i, $j)")
    }
  }
}
