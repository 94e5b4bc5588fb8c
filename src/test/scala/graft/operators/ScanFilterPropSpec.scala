package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the ScanFilter → Column compiler: for arbitrary
  * conjunctive filter lists, the compiled Spark scan must agree row-for-
  * row with a direct Scala evaluation of the reference's operator
  * semantics (dynamo_manager.py:127-247) over the same rows — including
  * the `==None` / `!=None` existence forms on a nullable column. */
class ScanFilterPropSpec extends SparkSpec {

  private case class Row3(id: Long, name: String, score: java.lang.Double)

  private val rows: Seq[Row3] = (0 until 200).map { i =>
    Row3(i.toLong, s"src${i % 17}_item${i % 7}",
      if (i % 9 == 0) null else java.lang.Double.valueOf((i * 13 % 100) / 2.0))
  }

  /** The reference semantics evaluated directly (None ⇒ not-exists). */
  private def eval(f: ScanFilter, r: Row3): Boolean = {
    def v(field: String): Option[Any] = field match {
      case "id"    => Some(r.id)
      case "name"  => Some(r.name)
      case "score" => Option(r.score).map(_.doubleValue)
    }
    def cmp(field: String, x: Any)(op: Int => Boolean): Boolean = v(field) match {
      case Some(a: Long)   => op(a.compareTo(x.asInstanceOf[Long]))
      case Some(a: Double) => op(a.compareTo(x.asInstanceOf[Double]))
      case Some(a: String) => op(a.compareTo(x.asInstanceOf[String]))
      case _               => false // SQL three-valued logic: NULL never matches
    }
    f match {
      case ScanFilter.BeginsWith(c, s) => v(c).exists(_.asInstanceOf[String].startsWith(s))
      case ScanFilter.Contains(c, s)   => v(c).exists(_.asInstanceOf[String].contains(s))
      case ScanFilter.Eq(c, None)      => v(c).isEmpty
      case ScanFilter.Eq(c, Some(x))   => cmp(c, x)(_ == 0)
      case ScanFilter.Ne(c, None)      => v(c).nonEmpty
      case ScanFilter.Ne(c, Some(x))   => cmp(c, x)(_ != 0)
      case ScanFilter.Gt(c, x)         => cmp(c, x)(_ > 0)
      case ScanFilter.Ge(c, x)         => cmp(c, x)(_ >= 0)
      case ScanFilter.Lt(c, x)         => cmp(c, x)(_ < 0)
      case ScanFilter.Le(c, x)         => cmp(c, x)(_ <= 0)
      case ScanFilter.Between(c, lo, hi) => cmp(c, lo)(_ >= 0) && cmp(c, hi)(_ <= 0)
      case ScanFilter.In(c, xs)        => xs.exists(x => cmp(c, x)(_ == 0))
    }
  }

  private val idGen: Gen[Long] = Gen.choose(-10L, 210L)
  private val nameGen: Gen[String] =
    Gen.oneOf(Gen.choose(0, 20).map(i => s"src$i"), Gen.const("item"), Gen.const("_"))
  private val scoreGen: Gen[Double] = Gen.choose(-5.0, 55.0).map(d => math.rint(d * 2) / 2)

  private val filterGen: Gen[ScanFilter] = Gen.oneOf(
    nameGen.map(ScanFilter.BeginsWith("name", _)),
    nameGen.map(ScanFilter.Contains("name", _)),
    idGen.map(x => ScanFilter.Eq("id", Some(x))),
    Gen.const(ScanFilter.Eq("score", None)),
    Gen.const(ScanFilter.Ne("score", None)),
    scoreGen.map(x => ScanFilter.Gt("score", x)),
    scoreGen.map(x => ScanFilter.Ge("score", x)),
    idGen.map(x => ScanFilter.Lt("id", x)),
    idGen.map(x => ScanFilter.Le("id", x)),
    for { a <- scoreGen; b <- scoreGen } yield
      ScanFilter.Between("score", math.min(a, b), math.max(a, b)),
    Gen.listOfN(3, idGen).map(xs => ScanFilter.In("id", xs)))

  test("compiled scans agree with direct reference semantics") {
    import spark.implicits._
    val df = rows.map(r => (r.id, r.name, Option(r.score).map(_.doubleValue)))
      .toDF("id", "name", "score").cache()
    val prop = Prop.forAll(Gen.listOfN(3, filterGen)) { fs =>
      val got = ScanOps.scan(df, fields = Seq("id"), filters = fs)
        .collect().map(_.getLong(0)).toSet
      val want = rows.filter(r => fs.forall(eval(_, r))).map(_.id).toSet
      if (got != want) println(s"MISMATCH for filters: $fs")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40).withInitialSeed(7L), prop)
    assert(res.passed, res.status.toString)
    df.unpersist()
  }
}
