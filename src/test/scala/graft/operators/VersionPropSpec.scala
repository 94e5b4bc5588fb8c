package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property checks over the reference-fidelity string algebra
  * (source-id parse, URI normalization) on RANDOM inputs:
  *
  *  - split ∘ format is the identity on (name, search, sub) for any
  *    name that doesn't itself end in a version suffix (the one
  *    genuinely ambiguous class — `a_v1.2_v3.4` parses as name
  *    `a_v1.2`, exactly like the reference's endswith-anchored regex);
  *  - URI normalization is IDEMPOTENT: its outputs (`globus://...`
  *    canonical forms and passthroughs) are fixed points, so a
  *    pipeline that normalizes twice (ingest + defensive re-check)
  *    cannot corrupt a URI. */
class VersionPropSpec extends SparkSpec {

  private val nameGen: Gen[String] = (for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 1 -> Gen.const('_')))
  } yield cs.mkString).suchThat(s => !s.matches(".*_v[0-9]+\\.[0-9]+$"))

  test("splitSourceId inverts id formatting for any non-ambiguous name") {
    import spark.implicits._
    val caseGen = for {
      name <- nameGen
      sv <- Gen.choose(1, 99)
      sub <- Gen.choose(0, 99)
    } yield (name, sv, sub)
    val prop = Prop.forAll(Gen.listOfN(12, caseGen)) { cases =>
      val df = cases.map { case (n, sv, sub) => s"${n}_v$sv.$sub" }.toDF("id")
      val out = df.select(VersionOps.splitSourceIdCols(col("id")): _*).collect()
      out.zip(cases).forall { case (r, (n, sv, sub)) =>
        r.getBoolean(0) && r.getString(1) == n &&
          r.getInt(2) == sv && r.getInt(3) == sub
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("URI normalization is idempotent on arbitrary inputs") {
    import spark.implicits._
    val ep = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    val path = Gen.listOfN(6, Gen.oneOf(Gen.alphaLowerChar, Gen.const('/')))
      .map(cs => "/" + cs.mkString.stripPrefix("/"))
    val linkGen = for {
      e <- ep; p <- path
      host <- Gen.oneOf("https://www.globus.org/app/transfer",
        "https://app.globus.org/file-manager", "https://app.globus.org/transfer")
      whichId <- Gen.oneOf("origin", "destination")
      complete <- Gen.prob(0.8)
    } yield
      if (complete) s"$host?${whichId}_id=$e&${whichId}_path=$p"
      else s"$host?${whichId}_id=$e" // missing path → invalid, NULL out
    val otherGen = Gen.oneOf(
      for { e <- ep; p <- path } yield s"gdrive://$p",
      for { e <- ep; p <- path } yield s"globus://$e$p",
      for { p <- path } yield s"https://example.org$p",
      Gen.listOfN(10, Gen.alphaNumChar).map(_.mkString))
    val uriGen = Gen.frequency(3 -> linkGen, 2 -> otherGen)

    val prop = Prop.forAll(Gen.listOfN(12, uriGen)) { uris =>
      val once = uris.toDF("uri")
        .select(VersionOps.normalizeUriCols(col("uri")): _*)
        .collect().map(r => Option(r.getString(0)))
      val twice = once.collect { case Some(u) => u }.toSeq.toDF("uri")
        .select(VersionOps.normalizeUriCols(col("uri")): _*)
        .collect().map(r => Option(r.getString(0))).toSeq
      twice == once.collect { case Some(u) => Some(u) }.toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
