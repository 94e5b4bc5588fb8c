package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OrgOpsSpec extends SparkSpec {

  private lazy val rows = OrgOps.orgRulesFull(spark, sfDir).collect()

  test("unknown orgs carry the reference's not-registered error") {
    // organization.py:36-41 / source_id_manager.py:324-326
    val unknown = rows.filter(_.getLong(0) % 7 == 0)
    assert(unknown.nonEmpty)
    unknown.foreach { r =>
      val raw = r.getString(1)
      assert(r.getString(2) ===
        s"Organization '$raw' not registered in MDF Connect (from '$raw')")
      assert(r.isNullAt(3), "errored requests must not resolve a chain")
    }
  }

  test("ambiguous aliases carry the duplicate-org error") {
    val ambig = rows.filter(_.getLong(0) % 7 == 1)
    assert(ambig.nonEmpty)
    ambig.foreach { r =>
      assert(r.getString(2) ===
        "Multiple organizations found with name 'ambig!' (from 'ambig!')")
    }
  }

  test("resolution walks the parent chain from any level, list rules append in BFS order") {
    val ok = rows.filter(_.isNullAt(2))
    assert(ok.nonEmpty)
    assert(ok.exists(_.getLong(0) % 7 == 3), "region-level requests resolve")
    assert(ok.exists(_.getLong(0) % 7 == 4), "root-level requests resolve")
    ok.foreach { r =>
      val hops = r.getString(3).split(">")
      val dests = r.getString(5).split(",")
      r.getLong(0) % 7 match {
        case 3 => // region request: region>GLOBAL
          assert(hops.length === 2 && hops(1) === "GLOBAL", s"chain: ${r.getString(3)}")
          assert(dests.length === 2 && dests(0).startsWith("dest-r") &&
            dests(1) === "dest-global", s"BFS append order: ${dests.mkString(",")}")
        case 4 => // root request: single-hop chain
          assert(hops.toSeq === Seq("GLOBAL"))
          assert(dests.toSeq === Seq("dest-global"))
        case _ => // nation request: nation>region>GLOBAL
          assert(hops.length === 3, "nation>region>GLOBAL chain")
          assert(dests.length === 3)
          assert(dests(0).startsWith("dest-n") && dests(1).startsWith("dest-r") &&
            dests(2) === "dest-global", s"BFS append order: ${dests.mkString(",")}")
      }
    }
  }

  test("scalar rules are first-org-wins; user rules only fill missing keys") {
    val ok = rows.filter(_.isNullAt(2))
    val nationLevel = ok.filter(r => Set(2L, 5L, 6L)(r.getLong(0) % 7))
    // nation-level acl exists only for nationkey % 3 == 0; otherwise the
    // region's (closer parent) must win over the root's
    assert(nationLevel.exists(_.getString(6).startsWith("acl-n")))
    assert(nationLevel.exists(_.getString(6).startsWith("acl-r")))
    assert(!nationLevel.exists(_.getString(6) == "acl-global"))
    // region requests take their own acl; the root request takes the root's
    assert(ok.filter(_.getLong(0) % 7 == 3).forall(_.getString(6).startsWith("acl-r")))
    assert(ok.filter(_.getLong(0) % 7 == 4).forall(_.getString(6) === "acl-global"))
    // user_tag has no org-side key, so the user's value survives
    ok.foreach(r => assert(r.getString(7).startsWith("tag-")))
  }

  test("user-set curation sticks even when the whole org chain declines") {
    val df = OrgOps.orgRulesFull(spark, sfDir)
      .filter(col("error").isNull && col("request_id") % 2 === 0)
    // every user_curation=true request resolves with curation=true
    assert(df.filter(!col("curation")).count() === 0)
  }
}
