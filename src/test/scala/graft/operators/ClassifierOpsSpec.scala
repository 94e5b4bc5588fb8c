package graft.operators

import graft.SparkSpec

class ClassifierOpsSpec extends SparkSpec {

  test("NB classifier: one prediction per held-out doc, labels from the train classes") {
    val preds = ClassifierOps.nbClassify(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(preds.nonEmpty)
    assert(preds.map(_._1).distinct.length === preds.length, "duplicate doc rows")
    // predictions only ever name classes the training slice contains
    val trainLangs = graft.Tables.documents(spark, sfDir)
      .selectExpr("lang",
        "substring(md5(concat_ws('#', source, cast(doc_id as string))), 1, 1) <= 'b' as t")
      .where("t").select("lang").distinct().collect().map(_.getString(0)).toSet
    preds.foreach { case (id, _, pred, _) =>
      assert(trainLangs.contains(pred), s"doc $id predicted unseen class $pred")
    }
    // correct flag is consistent with the columns it summarizes
    preds.foreach { case (_, lang, pred, ok) => assert(ok === (lang == pred)) }
    // better than chance on the 5-class problem (weak synthetic signal,
    // but the prior-informed classifier must beat uniform guessing)
    val acc = preds.count(_._4).toDouble / preds.length
    assert(acc > 1.0 / trainLangs.size, s"accuracy $acc at or below chance")
  }

  test("NB classifier is deterministic across runs") {
    val a = ClassifierOps.nbClassify(spark, sfDir).collect().toSeq
    val b = ClassifierOps.nbClassify(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
