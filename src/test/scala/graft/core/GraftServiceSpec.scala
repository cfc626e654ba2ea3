package graft.core

import graft.SparkSpec
import graft.matcher.Labels
import graft.modeler.ModelerQueries

/** End-to-end orchestration parity: register datasets -> create model ->
  * train -> predict -> fetch suggestions through the service, plus the
  * CRUD surface (keys/get/update-on-train/delete) and metadata
  * persistence across service instances. */
class GraftServiceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("dataset and model CRUD round-trips on disk") {
    val root = java.nio.file.Files.createTempDirectory("graft-svc").toString
    val svc = new GraftService(root)
    assert(svc.datasetKeys.isEmpty && svc.modelKeys.isEmpty)
    val ds = svc.createDataset("holdout", sf, Labels.holdoutTables)
    val ds2 = svc.createDataset("other", sf, Seq("region" -> Seq("r_name")))
    assert(svc.datasetKeys === Seq(ds.id, ds2.id))
    // a fresh service instance reads the same store (file-backed CRUD)
    val svcReloaded = new GraftService(root)
    val got = svcReloaded.getDataset(ds.id).get
    assert(got.name === "holdout" && got.dir === sf)
    assert(got.tables === Labels.holdoutTables)
    assert(svcReloaded.deleteDataset(ds2.id))
    assert(svcReloaded.datasetKeys === Seq(ds.id))
    assert(!svcReloaded.deleteDataset(ds2.id), "second delete is a no-op")
    assert(svcReloaded.getDataset(ds2.id).isEmpty)
  }

  test("register -> train -> predict -> suggestions end to end") {
    val root = java.nio.file.Files.createTempDirectory("graft-svc-e2e").toString
    val svc = new GraftService(root,
      knownModels = Seq(ModelerQueries.knownOrderModel))
    val train = svc.createDataset("train", sf, Labels.trainTables)
    val holdout = svc.createDataset("holdout", sf, Labels.holdoutTables)
    val model = svc.createModel("semantic-typer")
    assert(svc.getModel(model.id).get.state === "Untrained")

    val st = svc.trainModel(spark, model.id, train.id)
    assert(st === Octopus.Complete)
    assert(svc.getModel(model.id).get.state === "Complete",
      "train state persisted to the model store")
    // trained artifacts live beside the model metadata
    val mdir = java.nio.file.Paths.get(root, "models", model.id.toString)
    assert(java.nio.file.Files.exists(mdir.resolve("pipeline")))
    assert(java.nio.file.Files.exists(mdir.resolve("alignment.json")))

    val pred = svc.predictModel(spark, model.id, holdout.id)
    assert(pred.columnPredictions.count() === Labels.holdout.size.toLong)
    val sugg = svc.suggestions(spark, model.id, holdout.id)
    assert(sugg.nonEmpty && sugg.forall(_.model.isConnected))

    // a fresh service instance (new JVM in production) rehydrates the
    // trained model from disk and predicts without retraining
    val svc2 = new GraftService(root,
      knownModels = Seq(ModelerQueries.knownOrderModel))
    val pred2 = svc2.predictModel(spark, model.id, holdout.id)
    assert(pred2.columnPredictions.count() === Labels.holdout.size.toLong)

    assert(svc.deleteModel(model.id))
    assert(svc.getModel(model.id).isEmpty)
  }

  test("train on a missing dataset fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-svc-err").toString
    val svc = new GraftService(root)
    val model = svc.createModel("m")
    intercept[NoSuchElementException] {
      svc.trainModel(spark, model.id, 99)
    }
  }
}
