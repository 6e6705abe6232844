package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end workflow of a reference feature-store user, expressed
  * entirely through the Graft facade: register a view → point-in-time
  * training set → deterministic split → materialize vectors → serve →
  * validate. One integration path over real sf0.001 data.
  */
class TrainingPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("register → asof training set → split → materialize → serve → validate") {
    val d = TestSpark.sfDir
    val records = Tables.featureRecords(spark, d)
    val view = Graft.registerView("user_activity", "user", 1,
      Seq("click", "view", "error", "signup"))

    // 1. training set: purchases are labels, features as-of label time
    val ev = Tables.events(spark, d)
    val features = records.select(col("entity_id"), col("event_time").as("ts"),
      col("feature_name"), col("value_float"))
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("string").as("entity_id"), col("ts"),
        col("event_id"), col("value"))
    val training = Graft.pointInTimeJoin(features, labels, view.featureNames)
    val nLabels = labels.count()
    assert(training.count() == nLabels) // one row per label, always

    // 2. deterministic split on the label id
    val split = Graft.trainTestSplit(training, "label_id")
    assert(split.count() == nLabels)
    val trainFrac = split.filter(col("split") === "train").count().toDouble / nLabels
    assert(trainFrac > 0.6 && trainFrac < 0.95)

    // 3. materialize + serve a key batch
    val vectors = Graft.materialize(records, view)
    val keys = ev.select(col("user_id").cast("string").as("entity_id"))
      .distinct().limit(10)
    val served = Graft.serve(vectors, keys)
    assert(served.count() == 10)
    assert(served.columns.toSet ==
      Set("entity_id", "n_default") ++ view.featureNames.map("f_" + _))

    // 4. validation gate over the same records
    val report = Graft.validate(records, view, "2024-02-01 00:00:00",
      view.featureNames.map(_ -> 90L * 86400000L).toMap).head()
    assert(report.getAs[Boolean]("schema_ok"))
    assert(report.getAs[Boolean]("validation_pass"))
  }
}
