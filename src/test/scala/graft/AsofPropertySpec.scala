package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Property test: the distributed union+window ASOF join must agree
  * with a naive per-label floor scan (the reference's TreeMap
  * floorEntry semantics, IcebergOfflineStore.java:118-200) on
  * arbitrary feature/label layouts — including equal timestamps,
  * entities with no history, and labels before any feature.
  */
class AsofPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val genEntity = Gen.choose(1, 4).map(i => s"u$i")
  private val genTs = Gen.choose(0L, 50L).map(m => new Timestamp(t0 + m * 60000L))
  private val genFeature = Gen.oneOf("f1", "f2")

  private val genFeatures = Gen.listOfN(25,
    for { e <- genEntity; t <- genTs; f <- genFeature
          v <- Gen.choose(1, 999).map(_ / 10.0) } yield (e, t, f, v))
  private val genLabels = Gen.listOfN(8,
    for { e <- genEntity; t <- genTs } yield (e, t))

  test("asof join == naive floor scan on random layouts") {
    // deterministic seeds — 15 independently generated layouts
    (1 to 15).foreach { round =>
      val p = Gen.Parameters.default
      val feats = genFeatures(p, Seed(round * 7919L)).get
      val labels0 = genLabels(p, Seed(round * 104729L)).get
        val labels = labels0.zipWithIndex
          .map { case ((e, t), i) => (e, t, i.toLong, 1.0) }
        val featDf = feats.toDF("entity_id", "ts", "feature_name", "value_float")
        val labelDf = labels.toDF("entity_id", "ts", "event_id", "value")

        val got = AsofJoin.pointInTime(featDf, labelDf,
          "entity_id", "ts", "feature_name", "value_float",
          "event_id", "value", Seq("f1", "f2"), default = -9.0)
          .collect()
          .map(r => r.getAs[Long]("label_id") ->
            (r.getAs[Double]("f_f1"), r.getAs[Double]("f_f2"))).toMap

        // naive oracle: latest value at-or-before label ts; equal-ts
        // duplicates resolve to the greatest value — the operator's
        // documented deterministic tie-break (window ordered by
        // ..., fname, fval)
        def floor(e: String, t: Timestamp, f: String): Double =
          feats
            .filter { case (fe, ft, ff, _) =>
              fe == e && ff == f && !ft.after(t) }
            .sortBy { case (_, ft, _, v) => (ft.getTime, v) }
            .lastOption.map(_._4).getOrElse(-9.0)

        labels.foreach { case (e, t, id, _) =>
          assert(got(id) == (floor(e, t, "f1"), floor(e, t, "f2")),
            s"label $id entity $e ts $t")
        }
    }
  }
}
