package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The scale-parameter registry contract (SURVEY §6.7, VERDICT r13
  * item 3): every knob in [[Knobs.all]] resolves its `spark.graft.*`
  * conf override, the SURVEY table stays in sync with the registry, and
  * the LSH plane-count rule behaves as documented at the boundaries. */
class KnobsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def accessor(key: String): SparkSession => Long = key match {
    case Knobs.LshTargetOccupancyKey => Knobs.lshTargetOccupancy
    case Knobs.UpsertPkBucketsKey => s => Knobs.upsertPkBuckets(s).toLong
    case Knobs.ComponentsBroadcastMaxEdgesKey => Knobs.componentsBroadcastMaxEdges
    case Knobs.GraphBroadcastMaxNodesKey => Knobs.graphBroadcastMaxNodes
    case Knobs.KmeansRoundsKey => s => Knobs.kmeansRounds(s).toLong
    case Knobs.KcorePeelRoundsKey => s => Knobs.kcorePeelRounds(s).toLong
    case Knobs.TrussRoundsKey => s => Knobs.trussRounds(s).toLong
    case Knobs.LabelPropRoundsKey => s => Knobs.labelPropRounds(s).toLong
    case Knobs.BfsRoundsKey => s => Knobs.bfsRounds(s).toLong
    case other => fail(s"knob $other has no accessor mapping in this spec")
  }

  test("every registered knob returns its default unset and its conf override when set") {
    Knobs.all.foreach { case (key, dflt, _) =>
      val get = accessor(key)
      spark.conf.unset(key)
      assert(get(spark) === dflt.toLong, s"$key default")
      // an override distinct from every registry default
      val override_ = dflt.toLong * 2 + 1
      spark.conf.set(key, override_.toString)
      try assert(get(spark) === override_, s"$key override not respected")
      finally spark.conf.unset(key)
    }
  }

  test("knob keys are unique, spark.graft.-prefixed, and classed capacity|rounds") {
    val keys = Knobs.all.map(_._1)
    assert(keys.distinct.size === keys.size, "duplicate knob keys")
    keys.foreach(k => assert(k.startsWith("spark.graft."), s"bad prefix: $k"))
    Knobs.all.foreach { case (k, _, cls) =>
      assert(Set("capacity", "rounds")(cls), s"$k class $cls")
    }
  }

  test("SURVEY §6.7 table lists exactly the registered knobs with their defaults") {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val rows = try src.getLines()
      .flatMap("""^\| `(spark\.graft\.[a-zA-Z.]+)` \| (\d+) \|""".r.findFirstMatchIn(_))
      .map(m => m.group(1) -> m.group(2)).toMap
    finally src.close()
    val registry = Knobs.all.map { case (k, d, _) => k -> d }.toMap
    assert(rows === registry,
      s"SURVEY §6.7 drifted from Knobs.all: doc-only ${rows.keySet -- registry.keySet}, " +
        s"registry-only ${registry.keySet -- rows.keySet}, " +
        s"value drift ${registry.filter { case (k, d) => rows.get(k).exists(_ != d) }.keys}")
  }

  test("lshPlaneCount: integer rule boundaries and monotonicity") {
    import graft.operators.VectorOps.lshPlaneCount
    // floor: every oracle fixture scale stays at the historical 8 planes
    assert(lshPlaneCount(500) === 8)
    assert(lshPlaneCount(2000) === 8)
    assert(lshPlaneCount(8L << 8) === 8) // boundary: occ·2^8 exactly
    assert(lshPlaneCount((8L << 8) + 1) === 9)
    assert(lshPlaneCount(20000) === 12) // SURVEY §6.5b's sf~1 prescription
    assert(lshPlaneCount(1000000000L) === 27)
    // cap at 30 planes (bucket must fit an INT; SQL mirrors via coalesce)
    assert(lshPlaneCount(Long.MaxValue / 16) === 30)
    // monotone non-decreasing in n
    val counts = (1 to 60).map(i => lshPlaneCount(1L << (i / 2)))
    assert(counts === counts.sorted, "plane count must be monotone in n")
    // occupancy knob: larger target → fewer planes
    assert(lshPlaneCount(20000, targetOcc = 128) === 8)
  }

  test("a rounds knob reaches the plan: kmeans at 1 Lloyd round differs from the default 3") {
    // end-to-end evidence the conf override is consumed by the operator,
    // not just by the accessor: fewer Lloyd rounds = a different (less
    // converged) clustering on the dev fixture. Restore the default and
    // re-run to prove the override was the only cause.
    val dir = "/root/testdata/sf0.001"
    def run(): Seq[String] =
      SparkEntry.queries("vec_kmeans")(spark, dir).collect().map(_.toString).toSeq
    spark.conf.unset(Knobs.KmeansRoundsKey)
    val dflt = run()
    spark.conf.set(Knobs.KmeansRoundsKey, "1")
    val one = try run() finally spark.conf.unset(Knobs.KmeansRoundsKey)
    assert(one !== dflt, "1-round clustering must differ from the 3-round default")
    assert(run() === dflt, "unsetting the knob restores the default result")
  }

  test("lshPlanes: adaptive matrix extends the historical 8-plane prefix") {
    import graft.operators.VectorOps.lshPlanes
    val p8 = lshPlanes(8)
    val p12 = lshPlanes(12)
    assert(p8.size === 8 && p12.size === 12)
    assert(p12.take(8) === p8, "plane j is independent of the total count")
    assert(p8.forall(_.size === 64))
    // the integer formula's documented range
    assert(p12.flatten.forall(v => v >= -1.0 && v <= 1.0))
  }
}
