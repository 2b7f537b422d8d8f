package graft

import java.nio.file.{Files, Paths}

import graft.operators.VectorOps
import graft.streaming.VectorIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming vector-store ingest must (a) assign cells with the exact
  * batch argmin arithmetic, (b) stay exactly-once under re-delivery, and
  * (c) produce a layout where a cell filter prunes at the FILE level —
  * the property that makes the store an IVF index and not just a pile of
  * vectors. */
class VectorIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  test("cell-partitioned ingest: batch-exact assignment, exactly once, file-level pruning") {
    val root = Files.createTempDirectory("graft-vecs")
    val (src, store, ckpt, seen) =
      (s"$root/src", s"$root/store", s"$root/ckpt", s"$root/seen")
    Files.createDirectories(Paths.get(src))
    val cents = VectorOps.seedCentroids(spark, sfDir)

    def run(): Unit = {
      val q = VectorIngest.start(spark, src, store, ckpt, seen, cents)
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    // delivery + an at-least-once re-delivery of the same file
    for (name <- Seq("v1.parquet", "v2.parquet"))
      Files.copy(Paths.get(s"$sfDir/embeddings.parquet"), Paths.get(s"$src/$name"))
    run()

    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nVecs = vecs.count()
    val stored = spark.read.parquet(store)
    assert(stored.count() == nVecs,
      s"re-delivery duplicated vectors: ${stored.count()} vs $nVecs")

    // assignment parity with the batch argmin
    val expected = VectorOps.assignCells(vecs, cents)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partition-discovered `cell` comes back as int; normalize to long
    val got = stored.select(col("vec_id"), col("cell").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "streamed cell assignment diverged from batch argmin")

    // a cell filter must READ only that cell's files — assert on the
    // scan's numFiles metric after execution (inputFiles reflects the
    // whole relation, not pruning)
    val someCell = expected.values.head
    val allFiles = spark.read.parquet(store).inputFiles.length
    val pruned = spark.read.parquet(store).filter(col("cell") === someCell)
    // collect() drives pruned's OWN queryExecution — count() would build
    // a fresh plan and leave this one's metrics at zero
    assert(pruned.collect().length == expected.values.count(_ == someCell))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the pruned plan"))
    val read = scan.metrics("numFiles").value
    assert(read < allFiles && read >= 1,
      s"cell filter read $read of $allFiles files — no partition pruning")
    // the predicate must be a PARTITION filter (scan.toString always
    // prints the "PartitionFilters:" header, even empty — assert on the
    // actual filter list)
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"cell predicate not applied as a partition filter:\n$scan")

    // restart with one more re-delivery: nothing changes
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"), Paths.get(s"$src/v3.parquet"))
    run()
    assert(spark.read.parquet(store).count() == nVecs)
  }

  test("PQ codes persist at ingest: round-trip, code-only ADC serving, file pruning") {
    val root = Files.createTempDirectory("graft-vecpq")
    val (src, store, ckpt, seen) =
      (s"$root/src", s"$root/store", s"$root/ckpt", s"$root/seen")
    Files.createDirectories(Paths.get(src))
    val cents = VectorOps.seedCentroids(spark, sfDir)
    val cb = VectorOps.trainPqCodebook(spark, sfDir)
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"), Paths.get(s"$src/v1.parquet"))
    val q = VectorIngest.start(spark, src, store, ckpt, seen, cents, pqCodebook = Some(cb))
    try q.awaitTermination() finally if (q.isActive) q.stop()

    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // codes column round-trips: stored codes == a fresh batch encode
    val expected = VectorOps.withPqCodes(vecs, cb)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val stored = spark.read.parquet(store)
    assert(stored.columns.contains("codes"), stored.columns.mkString(","))
    val got = stored.select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == expected, "stored PQ codes diverged from the batch encode")

    // serving: ADC from stored codes matches the encode-path ADC ranking
    val pv = vecs.filter(col("vec_id") === VectorOps.PROBE_ID)
      .select(col("v")).collect().head.getSeq[Double](0).toArray
    val pd = VectorOps.adcTable(cb, pv)
    val someCells = stored.select(col("cell").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted.take(2).toSeq
    val served = VectorIngest.searchAdc(spark, store, someCells, pd, 5)
    val servedRows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expServe = VectorOps.withPqCodes(
        VectorOps.assignCells(vecs, cents).filter(col("cid").isin(someCells: _*)), cb)
      .select(col("vec_id"),
        graft.functions.Fns.roundP(VectorOps.adcFromCodes(pd).cast("double"), 6)
          .as("adc_dist2"))
      .orderBy(col("adc_dist2"), col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(servedRows.toSeq == expServe.toSeq,
      s"code-served ADC diverged: ${servedRows.toSeq} vs ${expServe.toSeq}")

    // the serving scan must NOT read the raw vector column, and the cell
    // filter must still prune at the file level
    val plan = served.queryExecution.executedPlan
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the serving plan"))
    assert(!scan.requiredSchema.fieldNames.contains("v"),
      s"serving read the raw vectors: ${scan.requiredSchema.fieldNames.mkString(",")}")
    assert(scan.partitionFilters.exists(_.toString.contains("cell")),
      s"cell predicate not a partition filter:\n$scan")
    val allFiles = spark.read.parquet(store).inputFiles.length
    assert(scan.metrics("numFiles").value < allFiles,
      "serving scan read every file — no partition pruning")
  }

  test("cosine dedup at ingest rejects near-copies against the store and within a batch") {
    val root = Files.createTempDirectory("graft-vecdedup")
    val (src, store, ckpt, seen) =
      (s"$root/src", s"$root/store", s"$root/ckpt", s"$root/seen")
    Files.createDirectories(Paths.get(src))
    val cents = VectorOps.seedCentroids(spark, sfDir)
    val T = 0.9 // max natural pairwise cosine in this corpus is 0.479

    def run(): Unit = {
      val q = VectorIngest.start(spark, src, store, ckpt, seen, cents,
        dedupCosine = Some(T))
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    def deliver(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = s"$root/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      val pf = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail("no part file"))
      Files.copy(pf, Paths.get(s"$src/$name.parquet"))
    }
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    deliver("b1", base)
    run()
    val n = base.count()
    assert(spark.read.parquet(store).count() == n,
      "naturally distinct corpus must ingest fully at T=0.9")

    // batch 2: near-copies of stored vectors (same direction, scaled —
    // cosine 1.0) under fresh ids, one genuinely new direction, and a
    // within-batch near-pair of that new direction
    val nearCopies = base.limit(5)
      .select((col("vec_id") + lit(5000000L)).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * lit(1.01f)).as("embedding"),
        col("label"))
    val dim = base.selectExpr("size(embedding)").head().getInt(0)
    import spark.implicits._
    val fresh = Seq(
      (9000001L, Array.tabulate(dim)(i => if (i % 2 == 0) 5.0f else -5.0f), 0),
      (9000002L, Array.tabulate(dim)(i => if (i % 2 == 0) 5.05f else -5.05f), 0))
      .toDF("vec_id", "embedding", "label")
    deliver("b2", nearCopies.unionByName(fresh))
    run()
    val ids = spark.read.parquet(store).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ids.exists(i => i >= 5000000L && i < 9000000L),
      s"near-copies of stored vectors must be rejected: ${ids.filter(_ >= 5000000L)}")
    assert(ids.contains(9000001L), "genuinely new direction must land")
    assert(!ids.contains(9000002L), "within-batch near-pair: larger id must drop")
    assert(spark.read.parquet(store).count() == n + 1)
  }

  test("trained k-means centroids persist as a blob: reload == retrain bit-for-bit (r12 advice)") {
    // 1st call: trains (or reloads a blob an earlier suite/JVM left —
    // either way the values must equal a fresh retrain)
    VectorOps.clearCentroidCache()
    val first = VectorOps.kmeansCentroids(spark, sfDir)
    val trainsAfterFirst = VectorOps.kmeansTrainCount
    // 2nd call, in-JVM cache dropped: must come from the DISK blob — no
    // new Lloyd run — and reproduce the doubles exactly
    VectorOps.clearCentroidCache()
    val reloaded = VectorOps.kmeansCentroids(spark, sfDir)
    assert(VectorOps.kmeansTrainCount == trainsAfterFirst,
      "second call retrained instead of reloading the persisted blob")
    assert(reloaded == first, "blob reload diverged from the trained centroids")
    // and both match an explicit fresh retrain (blob wrote what training produced)
    val retrained = VectorOps.trainKmeansCentroids(spark, sfDir)
    assert(retrained == first, "persisted centroids diverge from a fresh Lloyd run")
  }

  test("recall monitor: stream matches a from-scratch batch mirror, replay identical") {
    val root = Files.createTempDirectory("graft-recmon")
    val (src, store, ckpt, seen, mon, mckpt) =
      (s"$root/src", s"$root/store", s"$root/ckpt", s"$root/seen",
        s"$root/mon", s"$root/mckpt")
    Files.createDirectories(Paths.get(src))
    val cents = VectorOps.seedCentroids(spark, sfDir)

    // two-file split with DISTINCT mtimes so both streaming queries see
    // the same file order (FileStreamSource orders by timestamp)
    def deliver(name: String, idOffset: Long, mtime: Long): Unit = {
      val stage = s"$root/stage_$name"
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .withColumn("vec_id", col("vec_id") + lit(idOffset))
        .coalesce(1).write.parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      val pf = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail("no part file"))
      val dst = Paths.get(s"$src/$name.parquet")
      Files.copy(pf, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis()
    deliver("v1", 0L, t0 - 60000)
    deliver("v2", 1000000L, t0 - 30000)
    // ingest first (the monitor runs at-or-behind the ingest)
    val qi = VectorIngest.start(spark, src, store, ckpt, seen, cents)
    try qi.awaitTermination() finally if (qi.isActive) qi.stop()
    def runMonitor(c: String): Unit = {
      val qm = VectorIngest.startRecallMonitor(spark, src, store, mon, c, cents)
      try qm.awaitTermination() finally if (qm.isActive) qm.stop()
    }
    runMonitor(mckpt)

    // ---- from-scratch mirror (the Hnsw2RecallSpec discipline) ----
    def round(x: Double, p: Int) = { val m = math.pow(10, p); math.floor(x * m + 0.5) / m }
    def d2(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val file0 = base // mtime order: v1 (offset 0) is batch 0
    val file1 = base.map { case (id, v) => (id + 1000000L, v) }
    val cellOf: Array[Double] => Int = v =>
      cents.map { case (cid, cv) => (d2(v, cv.toArray), cid) }.minBy(identity)._2
    def topk(qid: Long, qv: Array[Double],
             pool: Seq[(Long, Array[Double])]): Set[Long] =
      pool.filter(_._1 != qid).map(t => (round(d2(t._2, qv), 6), t._1))
        .sortBy(identity).take(VectorOps.TOPK).map(_._2).toSet
    def mirror(batchRows: Seq[(Long, Array[Double])],
               visible: Seq[(Long, Array[Double])]): Seq[(Long, Long, Double)] = {
      val probes = batchRows.filter(_._1 % VectorOps.KJ_MOD == 0)
        .sortBy(_._1).take(VectorOps.AR_QUERIES)
      probes.map { case (qid, qv) =>
        val exact = topk(qid, qv, visible)
        val routed = cents.map { case (cid, cv) => (d2(qv, cv.toArray), cid) }
          .sortBy(identity).take(2).map(_._2).toSet
        val ann = topk(qid, qv, visible.filter(t => routed.contains(cellOf(t._2))))
        val hit = exact.count(ann.contains).toLong
        (qid, hit, round(hit.toDouble / exact.size, 4))
      }
    }
    def register(b: Long): Seq[(Long, Long, Double)] =
      spark.read.parquet(s"$mon/batch=$b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val want0 = mirror(file0.toSeq, file0.toSeq)
    val want1 = mirror(file1.toSeq, (file0 ++ file1).toSeq)
    assert(want0.nonEmpty && want1.nonEmpty, "mirror selected no probes")
    assert(register(0) == want0, s"batch-0 register diverged:\n${register(0)}\nvs\n$want0")
    assert(register(1) == want1, s"batch-1 register diverged:\n${register(1)}\nvs\n$want1")

    // crash replay: wipe ONLY the checkpoint — both files re-deliver with
    // the same batch ids and must overwrite identical registers
    val before = spark.read.parquet(mon)
      .collect().map(_.toString).sorted
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rm); Files.delete(p)
    }
    rm(Paths.get(mckpt))
    runMonitor(s"$root/mckpt2")
    val after = spark.read.parquet(mon)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "replay must recompute identical registers")
  }
}
