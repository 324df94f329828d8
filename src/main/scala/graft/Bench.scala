package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so the first measured query doesn't pay JVM
    // startup: touch each table once, then run one synthetic plan that
    // exercises the heavy engine paths (whole-stage codegen, hash
    // aggregate, exchange, sort-merge machinery, window) WITHOUT touching
    // any measured query or its data — per-query numbers then compare
    // across rounds free of a ~4-5 s first-entry JIT artifact.
    graft.Tables.all.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val a = spark.range(0, 100000).select(col("id"), (col("id") % 97).as("k"))
      val b = spark.range(0, 97).select(col("id").as("k"), (col("id") * 3).as("v"))
      a.join(b, "k")
        .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("id")))
        .groupBy("k").agg(sum("v").as("s"), max("rn").as("m"))
        .orderBy(col("s").desc).limit(5).collect()
    }
    // Calibration probe: a FIXED synthetic workload (shuffle + window sort
    // + hash aggregate over spark.range — no test data, no measured query)
    // timed exactly like a query. Machine-load drift between sweeps is
    // uniform and multiplicative when SUSTAINED (r8: +19%, r9: +28%, all
    // uniform per-query), so the published band is stated as
    // total / load_factor. Three measured failure modes shape the
    // formula, each falsifying a stronger use of the probe:
    // (1) a single START probe over-corrects under transient load (r10
    // driver: start 1.685 vs end 0.918 — normalized landed 35% below
    // band) → probe at START, MID, and END, use the MEDIAN;
    // (2) the probe's own idle-machine noise is ±17% (medians 0.88–1.17)
    // while raw sweep totals move only ±5% — dividing by a near-idle
    // probe ADDS variance (an r11 idle close-out normalized 7% ABOVE any
    // observed raw total);
    // (3) probes sample INSTANTS while the sweep time-averages: an r11
    // run caught background spikes at 2 of 3 probe instants (1.351/
    // 1.796) on a sweep whose raw total was the round's FASTEST —
    // median-of-3 normalization put it 8% below every observed raw.
    // So the probe is a coarse load DETECTOR, not a fine corrector: the
    // correction DETECTS at detectAt = 1.8 s (healthy sweeps measured
    // probe medians ≤ 1.36, so firing requires 2 of 3 instants showing a
    // ≥ ~80% slowdown — beyond anything a healthy run produced) and then
    // divides by the FULL slowdown ratio median/idleRef with idleRef =
    // 1.0 s (the observed idle center), because a sustained-load run is
    // slowed by its whole factor, not by its excess over the threshold.
    // Every observed normal-noise run stays load_factor = 1 and compares
    // raw, where the band holds. Known residual: a false fire (2 of 3
    // probes spiking ≥ 80% on an otherwise-healthy sweep) would
    // over-divide; on all observed data the median never exceeded 1.36
    // on a healthy run, and a single 4.27 s probe spike was correctly
    // discarded by the median.
    def calibrateOnce(): Double = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val t0 = System.nanoTime()
      val a = spark.range(0L, 3000000L).select(col("id"),
        (col("id") % 9973).as("k"), (col("id") % 31).as("g"))
      val b = spark.range(0L, 9973L).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      a.join(b, "k")
        .withColumn("rn",
          row_number().over(Window.partitionBy("g").orderBy(col("id"))))
        .groupBy("k").agg(sum(col("v")).as("s"), max(col("rn")).as("m"))
        .orderBy(col("s").desc).limit(10).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      System.gc()
      sec
    }
    def calibrate(): Double = Seq.fill(3)(calibrateOnce()).sorted.apply(1)
    val calStart = calibrate()
    // Deterministic name order: Map iteration is hash order, so adding a
    // query would silently reshuffle execution order between rounds and
    // shift JIT/GC warm-up attribution onto different queries — sorted
    // order keeps per-query numbers comparable round over round.
    // optional comma-separated name-prefix filter for local per-query
    // adjudication runs (the driver never sets it — full sweep)
    val only: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
        case Some(ps) =>
          val pref = ps.split(',').toSeq; name => pref.exists(name.startsWith)
        case None => _ => true
      }
    // Repeat-median: single-shot sweeps drifted 19% total round-over-round
    // on identical code, with individual queries swinging >2x (r8 verdict:
    // q202 6.4->13.6 s, q179 4.4->9.9 s between two same-code driver runs)
    // — JIT/page-cache/GC residue, not plan changes. Each query >= the
    // repeat threshold runs 3x and reports the MEDIAN: one bad sample
    // (deopt storm, compaction pause) can no longer double a recorded
    // time. Sub-threshold queries run once — their absolute noise is
    // bounded by the threshold itself, and skipping their repeats keeps
    // the full 229-query sweep inside a driver-friendly wall clock.
    // NOTE: with SPARK_GRAFT_BENCH_REPEAT=1 (debug knob) the single
    // recorded sample for q211/q212 includes their once-per-session
    // fixture write, which median-of-3 otherwise discards — repeat=1
    // totals are not comparable with default sweeps.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt
    val repeatThreshold =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT_MIN_SEC", "0.3").toDouble
    // r15 verdict item: a query that starts throwing must not silently
    // keep "benching" a plausible-looking wall time — record the failure
    // (name + exception) and surface it in the JSON alongside the numbers.
    val failedQueries = scala.collection.mutable.LinkedHashMap[String, String]()
    def measure(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failedQueries.getOrElseUpdate(name,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
          println(s"[bench-fail] $name ${e.getClass.getName}: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // several operators persist intermediates (band signatures, edge
      // lists); left cached they pile up across the 100+ query session and
      // tax late queries with GC/eviction pressure — clear BETWEEN
      // measurements so each query is timed against a cold cache
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      // broadcast blocks (and checkpointed RDDs) are only released when the
      // driver GCs their references and the ContextCleaner notices — across
      // ~190 queries they otherwise pile up to heap pressure that taxed
      // mid-sweep queries 3-5x vs solo runs (measured: q106/q107 12.7/16.7 s
      // in-sweep vs 3.9/3.4 s solo). An explicit GC between measurements
      // runs OUTSIDE the timed section and keeps each query's heap clean.
      System.gc()
      sec
    }
    val toRun = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => only(q._1))
    val midIdx = toRun.size / 2
    var calMid = calStart // overwritten at the sweep midpoint (kept if empty)
    // Mini-probe SERIES (r13 verdict #1): the 1.8 hard-fire threshold only
    // catches ≥80% sustained slowdown, so a ~20% loaded day — which pushed
    // both r13 sweeps to the top of the published band while solo
    // re-measures showed no code regression — was invisible to it. One
    // single-shot probe every ~40 queries time-samples the whole sweep
    // (~9 instants on the full registry, ~0.4 s each, all OUTSIDE the
    // measured sections); the series MEDIAN is robust to the transient
    // spikes that poisoned single-instant probes (r11: 2 of 3 instants
    // caught background spikes on the round's fastest sweep). The series
    // detects — it never corrects: a mild fire flags the sweep as
    // load-inflated for the round notes, and the committed number is
    // re-measured on a quieter box rather than divided by a noisy factor.
    // Per-SEGMENT load attribution (r14 verdict #2): the series median
    // catches sustained load but not WAVES — the r14 driver sweep carried
    // probes 2.42/2.45/3.65 mid-sweep (median 1.71, under the 1.75 fire)
    // while queries inside the wave measured up to 3.4x their quiet-box
    // values (q232 12.76 vs 3.73 on identical code). Each ~40-query
    // segment is bracketed by the probe taken at its start and the probe
    // at the next segment's start (the end-of-sweep probe closes the last
    // segment); a segment whose EITHER bracketing probe reads >= 2.0 is
    // flagged and its queries listed — a wave-inflated reading is then
    // machine-identifiable from the JSON without manual solo re-runs.
    // Flag-only, like every other load channel here: nothing is corrected.
    val waveAt = 2.0
    val segStride = 40
    val probeSeries = scala.collection.mutable.ArrayBuffer[Double]()
    val results = toRun.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx == midIdx) calMid = calibrate()
      if (idx % segStride == 0) probeSeries += calibrateOnce()
      val first = measure(name, fn)
      val samples =
        if (first >= repeatThreshold && repeats > 1)
          first +: Seq.fill(repeats - 1)(measure(name, fn))
        else Seq(first)
      val sorted = samples.sorted
      val median = sorted(sorted.size / 2)
      if (samples.size > 1)
        println(f"[bench-samples] $name " +
          samples.map(s => f"$s%.3f").mkString("/"))
      name -> median
    }
    // Per-query times rounded to ms: keeps the one-line JSON ~3× shorter
    // (a byte-limited tail capture truncated the r6 line mid-map, losing
    // 100 of 159 per-query times); sub-ms digits are noise anyway.
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Per-third raw sums (fixed sorted query order, so thirds are the
    // same query sets round over round): the corroborating signal for a
    // probe fire. Probes sample instants; a SUSTAINED load (the only case
    // the 1.8 threshold corrects) inflates all three thirds together,
    // while a false fire (2 of 3 probes catching spikes on a healthy
    // sweep) leaves the thirds in their normal round-over-round band —
    // logged into the JSON so every fire is auditable against the prior
    // round's thirds, with no post-hoc interpretation.
    val thirds: Seq[Double] =
      if (results.isEmpty) Seq(0.0, 0.0, 0.0)
      else results.grouped((results.size + 2) / 3).toSeq
        .map(_.map(_._2).sum).padTo(3, 0.0)
    val calEnd = calibrate()
    probeSeries += calEnd
    val calMedian = Seq(calStart, calMid, calEnd).sorted.apply(1)
    val detectAt = 1.80 // sustained-load detection threshold (see above)
    val idleRef = 1.0   // idle probe center: the divisor once detected
    val loadFactor = if (calMedian >= detectAt) calMedian / idleRef else 1.0
    val seriesSorted = probeSeries.toSeq.sorted
    val seriesMedian = seriesSorted(seriesSorted.size / 2)
    // Mild-sustained-load detection, two independent channels (both flag,
    // neither corrects):
    // (1) probe-series median ≥ 1.75. The in-sweep series samples a
    //     DIFFERENT distribution than the isolated start/mid/end probes:
    //     on three probe-quiet idle full sweeps (r14 band derivation) the
    //     series medians were 1.50/1.54/1.47 — centered at ~1.5 by
    //     in-JVM residue (old-gen pressure, post-query GC), not at the
    //     1.0 idle center of boundary probes — while being remarkably
    //     stable sweep-to-sweep (±2%). 1.75 therefore catches ≥~17%
    //     sustained inflation over the calibrated in-sweep center, far
    //     below the 1.8 boundary-probe hard fire (the r13 failure mode:
    //     a ~20% loaded day invisible to the 1.8 threshold).
    // (2) all three thirds ≥ 15% above the committed reference thirds in
    //     BENCH_BAND.json (fixed sorted query order makes thirds the same
    //     query sets round over round; a uniform all-thirds inflation is
    //     the signature of sustained load, while a real code regression
    //     moves only the third(s) holding the touched queries).
    val mildProbe = loadFactor == 1.0 && seriesMedian >= 1.75
    val bandRefThirds: Option[Seq[Double]] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) None
      else {
        val parsed = scala.util.Try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get("BENCH_BAND.json")),
            java.nio.charset.StandardCharsets.UTF_8)
          val m = """"thirds_ref"\s*:\s*\[([^\]]*)\]""".r
            .findFirstMatchIn(txt).get
          m.group(1).split(',').toSeq.map(_.trim.toDouble)
        }.toOption.filter(_.size == 3)
        // a silently-absent band file would disable one of the two mild-
        // load channels with no trace (e.g. bench launched from another
        // cwd) — make the degraded state visible in the log
        if (parsed.isEmpty)
          println("[bench-warn] BENCH_BAND.json unreadable or thirds_ref " +
            "unparsable from this cwd - thirds mild-load channel DISABLED " +
            "for this sweep")
        parsed
      }
    val mildThirds = bandRefThirds.exists(ref =>
      loadFactor == 1.0 && thirds.zip(ref).forall { case (t, r) => t >= 1.15 * r })
    val mildLoad = mildProbe || mildThirds
    // wave attribution: segment k covers query indices [40k, 40(k+1));
    // probeSeries(k) was taken at its first query, probeSeries(k+1) at the
    // next segment's first query (the appended end-of-sweep probe closes
    // the final segment)
    case class Seg(start: Int, end: Int, before: Double, after: Double) {
      def flagged: Boolean = before >= waveAt || after >= waveAt
    }
    val segments: Seq[Seg] =
      (0 until (results.size + segStride - 1) / segStride).map { k =>
        // probeSeries holds one probe per segment start + the appended
        // end-of-sweep probe; clamp defensively against an empty tail
        val before = probeSeries(math.min(k, probeSeries.size - 1))
        val after = probeSeries(math.min(k + 1, probeSeries.size - 1))
        Seg(k * segStride,
          math.min((k + 1) * segStride, results.size) - 1, before, after)
      }
    val waveFlagged: Seq[String] = segments.filter(_.flagged)
      .flatMap(s => results.slice(s.start, s.end + 1).map(_._1))
    // host-portable form (r14 verdict #3): totals as RATIOS to the
    // in-sweep probe unit (this sweep's series median) — the probe runs
    // the same synthetic plan on every host era, so the ratio survives a
    // hardware change that rots any absolute-seconds band
    val totalOverUnit = if (seriesMedian > 0) total / seriesMedian else 0.0
    val thirdsOverUnit = thirds.map(t =>
      if (seriesMedian > 0) t / seriesMedian else 0.0)
    println(f"[bench-cal] start=$calStart%.3f mid=$calMid%.3f " +
      f"end=$calEnd%.3f median=$calMedian%.3f load_factor=$loadFactor%.3f " +
      f"thirds=${thirds.map(t => f"$t%.1f").mkString("/")} " +
      f"probe_series=${probeSeries.map(p => f"$p%.2f").mkString("/")} " +
      f"series_median=$seriesMedian%.2f mild_load=$mildLoad " +
      f"(probe=$mildProbe thirds=$mildThirds) " +
      f"normalized_total=${total / loadFactor}%.1f " +
      f"total_over_probe_unit=$totalOverUnit%.1f")
    segments.filter(_.flagged).foreach { s =>
      println(f"[bench-wave] segment q[${s.start}..${s.end}] bracketed by " +
        f"probes ${s.before}%.2f/${s.after}%.2f >= $waveAt%.1f - treat these " +
        f"${s.end - s.start + 1} readings as load-suspect (solo re-measure " +
        "to adjudicate)")
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      f""""calibration":$calStart%.3f,"calibration_mid":$calMid%.3f,""" +
      f""""calibration_end":$calEnd%.3f,""" +
      f""""calibration_median":$calMedian%.3f,""" +
      f""""load_factor":$loadFactor%.3f,""" +
      s""""probe_series":[${probeSeries.map(p => f"$p%.2f").mkString(",")}],""" +
      f""""probe_series_median":$seriesMedian%.2f,""" +
      s""""mild_load":$mildLoad,""" +
      s""""thirds":[${thirds.map(t => f"$t%.1f").mkString(",")}],""" +
      f""""normalized_total":${total / loadFactor}%.1f,""" +
      f""""total_over_probe_unit":$totalOverUnit%.1f,""" +
      s""""thirds_over_probe_unit":[${
        thirdsOverUnit.map(t => f"$t%.1f").mkString(",")}],""" +
      s""""wave_segments":[${segments.map(s =>
        f"""{"q_start":${s.start},"q_end":${s.end},""" +
        f""""probe_before":${s.before}%.2f,"probe_after":${s.after}%.2f,""" +
        s""""flagged":${s.flagged}}""").mkString(",")}],""" +
      s""""wave_flagged_queries":[${
        waveFlagged.map(q => "\"" + q + "\"").mkString(",")}],""" +
      s""""failed_queries":[${failedQueries.keys
        .map(q => "\"" + q + "\"").mkString(",")}],""" +
      s""""queries":$qs,"sf":"$sfDir"}"""
    // Recovery channels for truncated captures: one short line per query
    // immediately before the final JSON (a tail keeps the end of output),
    // plus the full JSON persisted to a file in the repo.
    results.foreach { case (k, v) => println(f"[bench] $k $v%.3f") }
    // a filtered adjudication run must not clobber the full snapshot
    if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) { println(line); spark.stop(); return }
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_last.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
