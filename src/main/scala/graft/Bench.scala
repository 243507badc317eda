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
      // bench the streaming keys against the state-store provider the
      // operators document for 100-TB state, not only the in-memory
      // default — the recorded state_rows then describe the production
      // pairing
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // r15 bench-inflation arbitration (r16): the generated-class cache
      // (StaticSQLConf CODEGEN_CACHE_MAX_ENTRIES) defaults to 100 — far
      // below this suite's ~150 keys × several codegen stages each, so
      // by pass 2 every key was paying janino recompiles of classes it
      // compiled in pass 1. That thrash grew WITH SUITE SIZE, which is
      // why r15 (148 keys) read uniformly ~1.25× of r14 (124) on keys
      // whose code never changed, q-keys least (few stages), BQL keys
      // worst (b01 0.43→1.01). A/B at 152 keys: 87.9 s → 73.3 s suite,
      // b01 back to 0.30. Sized to hold every stage of a few hundred
      // keys; memory cost is class metadata, not heap data.
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session warmup (codegen, shuffle service, first-job setup)
    // so the first map entry isn't charged ~5s of JVM cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    // amortized shared setup, charged to setup rather than to whichever
    // key happens to run first: the BQL engine (table registration +
    // CREATE/INITIALIZE/ANALYZE of the shared generators), the model-key
    // ensemble, and the synthetic-media fixture. Operator-algorithm
    // caches (MinHash candidates, IVF index) stay inside the timed keys —
    // they ARE the measured work.
    val setup0 = System.nanoTime()
    operators.BqlQueries.bdb(spark, sfDir)
    operators.ModelQueries.customerModel(spark, sfDir)
    operators.PipelineQueries.warmMedia(spark, sfDir)
    val setupSec = (System.nanoTime() - setup0) / 1e9
    // harness-only keys (r13 verdict #5): st06's complete-mode drain
    // re-emits EVERY session through a driver memory sink each batch —
    // an oracle-compare harness, not a production path (that's st07's
    // append+salt+merge, which stays benched). It remains a correctness
    // key in Verify; timing it only records the drain's cost.
    val benchExcluded = Set("st06_stream_sessionize")
    // sorted order: Map iteration order shifts when keys are added, which
    // moved warm-cache/JIT effects between keys across rounds and made
    // per-key cross-round comparison noisy
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => benchExcluded.contains(n) }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    // Two full alternating passes (suite A, then suite B) rather than
    // back-to-back repeats of each key: a transient host-throttle episode
    // then poisons at most one of a key's two samples, and min(a, b) is a
    // throttle-robust estimate of the key's true cost. Keys whose two
    // samples disagree by >3x are flagged suspect so a polluted run is
    // detectable from the JSON alone.
    val pass1 = keys.map { case (n, f) => n -> timeOne(n, f) }.toMap
    // drop operator-algorithm caches built during pass 1 (MinHash
    // candidates, IVF index) so pass 2 is cold too — min(a, b) must
    // estimate the key's true cost, not a warm-cache rerun
    operators.PipelineQueries.resetOperatorCaches()
    val pass2 = keys.map { case (n, f) => n -> timeOne(n, f) }.toMap
    // arbitration pass: a key whose two samples spread >3x (slow one
    // >1 s) gets ONE more cold sample, so a single host-throttle episode
    // is outvoted instead of permanently flagging the key suspect in the
    // durable record; failed samples re-probe too
    def spread2(a: Double, b: Double): Boolean =
      a > 0 && b > 0 && math.max(a, b) / math.min(a, b) > 3.0 && math.max(a, b) > 1.0
    val arbKeys = keys.filter { case (n, _) =>
      spread2(pass1(n), pass2(n)) || pass1(n) < 0 || pass2(n) < 0 }
    val pass3: Map[String, Double] =
      if (arbKeys.isEmpty) Map.empty
      else {
        operators.PipelineQueries.resetOperatorCaches()
        arbKeys.map { case (n, f) => n -> timeOne(n, f) }.toMap
      }
    val results = keys.map { case (name, _) =>
      val all = Seq(pass1(name), pass2(name)) ++ pass3.get(name)
      val ok = all.filter(_ >= 0).sorted
      val best = ok.headOption.getOrElse(-1.0)
      // materiality guard: sub-second spread is JIT/cache warmup, not
      // throttle — only flag when the spread survives arbitration (the
      // two FASTEST samples still disagree >3x with the slower >1 s)
      val suspect = ok.length >= 2 && spread2(ok(0), ok(1))
      (name, best, all, suspect)
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val samples = results.map { case (k, _, all, _) =>
      s"\"" + k + "\":" + all.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val suspects = results.collect { case (k, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // failed keys (-1.0 samples) as an explicit top-level list: a gate
    // reading only "queries" once green-lit a round where two keys had
    // silently regressed to -1 — failures must be loud in the record
    val failed = results.collect { case (k, best, _, _) if best < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // final state-store rows per streaming key (RocksDB-backed, above):
    // the durable "state stays bounded" evidence — st04/st05's totals
    // are horizon-evicted band-bucket keys, st06's are per-(user, day)
    // open sessions, all orders of magnitude below row count
    val stateRows = streaming.StreamingQueries.lastStateRows.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val excluded = benchExcluded.toSeq.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$samples,"suspect":$suspects,"failed":$failed,"excluded_harness_only":$excluded,"state_rows":$stateRows,"setup_sec":$setupSec,"sf":"$sfDir"}"""
    // the driver's log capture keeps only a ~2000-char tail — the FULL
    // record (108 keys × 2-3 samples) hasn't fit it since r11, so
    // BENCH_r11/r12.json both ended up parsed:null. Persist the full
    // JSON to a repo file as the durable record, print it once for the
    // log, and make the FINAL stdout line a COMPACT record that always
    // fits the tail window: totals + the headline q-keys + failure/
    // suspect lists + streaming state rows, with a pointer to the full
    // file — no per-key arrays.
    // Round-suffix the file (current round = max driver-written
    // BENCH_r{N}.json + 1, GRAFT_ROUND overrides) so a later round never
    // overwrites an earlier round's local record.
    val round = RoundInference.current("BENCH")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"BENCH_local_r$round.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(json) finally w.close()
      println(s"[bench] full record written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(json)
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val headline = results.filter(_._1.startsWith("q"))
      .map { case (k, v, _, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$headline,"n_keys":${results.size},"failed":$failed,"suspect":$suspects,"excluded_harness_only":$excluded,"state_rows":$stateRows,"setup_sec":${r3(setupSec)},"sf":"$sfDir","full_record":"$outPath"}"""
    try spark.stop() catch { case _: Throwable => () }
    println(compact)
  }
}
