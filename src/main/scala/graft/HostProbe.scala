package graft

/** Host-health probes stamped onto every bench line (methodology in
  * BASELINE.md "Round-6 host degradation"). This box is a shared VM whose
  * effective speed swings >10x between rounds; the probes make the host
  * state at measurement time PROVABLE so a slow reading can be attributed
  * (host vs engine) instead of guessed at. Four signals:
  *
  *   - loop_ms          single-thread arithmetic (CPU clock / JIT health)
  *   - sleep100x1ms_ms  timer-wakeup latency (scheduler oversubscription)
  *   - eff_cores        32-way parallel arithmetic throughput, expressed as
  *                      effective core count — catches hypervisor steal that
  *                      single-thread probes miss (r6: "~10 effective cores"
  *                      while loop_ms read healthy)
  *   - dio_w_mbps       O_DIRECT write throughput — catches storage-side
  *                      degradation (r6: 8.3 MB/s vs healthy 250-450) that
  *                      inflates write-heavy rows only
  */
object HostProbe {
  private def spin(): Long = {
    var x = 0L; var i = 0L
    while (i < 30000000L) { x += i * i; i += 1 }; x
  }

  /** (single-thread spin ms, effective cores from a 32-way parallel run).
    * Both sides JIT-warmed; the parallel wall time is the max over threads
    * all started together, so effective cores = threads * single / wall. */
  def cpu(threads: Int = 32): (Long, Double) = {
    spin() // JIT warm on the measuring thread
    // best-of-3 on the SINGLE side too (r15 lesson): the parallel side was
    // already min-of-3, so one slow tick on the lone calibration run —
    // a scheduler preemption mid-loop — inflated eff_cores past the
    // physical core count (the r15 driver stamped 42.7 on a 32-vCPU box,
    // which is arithmetic proof the calibration loop itself ran slow, not
    // that the host was super-healthy). Min on both sides makes the ratio
    // a capacity estimate whose numerator and denominator jitter the same
    // direction.
    val singleMs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); spin()
      math.max(1L, (System.nanoTime() - t0) / 1000000)
    }.min
    val sink = new java.util.concurrent.atomic.AtomicLong()
    // each thread spins 4x the single-thread unit so thread start/join
    // overhead (~ms) is amortized out of a ~100ms measurement window
    val reps = 4
    def runPar(): Long = {
      val start = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(threads)
      (1 to threads).foreach { _ =>
        val th = new Thread(() => {
          start.await()
          var r = 0; while (r < reps) { sink.addAndGet(spin()); r += 1 }
          done.countDown()
        })
        th.setDaemon(true); th.start()
      }
      val t1 = System.nanoTime(); start.countDown(); done.await()
      math.max(1L, (System.nanoTime() - t1) / 1000000)
    }
    runPar() // warm thread-local JIT profiles
    // best-of-3: the probe measures host CAPACITY, so transient jitter
    // should lower-bound, not average into, the reading
    val parMs = (1 to 3).map(_ => runPar()).min
    (singleMs, threads.toDouble * reps * singleMs / parMs)
  }

  /** O_DIRECT write MB/s via `dd oflag=direct` (the exact r6 evidence
    * command), timed wall-clock around the process. Writes `mb` MiB to a
    * temp file on the real filesystem (/tmp is ext4 here, not tmpfs — dd
    * would fail with EINVAL on tmpfs and this returns -1, which is itself
    * a diagnostic). -1 on any failure so the bench line never dies on the
    * probe. */
  def directIoWriteMbps(mb: Int = 32): Double = {
    val f = java.nio.file.Files.createTempFile("graft_dio", ".bin")
    def once(): Double =
      try {
        val t0 = System.nanoTime()
        val p = new ProcessBuilder("dd", "if=/dev/zero", s"of=$f",
          "bs=1M", s"count=$mb", "oflag=direct", "conv=fsync")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        val done = p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
        // a dd that outlives the timeout is exactly the degraded-storage
        // case — kill it rather than leave a runaway writer competing
        // with the benchmark this probe is stamped onto
        if (!done) p.destroyForcibly()
        val ok = done && p.exitValue == 0
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok && sec > 0) mb / sec else -1.0
      } catch { case _: Throwable => -1.0 }
    try {
      val first = once()
      // a timed-out/failed first probe already proves the point — don't
      // launch a second two-minute writer on a dying disk
      if (first < 0) first else math.max(first, once())
    } finally java.nio.file.Files.deleteIfExists(f)
  }
}
