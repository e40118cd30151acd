package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Pure-JVM memory-STREAMING floor of this host — NO Spark: each thread
  * sequentially sums its own private 256 MB long array (working set far
  * beyond every cache level), at a given thread count.
  *
  * Purpose: the executor-shaped scale-out ladder runs 4 concurrent pinned
  * JVMs on one socket. [[AluFloor]] caps what cache-resident COMPUTE can
  * reach there; this main caps what table STREAMING can reach — one DRAM
  * bus serves all four emulated executors, where a real N→4N cluster
  * brings one per node. A streaming-heavy operator (the kNN leg moves
  * ~3 GB of scan + shuffle + cache traffic per JVM) must be read against
  * this ceiling, not against 1.0. Same role the payload-scan leg plays for
  * the decode kernel, in multi-process form.
  *
  * Protocol matches [[AluFloor]]: allocation + first-touch before timing,
  * warm-up pass excluded, min of reps, one JSON line.
  *
  *   runMain graft.MemFloor <threads> [reps] [passes]
  *
  * `passes` sizes the measured wall: 4 passes ≈ 8 GB ≈ 0.2 s at this
  * host's ~45 GB/s — too short for a stable solo/4-way ratio (the 2-decimal
  * print alone quantizes it). 32+ passes give multi-second walls.
  */
object MemFloor {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // machine-parsed JSON output
    val threads = args.headOption.map(_.toInt).getOrElse(8)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val Passes = args.lift(2).map(_.toInt).getOrElse(4)
    val n = (256L << 20).toInt / 8 // 256 MB of longs per thread
    val arrays = Array.tabulate(threads) { t =>
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = t.toLong + i; i += 1 } // first-touch, untimed
      a
    }

    def run(): Long = {
      val ex = Executors.newFixedThreadPool(threads)
      val acc = new AtomicLong
      (0 until threads).foreach { t =>
        ex.submit(new Runnable {
          def run(): Unit = {
            val a = arrays(t)
            var s = 0L
            var p = 0
            while (p < Passes) {
              var i = 0
              while (i < n) { s += a(i); i += 1 }
              p += 1
            }
            acc.addAndGet(s)
          }
        })
      }
      ex.shutdown()
      ex.awaitTermination(600, TimeUnit.SECONDS)
      acc.get()
    }

    run() // warm-up: JIT
    val bytes = threads.toLong * n * 8 * Passes
    val best = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"job": "mem_floor", "cpus": $threads, "rows": $bytes, "sec": $best%.3f, "gb_per_s": ${bytes / best / 1e9}%.1f}""")
  }
}
