package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Pure-JVM ALU-scaling floor of this host — NO Spark: the exact integer
  * dot kernel of `Ann.embeddingNearDupPairs` (64-dim short vectors,
  * long-accumulated products, cosine-threshold compare) over a fixed
  * all-pairs workload in a bare thread pool, at a given thread count.
  *
  * Purpose: the two-parallelism scaling evidence (local[8] vs local[32])
  * divides 4× the ALU work onto ONE socket — sustained all-core frequency
  * and shared-core resources cap the per-thread throughput at 32 threads
  * below its 8-thread value no matter how perfectly the operator's plan
  * scales. This main measures that cap with zero framework code, so the
  * emb_pairs leg's efficiency can be read against the host's own ceiling
  * (the same role the payload-scan leg plays for the decode kernel). On a
  * real N→4N cluster each node keeps its own clock, so this term does not
  * exist there.
  *
  * Protocol matches BenchScaling legs: fresh JVM per (threads) leg,
  * warm-up pass excluded, min of reps, one JSON line.
  *
  *   runMain graft.AluFloor <threads> [reps]
  */
object AluFloor {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // machine-parsed JSON output
    val threads = args.headOption.map(_.toInt).getOrElse(32)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    // n sized so a rep SUSTAINS the ALU for tens of seconds: a sub-second
    // burst rides turbo clocks a multi-second Spark stage never sees
    // (measured: 0.77 s burst → 54 ns/pair/core @32; the same kernel
    // sustained 13 s inside the emb_pairs stage → ~90 ns/pair/core), so a
    // short floor run OVERSTATES the ceiling the operator is held to.
    val n = 60000
    val d = 64
    val rnd = new java.util.Random(7)
    val v = Array.fill(n)(Array.fill(d)((rnd.nextInt(200) - 100).toShort))
    val norms = v.map { row =>
      var s = 0L; var k = 0
      while (k < d) { s += row(k) * row(k); k += 1 }
      s
    }

    def run(): Long = {
      val ex = Executors.newFixedThreadPool(threads)
      val hits = new AtomicLong
      val next = new AtomicInteger // dynamic 64-row chunks: no tail imbalance
      (0 until threads).foreach { _ =>
        ex.submit(new Runnable {
          def run(): Unit = {
            var h = 0L
            var chunk = next.getAndIncrement()
            while (chunk * 64 < n) {
              var i = chunk * 64
              val hiB = math.min(n, i + 64)
              while (i < hiB) {
                val vi = v(i); val ni = norms(i)
                var j = i + 1
                while (j < n) {
                  val vj = v(j)
                  var dot = 0L; var k = 0
                  while (k < d) { dot += vi(k) * vj(k); k += 1 }
                  if (dot > 0 && dot * dot * 100L >= 81L * ni * norms(j)) h += 1
                  j += 1
                }
                i += 1
              }
              chunk = next.getAndIncrement()
            }
            hits.addAndGet(h)
          }
        })
      }
      ex.shutdown()
      ex.awaitTermination(600, TimeUnit.SECONDS)
      hits.get()
    }

    run() // warm-up: JIT
    val pairs = n.toLong * (n - 1) / 2
    val best = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"job": "alu_floor", "cpus": $threads, "rows": $pairs, "sec": $best%.2f, "ns_per_pair_per_core": ${best * threads * 1e9 / pairs}%.1f}""")
  }
}
