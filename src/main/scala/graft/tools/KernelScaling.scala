package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import graft.codec.BlockCodec

/** Pure-JVM kernel scaling probe (no Spark): encode fixed blocks on T
  * threads; if aggregate throughput stops growing with T, the kernels
  * are memory-bandwidth-bound on this box and Spark-level scaling
  * inherits that ceiling.
  *   sbt "runMain graft.tools.KernelScaling"
  */
object KernelScaling {

  private lazy val blocks: Array[Array[Int]] = {
    val rng = new scala.util.Random(3)
    val phrases = Array.fill(30)(Array.fill(3 + rng.nextInt(6))(rng.nextInt(30000)))
    val bs: Array[Array[Int]] = Array(
      Array.fill(1000000)(rng.nextInt(4096)),                      // bitpack
      Array.fill(250)(rng.nextInt(40)).flatMap(v => Array.fill(4000)(v)), // rle
      Array.fill(180000)(phrases(rng.nextInt(30))).flatten.take(1000000), // fsst/dict
      Array.fill(1000000)((1 << 27) + rng.nextInt(1 << 12))        // for
    )
    bs.foreach(b => BlockCodec.encodeAuto(b, b.length)) // warm JIT
    bs
  }

  /** Aggregate kernel tokens/sec on T threads — callable from Bench
    * so the compute-scaling evidence (linear below the bandwidth
    * ceiling) lands in the official JSON.
    */
  def measure(t: Int): Double = {
    val tokensPerRound = blocks.map(_.length.toLong).sum
    val pool = Executors.newFixedThreadPool(t)
    val rounds = t * 4
    val t0 = System.nanoTime()
    val futures = (0 until rounds).map { r =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val b = blocks(r % blocks.length)
          BlockCodec.encodeAuto(b, b.length)
        }
      })
    }
    pool.shutdown()
    require(pool.awaitTermination(600, TimeUnit.SECONDS),
      "kernel-scaling pool timed out — throughput would be bogus")
    // surface worker exceptions: a silently-failed round would inflate
    // the tokens/sec that lands in the official bench JSON
    futures.foreach(_.get())
    val secs = (System.nanoTime() - t0) / 1e9
    (tokensPerRound * rounds / blocks.length) / secs
  }

  def main(args: Array[String]): Unit =
    Seq(1, 8, 32).foreach { t =>
      println(f"threads=$t%2d aggregate_tokens_per_sec=${measure(t).toLong}")
    }
}
