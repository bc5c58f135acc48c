package graft.tools

/** Round-6 probe: is the WAV codec's cost per-row work or contention on
  * the synchronized `AudioSystem` SPI registry? Times encode+decode of N
  * payloads single-threaded vs 32-way parallel; linear scaling ⇒ per-row
  * work, collapse ⇒ registry contention (the q_decode_audio_features 22×
  * rehearsal outlier's suspect). Also times the per-partition
  * provider-hoisted decode for comparison. */
object R6AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val threads = 32
    val payload = Array.tabulate(600)(i => (i % 251).toByte)
    val wav = graft.multimodal.Multimodal.encodeWav(payload)
    def bench(label: String)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      work(n)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // A dedicated fixed pool — NOT the ForkJoin common pool, whose
    // parallelism is cores-1, which would understate the claimed
    // concurrency — with the remainder iterations distributed so every
    // arm does exactly n ops and wall clocks compare like for like.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    def parallelArm(op: () => Unit): Unit = {
      val tasks = (0 until threads).map { t =>
        val mine = n / threads + (if (t < n % threads) 1 else 0)
        java.util.concurrent.CompletableFuture.runAsync(
          () => { var i = 0; while (i < mine) { op(); i += 1 } }, pool)
      }
      tasks.foreach(_.join())
    }
    // warm
    (1 to 1000).foreach(_ => graft.multimodal.Multimodal.decodeWavBytes(wav))
    bench("decode 1-thread") { n =>
      var i = 0; while (i < n) { graft.multimodal.Multimodal.decodeWavBytes(wav); i += 1 }
    }
    bench(s"decode $threads-thread") { _ =>
      parallelArm(() => graft.multimodal.Multimodal.decodeWavBytes(wav))
    }
    bench("encode 1-thread") { n =>
      var i = 0; while (i < n) { graft.multimodal.Multimodal.encodeWav(payload); i += 1 }
    }
    bench(s"encode $threads-thread") { _ =>
      parallelArm(() => graft.multimodal.Multimodal.encodeWav(payload))
    }
    pool.shutdown()
  }
}
