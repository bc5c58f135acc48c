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
    val payload = Array.tabulate(600)(i => (i % 251).toByte)
    val wav = graft.multimodal.Multimodal.encodeWav(payload)
    def bench(label: String)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      work(n)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    (1 to 1000).foreach(_ => graft.multimodal.Multimodal.decodeWavBytes(wav))
    bench("decode 1-thread") { n =>
      var i = 0; while (i < n) { graft.multimodal.Multimodal.decodeWavBytes(wav); i += 1 }
    }
    bench("decode 32-thread") { n =>
      val tasks = (0 until 32).map { _ =>
        java.util.concurrent.CompletableFuture.runAsync { () =>
          var i = 0
          while (i < n / 32) { graft.multimodal.Multimodal.decodeWavBytes(wav); i += 1 }
        }
      }
      tasks.foreach(_.join())
    }
    bench("encode 1-thread") { n =>
      var i = 0; while (i < n) { graft.multimodal.Multimodal.encodeWav(payload); i += 1 }
    }
    bench("encode 32-thread") { n =>
      val tasks = (0 until 32).map { _ =>
        java.util.concurrent.CompletableFuture.runAsync { () =>
          var i = 0
          while (i < n / 32) { graft.multimodal.Multimodal.encodeWav(payload); i += 1 }
        }
      }
      tasks.foreach(_.join())
    }
  }
}
