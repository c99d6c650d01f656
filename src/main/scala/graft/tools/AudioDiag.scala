package graft.tools

import graft.multimodal.Multimodal

/** Single-JVM microbenchmark of the WAV encode/decode kernel, outside
  * Spark entirely — attributes multimodal_audio's per-clip cost to
  * encode vs AudioSystem container sniff vs stream read vs the sample
  * loop (the sf100 cell read ~7 ms/clip/core, ~10x what the byte work
  * explains; this isolates where it goes). Not a library path.
  *
  * Run: `runMain graft.tools.AudioDiag [nClips]`
  */
object AudioDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    // warmup
    (0 until 2000).foreach { i =>
      val b = Multimodal.encodeWav(i.toLong, i % 480 + 32, 16000)
      consume(decode(b))
    }
    var t0 = System.nanoTime()
    val payloads = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { payloads(i) = Multimodal.encodeWav(i.toLong, i % 480 + 32, 16000); i += 1 }
    val encUs = (System.nanoTime() - t0) / 1e3 / n

    // decode via the production path (AudioSystem sniff + stream read)
    t0 = System.nanoTime()
    i = 0
    var acc = 0L
    while (i < n) { acc += decode(payloads(i)); i += 1 }
    val decUs = (System.nanoTime() - t0) / 1e3 / n

    // decode with the sniff only (no byte consumption)
    t0 = System.nanoTime()
    i = 0
    while (i < n) {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payloads(i)))
      ais.close(); i += 1
    }
    val sniffUs = (System.nanoTime() - t0) / 1e3 / n

    println(f"""{"clips":$n,"encode_us":$encUs%.2f,"decode_us":$decUs%.2f,"sniff_us":$sniffUs%.2f,"acc":$acc}""")
  }

  private def decode(payload: Array[Byte]): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val f = ais.getFormat
      val bytes = ais.readAllBytes()
      val ch = f.getChannels
      var c0 = 0L
      val frames = bytes.length / (2 * ch)
      var i = 0
      while (i < frames) {
        val off = i * ch * 2
        c0 += math.abs((((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort).toLong)
        i += 1
      }
      c0
    } finally ais.close()
  }

  private def consume(x: Long): Unit = if (x == Long.MinValue) println("x")
}
