package graft.tools

/** Microbench for the t33/t34/t41 codec constant: where do the ~45
  * µs/row go — WAV encode (AudioSystem.write + SPI scan), decode
  * (AudioSystem.getAudioInputStream + SPI scan), or the sample math?
  * Run: sbt "Test/runMain graft.tools.CodecBench [n]"
  * No Spark session — this is pure JVM codec cost.
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    def synth(docId: Long): Array[Short] = {
      val ns = (64 + (docId * 131) % 128).toInt
      Array.tabulate(ns)(i => (((docId * 37 + i.toLong * 11) % 4001) - 2000).toShort)
    }
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/row")
    }
    // warmup
    (0 until 2000).foreach { i =>
      val wav = graft.multimodal.Multimodal.encodeWavPcm16(8000, synth(i.toLong))
      graft.multimodal.Multimodal.decodeWav(wav)
    }
    val wavs = (0 until n).map(i =>
      graft.multimodal.Multimodal.encodeWavPcm16(8000, synth(i.toLong))).toArray
    var sink = 0L
    time("synth only") { (0 until n).foreach(i => sink += synth(i.toLong).length) }
    time("encode (AudioSystem.write)") { (0 until n).foreach(i =>
      sink += graft.multimodal.Multimodal.encodeWavPcm16(8000, synth(i.toLong)).length) }
    time("decode (AudioSystem)") { (0 until n).foreach(i =>
      sink += graft.multimodal.Multimodal.decodeWav(wavs(i))._4.length) }
    // decode with a per-thread cached SPI reader (public ServiceLoader API)
    val readers = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator()
    val cached = {
      val buf = scala.collection.mutable.ArrayBuffer[javax.sound.sampled.spi.AudioFileReader]()
      while (readers.hasNext) buf += readers.next()
      buf.toSeq
    }
    def decodeCached(bytes: Array[Byte]): Int = {
      val in = new java.io.ByteArrayInputStream(bytes)
      val ais = cached.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(in))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException =>
          in.reset(); None }
      }.next()
      try ais.readAllBytes().length finally ais.close()
    }
    time("decode (cached SPI list)") { (0 until n).foreach(i =>
      sink += decodeCached(wavs(i))) }
    // pick the ONE reader that handles our container — no per-row
    // provider scan, no probe exceptions
    val wavReader = cached.find { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(wavs(0))); true }
      catch { case _: Exception => false }
    }.get
    def decodeOne(bytes: Array[Byte]): Int = {
      val ais = wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try ais.readAllBytes().length finally ais.close()
    }
    time("decode (single reader)") { (0 until n).foreach(i =>
      sink += decodeOne(wavs(i))) }
    // encode via the single matching SPI writer
    val writers = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      val buf = scala.collection.mutable.ArrayBuffer[javax.sound.sampled.spi.AudioFileWriter]()
      while (it.hasNext) buf += it.next()
      buf.toSeq
    }
    val wavWriter = writers.find(_.isFileTypeSupported(
      javax.sound.sampled.AudioFileFormat.Type.WAVE)).get
    def encodeOne(samples: Array[Short]): Array[Byte] = {
      import javax.sound.sampled.{AudioFormat, AudioInputStream}
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val baos = new java.io.ByteArrayOutputStream(44 + data.length)
      wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    time("encode (single writer)") { (0 until n).foreach(i =>
      sink += encodeOne(synth(i.toLong)).length) }
    // sanity: identical bytes
    require(java.util.Arrays.equals(encodeOne(synth(7L)),
      graft.multimodal.Multimodal.encodeWavPcm16(8000, synth(7L))),
      "single-writer bytes differ from AudioSystem.write")
    println(s"sink=$sink readers=${cached.map(_.getClass.getSimpleName)} writers=${writers.map(_.getClass.getSimpleName)}")
  }
}
