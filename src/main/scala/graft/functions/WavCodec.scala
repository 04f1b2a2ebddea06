package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** The real WAV container codec, with the provider lookup hoisted out
  * of the per-clip path.
  *
  * `javax.sound.sampled.AudioSystem` is a facade that re-resolves its
  * SPI providers on EVERY `write`/`getAudioInputStream` call through a
  * GLOBALLY SYNCHRONIZED registry (`JDK13Services.getProviders`), so a
  * 32-core mapPartitions stage encoding/decoding clips convoys all its
  * tasks through one lock at ~100 µs per call — the measured shape of
  * mm_afp_dedup (6.8 s for 4 stages of pure per-clip work at sf0.1:
  * compute that should parallelize 32× ran single-file through the
  * registry lock). Resolving the WAVE reader/writer ONCE per JVM
  * through the same public SPI surface (`java.util.ServiceLoader` over
  * `javax.sound.sampled.spi`) and invoking the provider directly keeps
  * the codec real — the container bytes are produced and parsed by the
  * exact same provider `AudioSystem` would have dispatched to — and
  * removes the per-call lock: guide §4.5 (initialize heavyweight state
  * once), applied to a JDK facade instead of a model handle.
  *
  * Provider selection mirrors `AudioSystem`'s dispatch: the writer is
  * the first provider supporting the WAVE file type; the reader is the
  * first provider that successfully parses a probe WAV encoded by that
  * writer (readers reject foreign containers with
  * `UnsupportedAudioFileException`, which is exactly the facade's
  * trial loop, run once instead of per clip).
  */
object WavCodec {

  val writer: AudioFileWriter = {
    // context classloader first (falling back to the SPI class's own)
    // so provider discovery sees the same application-classpath
    // providers AudioSystem's JDK13Services dispatch would — with the
    // platform loader alone, a third-party codec on the app classpath
    // would be invisible here and selection could silently diverge
    // from the facade (ADVICE r13 #2)
    val cl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[AudioFileWriter].getClassLoader)
    val it = java.util.ServiceLoader
      .load(classOf[AudioFileWriter], cl)
      .iterator()
    var found: AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no WAVE AudioFileWriter provider on this JVM")
    found
  }

  val reader: AudioFileReader = {
    // probe container: 1 mono 16-bit frame through the selected writer
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val probe = {
      val bos = new ByteArrayOutputStream()
      writer.write(new AudioInputStream(
        new ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1L),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // same loader discipline as `writer` (ADVICE r13 #2)
    val rcl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[AudioFileReader].getClassLoader)
    val it = java.util.ServiceLoader
      .load(classOf[AudioFileReader], rcl)
      .iterator()
    var found: AudioFileReader = null
    while (found == null && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(new ByteArrayInputStream(probe)).close()
        found = r
      } catch { case _: Exception => () }
    }
    require(found != null, "no WAVE AudioFileReader provider on this JVM")
    found
  }

  /** `AudioSystem.write(ais, WAVE, out)` without the per-call registry
    * lock. */
  def write(ais: AudioInputStream, out: OutputStream): Unit = {
    writer.write(ais, AudioFileFormat.Type.WAVE, out)
    ()
  }

  /** `AudioSystem.getAudioInputStream(in)` without the per-call
    * registry lock (WAV containers only — which is all this repo
    * produces). */
  def read(in: InputStream): AudioInputStream =
    reader.getAudioInputStream(in)
}
