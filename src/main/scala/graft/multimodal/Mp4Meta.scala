package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO BMFF (MP4/MOV) container metadata parser — the real half
  * of video support a curation pipeline needs before any frame decode:
  * duration, timescale, and per-track kind/dimensions, read from the box
  * tree (ISO/IEC 14496-12: `moov/mvhd` for the movie clock,
  * `trak/tkhd` for dimensions, `trak/mdia/hdlr` for the track handler).
  * Frame DECODING stays an honest stub ([[Multimodal.FakeCodec]]) — there
  * is no pure-JVM H.264/AAC — but duration/resolution probing of real
  * files is container arithmetic, not codec work, and it is what the
  * metadata-validation and frame-sampling plans actually consume.
  *
  * Robustness contract: unknown boxes are skipped by their declared size;
  * 64-bit largesize boxes and version-1 (64-bit time) mvhd/tkhd are
  * handled; a truncated or non-BMFF payload raises a self-describing
  * IllegalArgumentException rather than returning half-parsed numbers.
  */
object Mp4Meta {

  final case class Track(kind: String, width: Int, height: Int)
  final case class Info(durationMs: Long, timescale: Long, tracks: Seq[Track]) {
    def videoTracks: Seq[Track] = tracks.filter(_.kind == "video")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"not an ISO-BMFF payload: $msg")

  /** Walk `[start, end)` yielding (boxType, payloadStart, payloadEnd). */
  private def boxes(b: ByteBuffer, start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val size32 = b.getInt(pos).toLong & 0xFFFFFFFFL
        val typ = new String(Array(
          b.get(pos + 4), b.get(pos + 5), b.get(pos + 6), b.get(pos + 7)),
          java.nio.charset.StandardCharsets.US_ASCII)
        var payload = pos + 8
        val size = size32 match {
          case 1 => // 64-bit largesize follows the type
            if (pos + 16 > end) fail(s"truncated largesize box at $pos")
            val s = b.getLong(pos + 8)
            payload = pos + 16
            s
          case 0 => (end - pos).toLong // box extends to end of enclosing
          case s => s
        }
        if (size < (payload - pos) || pos + size > end)
          fail(s"box '$typ' at $pos declares size $size beyond range $end")
        val r = (typ, payload, pos + size.toInt)
        pos += size.toInt
        r
      }
    }

  def parse(bytes: Array[Byte]): Info = {
    if (bytes.length < 8) fail(s"only ${bytes.length} bytes")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val top = boxes(b, 0, bytes.length).toSeq
    if (!top.exists(_._1 == "ftyp")) fail("no ftyp box")
    val moov = top.find(_._1 == "moov").getOrElse(fail("no moov box"))

    var timescale = 0L
    var duration = 0L
    val tracks = Seq.newBuilder[Track]

    // every fixed-layout field read is bounds-checked against ITS OWN box
    // end — a framing-consistent but short box (size lies within range but
    // the payload is smaller than the version's layout) must fail loudly,
    // not read the next sibling's bytes as width/height
    def need(boxType: String, s: Int, end: Int, upTo: Int): Unit =
      if (upTo > end) fail(s"'$boxType' box too short for its version layout")

    boxes(b, moov._2, moov._3).foreach {
      case ("mvhd", s, e) =>
        need("mvhd", s, e, s + 1)
        val version = b.get(s) & 0xFF
        if (version == 1) { // 64-bit creation/modification times
          need("mvhd", s, e, s + 4 + 28)
          timescale = b.getInt(s + 4 + 16).toLong & 0xFFFFFFFFL
          duration = b.getLong(s + 4 + 20)
        } else {
          need("mvhd", s, e, s + 4 + 16)
          timescale = b.getInt(s + 4 + 8).toLong & 0xFFFFFFFFL
          duration = b.getInt(s + 4 + 12).toLong & 0xFFFFFFFFL
        }
      case ("trak", ts, te) =>
        var w = 0; var h = 0; var kind = "unknown"
        boxes(b, ts, te).foreach {
          case ("tkhd", s, e) =>
            need("tkhd", s, e, s + 1)
            val version = b.get(s) & 0xFF
            // width/height are the LAST 8 bytes of tkhd (16.16 fixed),
            // at a version-dependent offset from the payload start
            val base = if (version == 1) s + 4 + 32 else s + 4 + 20
            val dimOff = base + 8 + 2 + 2 + 2 + 2 + 36
            need("tkhd", s, e, dimOff + 8)
            w = b.getInt(dimOff) >>> 16
            h = b.getInt(dimOff + 4) >>> 16
          case ("mdia", ms, me) =>
            boxes(b, ms, me).foreach {
              case ("hdlr", s, e) =>
                need("hdlr", s, e, s + 12)
                val handler = new String(Array(
                  b.get(s + 8), b.get(s + 9), b.get(s + 10), b.get(s + 11)),
                  java.nio.charset.StandardCharsets.US_ASCII)
                kind = handler match {
                  case "vide" => "video"
                  case "soun" => "audio"
                  case "text" | "sbtl" => "subtitle"
                  case other => other.trim
                }
              case _ => ()
            }
          case _ => ()
        }
        tracks += Track(kind, w, h)
      case _ => ()
    }
    if (timescale == 0) fail("moov has no mvhd (or timescale 0)")
    Info(duration * 1000 / timescale, timescale, tracks.result())
  }
}
