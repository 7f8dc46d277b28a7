package graft.streaming

import graft.functions.Audio
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One WAV-encoded slice of an audio stream; `chunk_idx` is the dense
  * per-media position (the ingest contract: chunks of one media arrive
  * in order across micro-batches; within a batch any order).
  */
final case class AudioChunk(media_id: Long, chunk_idx: Long,
                            payload: Array[Byte])

/** Streaming twin of [[Audio.vadSegments]] — VAD over audio that
  * arrives as chunked WAV slices: keyed state carries the in-progress
  * frame remainder (chunks need not align to frame boundaries) and the
  * OPEN active segment, so a voiced region spanning any number of
  * chunks — and any micro-batch split — merges into exactly the segment
  * the batch operator finds on the concatenated signal. Segments emit
  * when the closing silent frame arrives (append mode); the final open
  * segment stays in state until silence closes it (batch parity on any
  * stream that ends silent and frame-aligned — pinned in
  * StreamingVadSpec across splits).
  *
  * State per media: rate, next expected chunk, frames consumed, the
  * sub-frame sample remainder (< frameSamples ints), the open segment's
  * (start, Σ|s|) and the emitted-segment count — O(frame) bytes
  * regardless of stream length. Chunk gaps and mid-stream rate changes
  * fail loudly (the never-misparse contract); duplicate replays of a
  * consumed chunk would violate the dense-index contract rather than
  * silently double-count.
  */
object StreamingVad {

  final case class VadState(rate: Int, nextChunk: Long, frameBase: Long,
                            rem: Array[Int], openStart: Long, openSum: Long,
                            segCount: Int)

  def step(frameSamples: Int, thrAmp: Long)(
      mediaId: Long, rows: Iterator[AudioChunk],
      state: GroupState[VadState]): Iterator[Audio.VadSeg] = {
    var st = state.getOption.getOrElse(
      VadState(0, 0L, 0L, Array.empty, -1L, 0L, 0))
    val out = scala.collection.mutable.ArrayBuffer.empty[Audio.VadSeg]
    def us(sample: Long, rate: Int): Long =
      if (rate == 0) 0L else sample * 1000000L / rate
    rows.toSeq.sortBy(_.chunk_idx).foreach { c =>
      require(c.chunk_idx == st.nextChunk,
        s"media $mediaId: chunk ${c.chunk_idx} arrived, expected ${st.nextChunk}")
      val (rate, channels, samples) = Audio.parseWav(c.payload)
      require(channels == 1, s"VAD expects mono (got $channels)")
      require(st.rate == 0 || st.rate == rate,
        s"media $mediaId: sample rate changed $rate != ${st.rate}")
      val buf = st.rem ++ samples.map(_.toInt)
      var openStart = st.openStart; var openSum = st.openSum
      var frameBase = st.frameBase; var segCount = st.segCount
      var off = 0
      while (buf.length - off >= frameSamples) {
        var sumAbs = 0L
        var i = 0
        while (i < frameSamples) {
          sumAbs += math.abs(buf(off + i).toLong); i += 1
        }
        if (sumAbs > thrAmp * frameSamples) {
          if (openStart < 0) { openStart = frameBase; openSum = 0L }
          openSum += sumAbs
        } else if (openStart >= 0) {
          out += Audio.VadSeg(mediaId, segCount, openStart,
            frameBase - openStart, us(openStart * frameSamples, rate),
            us(frameBase * frameSamples, rate), openSum)
          segCount += 1; openStart = -1L; openSum = 0L
        }
        frameBase += 1
        off += frameSamples
      }
      st = VadState(rate, c.chunk_idx + 1, frameBase, buf.drop(off),
        openStart, openSum, segCount)
    }
    state.update(st)
    out.iterator
  }

  def segments(chunks: Dataset[AudioChunk], frameSamples: Int,
               thrAmp: Long): Dataset[Audio.VadSeg] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.media_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(frameSamples, thrAmp))
  }
}
