package graft.multimodal

import graft.SparkSpec

/** Real WAV codec coverage: javax.sound round trips, totality on
  * garbage. */
class AudioCodecSpec extends SparkSpec {

  test("synthetic WAV decodes back to its closed-form parameters") {
    for (id <- Seq(0L, 1L, 7L, 99L, 499L)) {
      val wav = AudioCodec.syntheticWav(id)
      assert(wav.take(4).toSeq == "RIFF".getBytes.toSeq) // really a WAV
      val row = AudioCodec.decodeRow(id, wav)
      assert(row.sample_rate == 8000 + (id % 8).toInt * 1000)
      assert(row.channels == 1 + (id % 2).toInt)
      assert(row.n_frames == 400 + (id % 100) * 4)
      assert(row.duration_ms == row.n_frames * 1000 / row.sample_rate)
      assert(row.first_sample == ((id * 31) % 65536 - 32768).toInt)
    }
  }

  test("corrupt and non-audio payloads yield sentinel rows, never throw") {
    for (bad <- Seq(Array[Byte](1, 2, 3), AudioCodec.syntheticWav(3L).take(10),
                    Array.emptyByteArray)) {
      val row = AudioCodec.decodeRow(5L, bad)
      assert(row.sample_rate == -1 && row.n_frames == -1L)
    }
  }

  test("decode distributes partition-locally over a payload frame") {
    import spark.implicits._
    val out = spark.range(30).as[Long]
      .mapPartitions(_.map(id => (id, AudioCodec.syntheticWav(id))))
      .toDF("doc_id", "payload")
      .repartition(5)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => AudioCodec.decodeRow(id, p) })
      .collect().sortBy(_.doc_id)
    assert(out.length == 30)
    out.foreach(r => assert(r.sample_rate == 8000 + (r.doc_id % 8).toInt * 1000))
  }
}
