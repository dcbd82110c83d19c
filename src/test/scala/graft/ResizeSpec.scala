package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, Multimodal}

/** The resize verb (round 15): integer box-average and nearest-neighbor
  * resampling over decoded pixels — hand vectors first, then geometry
  * errors by name, then the m22 pipeline drive. */
class ResizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def img(w: Int, h: Int)(px: Int*): Codecs.Image = {
    require(px.length == w * h)
    // gray pixels: value replicated across R,G,B
    Codecs.Image(w, h, px.flatMap(v => Seq(v, v, v)).map(_.toByte).toArray)
  }

  test("box resize averages exact tiles with floor division, per channel") {
    // 4x2 -> 2x1: tiles {1,2,9,10} -> 22/4 = 5 (floor), {3,200,11,250} -> 116
    val in = img(4, 2)(1, 2, 3, 200, 9, 10, 11, 250)
    val out = Multimodal.resizeBox(in, 2, 1)
    assert(out.width === 2 && out.height === 1)
    assert((out.rgb(0) & 0xFF) === 5 && (out.rgb(3) & 0xFF) === 116)
    // channels are averaged INDEPENDENTLY: make red differ from blue
    val rgbIn = Codecs.Image(2, 2, Array[Int](
      10, 0, 100, 20, 0, 104,
      30, 0, 108, 44, 0, 112).map(_.toByte).toArray)
    val o2 = Multimodal.resizeBox(rgbIn, 1, 1)
    assert((o2.rgb(0) & 0xFF) === 26) // (10+20+30+44)/4
    assert((o2.rgb(1) & 0xFF) === 0)
    assert((o2.rgb(2) & 0xFF) === 106) // (100+104+108+112)/4
  }

  test("nearest-neighbor resize maps (x,y) -> (⌊x·w/W⌋, ⌊y·h/H⌋), up and down") {
    val in = img(4, 2)(1, 2, 3, 4, 5, 6, 7, 8)
    // downscale 4x2 -> 2x1: samples cols 0,2 of row 0
    val down = Multimodal.resizeNearest(in, 2, 1)
    assert((down.rgb(0) & 0xFF) === 1 && (down.rgb(3) & 0xFF) === 3)
    // upscale 4x2 -> 8x4: every source pixel appears as a 2x2 block
    val up = Multimodal.resizeNearest(in, 8, 4)
    for (y <- 0 until 4; x <- 0 until 8) {
      val want = Seq(1, 2, 3, 4, 5, 6, 7, 8)((y / 2) * 4 + x / 2)
      assert((up.rgb((y * 8 + x) * 3) & 0xFF) === want, s"($y,$x)")
    }
  }

  test("box resize refuses fractional tiles by name") {
    val in = img(4, 2)(1, 2, 3, 4, 5, 6, 7, 8)
    assert(intercept[IllegalArgumentException](Multimodal.resizeBox(in, 3, 1))
      .getMessage.contains("exact tiling"))
  }

  test("audio box decimation floors negative block sums and divides the rate") {
    val text = "resample verb hand check"
    val docsDf = Seq((7L, text)).toDF("doc_id", "text")
    val row = Multimodal.resampledAudioMeta(
      Multimodal.renderWavTable(docsDf), factor = 4).collect()(0)
    def s(i: Int) = (text(i % text.length).toInt - 96) * 512 + (i % 256)
    val y = (0 until 64).map(j => Math.floorDiv(
      (0 until 4).map(t => s(4 * j + t).toLong).sum, 4L))
    assert(row.out_rate === (8000 + (7 % 5) * 1000) / 4)
    assert(row.n_out === 64L)
    assert(row.s_sum === y.sum)
    // spaces land deep negative: the signal genuinely crosses zero and
    // at least one block sum is negative, so the floor convention is
    // load-bearing in this fixture, not incidental.
    assert(y.exists(_ < 0) && y.exists(_ >= 0), "fixture must cross zero")
    val zc = (1 until 64).count(j => (y(j - 1) < 0) != (y(j) < 0))
    assert(row.zc === zc.toLong && zc > 0)
    val fp = (1 until 64).foldLeft(0L)((a, j) =>
      if (y(j - 1) > y(j)) a | (1L << (j - 1)) else a)
    assert(row.fp === fp)
  }

  test("resizedImageMeta matches a by-hand computation on one doc") {
    val text = "resize pipeline hand check payload"
    val docsDf = Seq((6L, text)).toDF("doc_id", "text")
    val row = Multimodal.resizedImageMeta(
      Multimodal.renderBmpTable(docsDf, 25, 16), 5, 4, 8, 8).collect()(0)
    def blue(i: Int) = text(i % text.length).toInt
    val bv = (0 until 20).map { gp =>
      (0 until 20).map(t =>
        blue(((gp / 5) * 4 + t / 5) * 25 + (gp % 5) * 5 + t % 5)).sum / 20
    }
    val nv = (0 until 64).map(gp => blue((2 * (gp / 8)) * 25 + (25 * (gp % 8)) / 8))
    assert(row.box_sum === bv.sum.toLong)
    assert(row.nn_sum === nv.sum.toLong)
    def fp(vs: Seq[Int], n: Int) = (1 until n).foldLeft(0L) { (acc, j) =>
      if (vs(j - 1) > vs(j)) acc | (1L << (j - 1)) else acc
    }
    assert(row.box_fp === fp(bv, 20))
    assert(row.nn_fp === fp(nv, 64))
  }
}
